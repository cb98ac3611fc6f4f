package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-JOB attribution twin of [[JobCount]]: prints every Spark job a
  * query's first construction+execution schedules, with its call site
  * and description — so a "52 first-touch jobs" reading decomposes
  * into WHICH actions (writes, sidecar aggregates, checkpoint pins,
  * AQE stage materializations) instead of being bisected by hand.
  * Job counts are deterministic (the JobCount rationale); this tool
  * names them.
  *
  *   SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.JobTrace q187_…"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        if (sys.env.get("SPARK_GRAFT_AQE").contains("0")) "false" else "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val rows = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the call site rides the STAGE names ("parquet at Foo.scala:12")
        val names = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
        rows.add(f"  job ${j.jobId}%3d stages=${j.stageInfos.size}%2d  " +
          names.mkString(" | ").take(160))
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: NOT FOUND")
        case Some(fn) =>
          rows.clear()
          fn(spark, sfDir).count()
          // listener drain discipline from JobCount: poll until quiet
          var settled = 0
          var last = -1
          while (settled < 4) {
            Thread.sleep(250)
            val now = rows.size
            if (now == last) settled += 1 else { settled = 0; last = now }
          }
          println(s"$name: ${rows.size} jobs")
          rows.forEach(r => println(r))
      }
    }
    spark.stop()
  }
}
