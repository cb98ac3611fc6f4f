package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scheduler-shape probe for the bimodal driver box: wall-clock A/B is
  * meaningless when the ambient tide swings 2× between back-to-back
  * runs (BASELINE.md), but the JOB / STAGE / TASK counts a query's
  * first construction+execution schedules are DETERMINISTIC — exactly
  * the quantities the bootstrap-shuffle sizing and the no-collect
  * takedown change. Prints one line per named query:
  * jobs, stages, tasks, and summed executor task time (the last one
  * still noise-prone, counts are exact).
  *
  *   SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.JobCount q187_…"
  */
object JobCount {
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
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: NOT FOUND")
        case Some(fn) =>
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          // listener events drain asynchronously and the bus's
          // waitUntilEmpty is private[spark]: poll until the counters
          // stop moving (1 s of quiet), so a loaded box's stragglers
          // cannot leak into the NEXT query's "deterministic" counts
          var settled = 0
          var last = (0, 0, 0)
          while (settled < 4) {
            Thread.sleep(250)
            val now = (jobs.get, stages.get, tasks.get)
            if (now == last) settled += 1 else { settled = 0; last = now }
          }
          println(f"$name: jobs=${jobs.get}%d stages=${stages.get}%d " +
            f"tasks=${tasks.get}%d taskTime=${taskMs.get / 1000.0}%.1fs " +
            f"wall=$dt%.2fs")
      }
    }
    spark.stop()
  }
}
