package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-loop timing harness: run the named queries (all if no names given)
  * `SPARK_GRAFT_REPS` times each (default 2) under the same session config
  * as Bench, printing per-run seconds. Run 1 includes plan compile +
  * parquet footer reads + any shared-cache build; run 2 isolates steady
  * execution — the gap tells you whether a slow bench number is the
  * operator or one-time setup.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: NOT FOUND")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name: ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
