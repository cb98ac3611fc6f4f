package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.streaming.StreamingOps

/** Dev-only: drive StreamingOps against a REAL file-source stream (the
  * events table re-staged as a parquet directory), end-to-end through
  * readStream → watermarked agg → memory sink. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the events table as a stream-source dir (file streams need a
    // directory, and the raw file carries ns timestamps Tables normalizes)
    val stage = java.nio.file.Files.createTempDirectory("events-stream").toString
    val batch = Tables(spark, sfDir, "events")
    batch.write.mode("overwrite").parquet(stage)

    val stream = spark.readStream.schema(batch.schema).parquet(stage)
    val q = StreamingOps.tumblingCounts(stream, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("demo")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("demo")
    println(s"STREAM-DEMO closed-windows=${out.count()}")
    out.orderBy("w_start", "event_type").show(6, truncate = false)

    // cross-check against the batch q60 result restricted to closed windows
    val batchWindows = graft.SparkEntry.queries("q60_window_tumbling")(
      spark, sfDir)
    println(s"STREAM-DEMO batch-windows=${batchWindows.count()}")
    spark.stop()
  }
}
