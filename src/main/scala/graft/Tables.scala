package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer: one parquet file per table under the scale-factor dir
  * (TESTDATA.md). Parquet is self-describing, so this replaces the
  * reference's `metadata.txt` catalog + CSV loader entirely, and gives
  * predicate pushdown, column pruning, and vectorized reads for free.
  *
  * At 100 TB the same call works against a partitioned directory tree
  * (`.../lineitem/ship_month=.../part-*.parquet`): `spark.read.parquet`
  * handles partition discovery + pruning with no code change here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
      // ([PARQUET_TYPE_ILLEGAL]). Read it as a raw nanos LongType via the
      // legacy flag, then rebuild a TIMESTAMP_NTZ at microsecond precision
      // (Spark's native resolution; sub-µs is truncated, matching a DuckDB
      // `CAST(ts AS TIMESTAMP)` on the oracle side).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
