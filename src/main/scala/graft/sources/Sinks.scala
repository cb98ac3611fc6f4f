package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side scale posture (SURVEY.md §7 slice 4): partitioned layouts
  * for partition-pruned scans, bucketed tables for shuffle-free
  * co-located joins.
  *
  * At 100 TB these two layouts ARE the storage strategy:
  *  - `writePartitioned(df, path, "ship_month")` produces the directory
  *    tree (`.../ship_month=2024-01/part-*.parquet`) that lets any query
  *    filtering on the partition column skip whole directories
  *    (PartitionFilters in the scan, zero I/O for pruned partitions);
  *  - `writeBucketed(df, "lineitem_b", 1024, "l_orderkey")` pre-shuffles
  *    once at write time; every later join/agg on the bucket key reads
  *    co-located buckets and skips its Exchange entirely — the
  *    pay-once-join-many pattern for fact-fact joins.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table (bucketing requires the catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  // ── Interchange formats beyond Parquet (SURVEY.md §2B "file formats"
  //    row). ORC is the second columnar format Spark ships natively —
  //    same pushdown/pruning machinery as Parquet (spec-pinned). JSON
  //    lines and CSV are the row-interchange formats; both lose type
  //    fidelity (JSON has no int/long distinction, CSV is all strings),
  //    so reads take an explicit schema — never infer in production:
  //    inference costs a full extra pass and can flip types between
  //    runs. No Avro: the spark-avro datasource jar isn't in this
  //    distribution.

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
