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
}
