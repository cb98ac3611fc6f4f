package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticsExtras, CatalogOps, Chunking,
  CoreRelational, Curation, ExtendedRelational, FeaturePrep, Multimodal,
  ScalarFunctions, Scrub, Similarity, StorageLayout, StreamWindows,
  TextAnalysis, TextDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each module contributes `Seq[QueryDef]`; this object is just the merge
  * point the driver reads.
  */
object SparkEntry {

  private val modules: Seq[Seq[QueryDef]] = Seq(
    CoreRelational.defs,
    ExtendedRelational.defs,
    TextDedup.defs,
    graft.operators.Search.defs,
    graft.operators.GraphOps.defs,
    Chunking.defs,
    Scrub.defs,
    Curation.defs,
    StorageLayout.defs,
    CatalogOps.defs,
    FeaturePrep.defs,
    Similarity.defs,
    TextAnalysis.defs,
    Multimodal.defs,
    StreamWindows.defs,
    AnalyticsExtras.defs,
    ScalarFunctions.defs,
    graft.operators.TimeSeriesJoins.defs,
    graft.operators.SqlSurface.defs,
    graft.operators.PipelineCapstone.defs
  )

  private val all: Seq[QueryDef] = modules.flatten

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names across modules")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
