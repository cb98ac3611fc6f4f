package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextDedup

/** One-off: print the tiled candidate join's physical plan. */
object SkewPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    println("=== TILED ===")
    TextDedup.minhashCandidatePairs(docs, "doc_id", "text").explain("formatted")
    println("=== UNTILED ===")
    TextDedup.minhashCandidatePairs(docs, "doc_id", "text",
      tilePairs = Long.MaxValue).explain("formatted")
    spark.stop()
  }
}
