package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Search, TextDedup}

/** Decomposes the on-disk stores' BUILD cost into its two halves —
  * the signature/postings COMPUTE (forced by a count, nothing
  * written) and the partitioned parquet WRITE (the full build) — so a
  * slow build cell in ScaleProbe can be attributed to the narrow
  * compute map, the shuffle+write, or the box, instead of guessed
  * (r16: the 30× dedup/search build cells read 5–14 s across runs
  * where r15 recorded 1.3/3.5 on byte-identical store code; this tool
  * names which half moved). Each leg runs twice: the second reading
  * is the page-cache/JIT-warm number to compare across sessions.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StoreBuildDecomp \
  *     /tmp/scaleprobe16/m30"
  */
object StoreBuildDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    println(s"[decomp] dir=$dir docs=${docs.count()}")
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[decomp] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    for (round <- 1 to 2) {
      println(s"[decomp] --- round $round ---")
      // dedup store: compute = shingle→minhash→band view (narrow map
      // + per-doc agg); write adds the 4-way band repartition + parquet
      t("dedup compute-only") {
        TextDedup.bandsOfSignatures(docs).count()
      }
      t("dedup full-build") {
        TextDedup.dedupIndexWrite(docs, tmp("decomp-dedup"))
      }
      // search store: compute = tokenize→(doc,term,tf) agg; write adds
      // docs/stats sidecars + the bucketed postings repartition+write
      t("search compute-only") {
        docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf")).count()
      }
      t("search full-build") {
        Search.searchIndexWrite(docs, tmp("decomp-search"))
      }
    }
    spark.stop()
  }
}
