package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Pins the ON-DISK search index (`searchIndexWrite` /
  * `searchIndexServe`): q115-parity of the disk-served BM25 top-k, the
  * term-bucket partition pruning the 100 TB story rests on, the
  * manifest guard, and the matched-docs-only serving contract. */
class SearchIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-searchidx").toString

  test("q185 equals q115 row for row (disk serve == in-memory BM25)") {
    Search.resetDiskSearchMemo()
    val a = SparkEntry.queries("q185_bm25_disk")(spark, sf)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q115_bm25_topk")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b,
      s"disk-served BM25 must equal the in-memory top-k:\n$a\nvs\n$b")
  }

  test("the postings scan statically prunes to the query terms' buckets") {
    // the PLAN — not runtime stats — must carry the bucket restriction
    // as a partition filter over literal bkt values: that is the
    // guarantee that only |query terms| directory families of a
    // 100 TB postings store are ever listed
    Search.resetDiskSearchMemo()
    val plan = SparkEntry.queries("q185_bm25_disk")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters"))
      .find(_.contains("bkt"))
    assert(pf.isDefined,
      s"the postings scan must carry a bkt partition filter:\n$plan")
    assert(pf.get.contains("bkt#") && pf.get.toLowerCase.contains("in"),
      s"the filter must be a literal IN over bucket values: ${pf.get}")
    // and the term equality reaches the parquet scan as a pushed filter
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      "the term IN-list must push into the parquet scan")
  }

  test("serve reads only matched docs; a query of absent terms is empty") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha alpha delta"),
      (2L, "epsilon zeta eta"), (3L, "beta beta beta alpha"))
      .toDF("doc_id", "text")
    val idx = tmp()
    Search.searchIndexWrite(docs, idx, nBuckets = 4)
    val hits = Search.searchIndexServe(spark, idx, Seq("alpha", "beta"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(0L, 1L, 3L),
      s"docs matching >= 1 term serve; doc 2 matches none: $hits")
    val none = Search.searchIndexServe(spark, idx, Seq("omega"))
    assert(none.count() == 0, "a vocabulary miss serves empty, not error")
    // scores agree with the in-memory scorer on the same corpus
    val mem = Search.bm25Score(docs, "doc_id", "text",
        Seq("alpha", "beta"))
      .filter(col("tf1") + col("tf2") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(_.toString).toSeq
    val disk = Search.searchIndexServe(spark, idx, Seq("alpha", "beta"))
      .collect().map(_.toString).toSeq
    assert(disk == mem, s"hand corpus parity:\n$disk\nvs\n$mem")
  }

  test("the manifest rejects a mismatched tokenizer; bucket count is " +
      "read from the index, not assumed") {
    val docs = Seq((0L, "alpha beta"), (1L, "beta gamma"))
      .toDF("doc_id", "text")
    val idx = tmp()
    Search.searchIndexWrite(docs, idx, nBuckets = 16)
    // serving works at whatever bucket count the index was written with
    assert(Search.searchIndexServe(spark, idx, Seq("beta")).count() == 2)
    Seq((16, "bpe")).toDF("n_buckets", "tokenizer")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/manifest")
    val e = intercept[IllegalArgumentException](
      Search.searchIndexServe(spark, idx, Seq("beta")))
    assert(e.getMessage.contains("bpe"),
      s"the error must name the stored tokenizer: ${e.getMessage}")
  }
}
