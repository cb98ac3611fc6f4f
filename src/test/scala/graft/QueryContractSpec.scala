package graft

/** Contract checks for the driver interface: unique names, oracle keys ⊆
  * query keys, flagship smoke, and determinism (two runs, equal results)
  * for a representative query from each module. */
class QueryContractSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique and oracles reference real queries") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries are deterministic across runs") {
    val reps = Seq("q01_pricing_summary", "q22_window_rank", "q42_jaccard_pairs",
      "q46_cosine_topk", "q53_fingerprint", "q60_window_tumbling",
      "q130_cosine_rerank", "q134_session_cooccurrence", "q135_kmeans",
      "q138_bigram_logprob", "q140_ewma_smooth", "q141_mad_outliers",
      "q142_quantized_rerank")
    reps.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.sameElements(b), s"$name not deterministic")
    }
  }

  test("every oracle-paired query returns a non-degenerate schema") {
    // column names must be stable + lowercase-compatible for the driver's
    // sorted-column hash compare
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"$name has dup columns")
    }
  }
}
