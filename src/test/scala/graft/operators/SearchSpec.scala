package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the retrieval operators (q114–q117) and the
  * time-series / diagnostics additions (q118–q120). */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q114 inverted index: df <= tf, df bounded by corpus, postings sorted") {
    val out = SparkEntry.queries("q114_inverted_index")(spark, sf).cache()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(out.filter($"df" > $"tf").count() == 0, "df can never exceed tf")
    assert(out.filter($"df" > nDocs).count() == 0)
    // postings are ascending doc ids
    val bad = out.select(split($"postings", ",").cast("array<long>").as("p"))
      .filter(expr(
        "exists(sequence(1, size(p)-1), i -> p[i] <= p[i-1])"))
    assert(bad.count() == 0, "postings must be strictly ascending")
    out.unpersist()
  }

  test("q115 BM25: scores decrease down the list; zero-tf docs score 0") {
    val rows = SparkEntry.queries("q115_bm25_topk")(spark, sf)
      .select($"score", $"tf1" + $"tf2" + $"tf3").as[(Double, Int)].collect()
    assert(rows.length == 10)
    assert(rows.sliding(2).forall { case Array(a, b) => a._1 >= b._1 },
      "top-k must be sorted by score desc")
    rows.foreach { case (s, tfSum) =>
      assert(tfSum > 0 || s == 0.0, "a doc with no query term scores 0")
    }
  }

  test("q116 RRF: fused docs carry both ranks and rrf matches the formula") {
    val rows = SparkEntry.queries("q116_hybrid_rrf")(spark, sf)
      .as[(Long, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, rb, rc, rrf) =>
      assert(rb >= 1 && rb <= 100 && rc >= 1 && rc <= 100)
      val want = BigDecimal(1.0 / (60 + rb) + 1.0 / (60 + rc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - want) < 1e-9, s"rrf=$rrf want=$want")
    }
  }

  test("q117 recall audit: counts are consistent and recall/precision valid") {
    // q117's recall side samples quota-50 per source; this fixture has
    // ≤50 docs/source, so the sample IS the corpus and the audit's full
    // semantics are pinned here (sampled truth = full truth, and every
    // hit is a verified-true candidate: n_hit == n_true). Guard that
    // assumption explicitly so a fixture/quota change fails loudly
    // instead of silently weakening the identities below.
    val maxPerSource = Tables(spark, sf, "documents")
      .groupBy("source").count().agg(max("count")).as[Long].head()
    assert(maxPerSource <= 50,
      s"fixture has a source with $maxPerSource > 50 docs — the quota-50 " +
        "sample no longer covers the corpus and this test's identities " +
        "(recall over full truth, n_hit == n_true) stop holding")
    val (nT, nC, nH, rBp, pBp) = SparkEntry.queries("q117_lsh_recall")(spark, sf)
      .as[(Int, Int, Int, Long, Long)].head()
    assert(nH <= nT && nH <= nC, "hits bound by both sets")
    assert(rBp == nH.toLong * 10000 / nT && pBp == nH.toLong * 10000 / nC)
    // banding theory: a pair at J >= 0.5 has per-band match prob >= .25;
    // with 4 bands the generator should find at least one true pair here
    assert(nH > 0, "LSH should recover at least one true near-dup pair")
  }

  test("q149 funnel: stages are monotone and sessions reconcile with q122") {
    val (nS, nV, nC, nP) = SparkEntry.queries("q149_session_funnel")(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(nS >= nV && nV >= nC && nC >= nP,
      s"funnel must be monotone: $nS >= $nV >= $nC >= $nP")
    // the synthetic sessions are short: views are common, ordered
    // view→click conversions rare, full conversions absent — assert the
    // ordered-stage logic BITES (strictly narrows) rather than a full
    // conversion existing
    assert(nV > 0 && nC > 0, s"stages must be exercised: $nV viewed, $nC clicked")
    assert(nC < nV, "the ordered-click stage must strictly narrow the funnel")
    val q122Sessions = SparkEntry.queries("q122_sessionize_gap")(spark, sf)
      .count()
    assert(nS == q122Sessions,
      s"funnel session universe $nS != q122's $q122Sessions")
  }

  test("q144 sampled audit: budget-bounded subset, converges to full audit") {
    val full = SparkEntry.queries("q117_lsh_recall")(spark, sf)
      .as[(Int, Int, Int, Long, Long)].head()
    val samp = SparkEntry.queries("q144_lsh_recall_sampled")(spark, sf)
      .as[(Int, Int, Int, Option[Long], Option[Long])].head()
    val (nT, nC, nH, rBp, _) = samp
    // a real subset: the quota sample must see SOME truth pairs (else the
    // estimator is vacuous) but fewer than the full all-pairs audit
    // (else it isn't sampling)
    assert(nT > 0, "quota sample found no truth pairs - estimator vacuous")
    assert(nT < full._1, s"sampled truth $nT not a strict subset of ${full._1}")
    assert(nH <= nT && nH <= nC, "hits bound by both sets")
    // convergence: the sampled recall estimate tracks the full audit's
    // (both are exact computations over their pair sets; the tolerance
    // absorbs small-sample variance on the 500-doc test corpus)
    assert(rBp.isDefined, "non-degenerate sample must yield a recall")
    assert(math.abs(rBp.get - full._4) <= 1500,
      s"sampled recall ${rBp.get}bp diverges from full ${full._4}bp")
  }

  test("q118 rolling 1h window includes the row itself and only same-user peers") {
    val out = SparkEntry.queries("q118_rolling_1h")(spark, sf).cache()
    assert(out.filter($"n_1h" < 1).count() == 0, "frame includes current row")
    // a user's first event (by time) has exactly itself in the frame
    val ev = Tables(spark, sf, "events")
      .groupBy("user_id").agg(min("ts").as("ts0"))
      .join(Tables(spark, sf, "events"), Seq("user_id"))
      .filter($"ts" === $"ts0")
      .groupBy("user_id").agg(min("event_id").as("event_id"))
    val firsts = out.join(ev, Seq("user_id", "event_id"))
    assert(firsts.filter($"n_1h" =!= 1).count() == 0,
      "the chronologically first event of a user sees only itself")
    out.unpersist()
  }

  test("q119 gap-fill: contiguous hourly grid per user, zeros on gaps") {
    val out = SparkEntry.queries("q119_gapfill_hourly")(spark, sf).cache()
    // grid is contiguous: rows per user == span hours + 1
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max($"h")) - unix_timestamp(min($"h"))) / 3600 + 1)
          .as("hours"))
    assert(spans.filter($"rows" =!= $"hours").count() == 0)
    // zero-count rows exist (synthetic data has gaps) and carry zero cents
    assert(out.filter($"n_events" === 0 && $"cents" =!= 0).count() == 0)
    // totals reconcile with the raw table
    val rawN = Tables(spark, sf, "events").filter($"user_id" < 10).count()
    val gridN = out.agg(sum("n_events")).as[Long].head()
    assert(gridN == rawN, s"gap-fill must preserve event totals ($gridN vs $rawN)")
    out.unpersist()
  }

  test("q120 histogram: n_rows column reconciles with the orders table") {
    val out = SparkEntry.queries("q120_key_skew_histogram")(spark, sf)
    val total = out.agg(sum("n_rows")).as[Long].head()
    assert(total == Tables(spark, sf, "orders").count(),
      "sum(cnt * n_keys) must equal the table's row count")
  }

  test("q121 pagerank: node set = candidate-graph docs, ranks bounded") {
    val out = SparkEntry.queries("q121_pagerank_neardup")(spark, sf).cache()
    val nodes = SparkEntry.queries("q44_lsh_candidates")(spark, sf)
      .select(explode(array($"doc_i", $"doc_j")).as("id"))
      .distinct().count()
    assert(out.count() == nodes, "one rank row per candidate-graph node")
    // teleport floor; total mass never exceeds the initial n * 1e6
    // (floor-division only leaks mass downward)
    assert(out.filter($"rank" < 150000L).count() == 0)
    val mass = out.agg(sum("rank")).as[Long].head()
    assert(mass <= nodes * 1000000L, s"mass $mass exceeds initial")
    out.unpersist()
  }

  test("q126 count-min estimates are one-sided: estimate >= exact, top-10 exact") {
    val rows = SparkEntry.queries("q126_countmin_audit")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (u, exact, est, over) =>
      assert(est >= exact, s"user $u: CMS must never undercount")
      assert(over == est - exact)
    }
    // the exact column must agree with a direct count
    val direct = Tables(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("c")).as[(Long, Long)].collect().toMap
    rows.foreach { case (u, exact, _, _) => assert(direct(u) == exact) }
  }

  test("q122 sessions partition the event stream; ids are consecutive") {
    val out = SparkEntry.queries("q122_sessionize_gap")(spark, sf).cache()
    val total = out.agg(sum("n_events")).as[Long].head()
    assert(total == Tables(spark, sf, "events").count(),
      "every event belongs to exactly one session")
    assert(out.filter($"duration_s" < 0).count() == 0)
    val bad = out.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" + 1 =!= $"n")
    assert(bad.count() == 0, "session ids must be consecutive from 0")
    out.unpersist()
  }
}
