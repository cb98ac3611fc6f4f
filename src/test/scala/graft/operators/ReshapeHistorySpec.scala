package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the reshape (pivot/unpivot), SCD2 history, and
  * cosine-rerank operators — reconciliation against the source tables
  * rather than value snapshots, so they hold at any scale factor. */
class ReshapeHistorySpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q127 pivot: the 12 month cells reconcile to the per-status total") {
    val out = SparkEntry.queries("q127_pivot_month_counts")(spark, sf).cache()
    val statuses = Tables(spark, sf, "orders")
      .select("o_orderstatus").distinct().count()
    assert(out.count() == statuses, "one row per order status")
    val cells = (1 to 12).map(i => col(f"m$i%02d"))
    val rowSum = out.select(col("o_orderstatus"),
      cells.reduce(_ + _).as("total"))
    val expect = Tables(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val bad = rowSum.join(expect, "o_orderstatus")
      .filter($"total" =!= $"n")
    assert(bad.count() == 0, "sum of pivot cells = count of orders")
    out.unpersist()
  }

  test("q128 unpivot emits one row per (status, measure), zeros kept") {
    val out = SparkEntry.queries("q128_unpivot_priority_counts")(spark, sf)
      .cache()
    val statuses = Tables(spark, sf, "orders")
      .select("o_orderstatus").distinct().count()
    assert(out.count() == statuses * 3,
      "every (status, priority-measure) pair must surface, even when 0")
    assert(out.filter($"n" < 0).count() == 0)
    // melt is lossless over the measures it carries
    val back = out.groupBy("o_orderstatus").agg(sum("n").as("n"))
    val expect = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority")
        .isin("1-URGENT", "3-MEDIUM", "5-LOW"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("e"))
    val bad = back.join(expect, "o_orderstatus").filter($"n" =!= $"e")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q129 SCD2 intervals tile each user's timeline exactly") {
    val out = SparkEntry.queries("q129_scd2_state_history")(spark, sf).cache()
    // interval event counts sum back to the raw stream
    val perUser = out.groupBy("user_id").agg(sum("n_events").as("n"))
    val expect = Tables(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("e"))
    assert(perUser.join(expect, "user_id").filter($"n" =!= $"e").count() == 0)
    // exactly one open interval (NULL valid_to) per user
    val open = out.filter($"valid_to".isNull)
      .groupBy("user_id").agg(count(lit(1)).as("k"))
    assert(open.filter($"k" =!= 1).count() == 0)
    // adjacency: each interval's valid_to is the next valid_from, and
    // consecutive intervals never carry the same state (maximal runs)
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val seq = out.select($"user_id", $"state", $"valid_from", $"valid_to",
      lead("valid_from", 1).over(w).as("nxt"),
      lead("state", 1).over(w).as("nxt_state"))
    assert(seq.filter($"nxt".isNotNull && $"valid_to" =!= $"nxt").count() == 0)
    assert(seq.filter($"nxt_state".isNotNull && $"state" === $"nxt_state")
      .count() == 0)
    out.unpersist()
  }

  test("q131 salted join result is exactly the plain join's") {
    val out = SparkEntry.queries("q131_salted_join")(spark, sf)
    val ev = Tables(spark, sf, "events").select("user_id", "event_type")
    val dim = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(dim, "user_id")
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
    assert(out.collect().toSet == plain.collect().toSet,
      "salt must redistribute work without changing the joined row set")
  }

  test("q132 digest is row-order independent and change-sensitive") {
    val out = SparkEntry.queries("q132_table_digest")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet == Set("customer", "orders"))
    // same digest from a deliberately re-ordered, re-partitioned scan
    import graft.plans.HexWindowToLong.hexWindow
    val shuffled = Tables(spark, sf, "customer")
      .orderBy(col("c_name").desc).repartition(7)
      .select(hexWindow(md5(encode(
        concat_ws("|", col("c_custkey"), col("c_name"), col("c_mktsegment")),
        "UTF-8")), 1).as("h"))
      .agg(expr("bit_xor(h)")).first().getLong(0)
    assert(shuffled == out("customer")._2)
    // flipping one row's content flips the digest
    val tampered = Tables(spark, sf, "customer")
      .withColumn("c_mktsegment",
        when(col("c_custkey") === 0, lit("TAMPERED"))
          .otherwise(col("c_mktsegment")))
      .select(hexWindow(md5(encode(
        concat_ws("|", col("c_custkey"), col("c_name"), col("c_mktsegment")),
        "UTF-8")), 1).as("h"))
      .agg(expr("bit_xor(h)")).first().getLong(0)
    assert(tampered != out("customer")._2)
  }

  test("q134 co-occurrence: bounded counts, alphabetical pairs, exact cosine") {
    val out = SparkEntry.queries("q134_session_cooccurrence")(spark, sf)
      .cache()
    val types = Tables(spark, sf, "events")
      .select("event_type").distinct().count().toInt
    assert(out.count() <= types.toLong * (types - 1) / 2)
    assert(out.filter($"type_a" >= $"type_b").count() == 0)
    // co-occurrence can never exceed either marginal
    assert(out.filter($"n_both" > $"n_a" || $"n_both" > $"n_b" ||
      $"n_both" < 1).count() == 0)
    // cosine column is exactly the rounded formula over its own integers
    val bad = out.filter(
      $"cosine" =!= round($"n_both" * lit(1.0) / (sqrt($"n_a") * sqrt($"n_b")), 4))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("sessionPairCounts: forced multi-tile on a planted mega-session " +
      "equals the untiled join exactly") {
    // the hot-bucket exposure the r14 verdict flagged on q134: over an
    // OPEN item space one bot mega-session's k² pair space lands on a
    // single task of the session-keyed join. The tiled twin must be a
    // pure physical rewrite — same counts, any tilePairs — proven here
    // with a session big enough that tilePairs=50 forces real
    // multi-tile fan-out (k=40 → k²=1600 → salt ceil(32) per tile rule)
    // alongside ordinary small sessions.
    val mega = (0 until 40).map(i => (1L, 0L, f"item_$i%03d"))
    val smalls = (0 until 30).flatMap(u => Seq(
      (10L + u, 0L, "item_001"), (10L + u, 0L, f"item_${u % 7}%03d"),
      (10L + u, 1L, "item_002")))
    val sess = (mega ++ smalls).distinct
      .toDF("user_id", "sid", "event_type")
    def counts(tp: Long): Map[(String, String), Long] =
      TimeSeriesJoins.sessionPairCounts(sess, tp)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val untiled = counts(Long.MaxValue)
    val tiled = counts(50L)
    assert(untiled.nonEmpty && tiled == untiled,
      s"tiling must be result-identical: ${tiled.size} vs ${untiled.size}")
    // the mega session contributes C(40,2) pairs spread over its items
    assert(untiled.values.sum >= 40L * 39 / 2,
      "the planted mega-session's pair space must be present")
  }

  test("q130 rerank scores every LSH candidate pair with a valid cosine") {
    val out = SparkEntry.queries("q130_cosine_rerank")(spark, sf).cache()
    assert(out.filter($"cosine" <= 0 || $"cosine" > 1).count() == 0,
      "tf vectors are non-negative, so 0 < cosine <= 1")
    assert(out.filter($"dot" <= 0).count() == 0)
    // candidates share a 3-shingle, hence at least one unigram: the
    // rerank must keep every candidate pair, no silent drops
    val cand = TextDedup.lshCandidatePairs(spark, sf)
    assert(out.count() == cand.count())
    // a doc paired with itself would be a bug upstream
    assert(out.filter($"doc_i" >= $"doc_j").count() == 0)
    out.unpersist()
  }
}
