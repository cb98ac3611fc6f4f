package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the feature-prep operators. */
class FeaturePrepSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q112 emits exactly n-3 examples per user, each with a full context") {
    val out = SparkEntry.queries("q112_next_event_examples")(spark, sf).cache()
    // every context holds exactly 3 event types (2 commas)
    assert(out.filter(size(split($"context", ",")) =!= 3).count() == 0)
    val perUser = Tables(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val got = out.groupBy("user_id").agg(count(lit(1)).as("g"))
    val bad = perUser.join(got, Seq("user_id"), "left")
      .filter(coalesce($"g", lit(0L)) =!= greatest($"n" - 3, lit(0L)))
    assert(bad.count() == 0,
      "each user must contribute max(n-3, 0) sliding examples")
    out.unpersist()
  }

  test("q113 z-scores have zero mean and unit variance per group") {
    val out = SparkEntry.queries("q113_zscore_normalize")(spark, sf).cache()
    assert(out.count() == Tables(spark, sf, "events").count())
    val stats = out.groupBy("event_type")
      .agg(avg("z").as("m"), avg($"z" * $"z").as("m2"))
      .as[(String, Double, Double)].collect()
    stats.foreach { case (t, m, m2) =>
      // rounding to 4dp perturbs each z by <=5e-5, so the group moments
      // sit within ~1e-4 of (0, 1)
      assert(math.abs(m) < 1e-3, s"$t mean(z)=$m")
      assert(math.abs(m2 - 1.0) < 1e-3, s"$t var(z)=$m2")
    }
    out.unpersist()
  }

  test("q123 bins are equi-depth (±1 row) with ordered, non-overlapping ranges") {
    val out = SparkEntry.queries("q123_quantile_bins")(spark, sf).cache()
    val depth = out.groupBy("event_type")
      .agg((max("n_rows") - min("n_rows")).as("spread"))
    assert(depth.filter($"spread" > 1).count() == 0,
      "rank-decile bins differ by at most one row")
    // within a type, bin k's range sits at or below bin k+1's
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bin")
    val bad = out
      .withColumn("next_lo", lead("lo_cents", 1).over(w))
      .filter($"next_lo".isNotNull && $"hi_cents" > $"next_lo")
    assert(bad.count() == 0, "bin value ranges must be ordered")
    out.unpersist()
  }

  test("q124 class weights: heaviest class gets the smallest weight") {
    val rows = SparkEntry.queries("q124_class_weights")(spark, sf)
      .as[(Int, Long, Long)].collect()
    val byCnt = rows.sortBy(_._2)
    assert(byCnt.head._3 >= byCnt.last._3,
      "weight must be non-increasing in class frequency")
    // a perfectly balanced class (cnt = total/k) would weigh 10000 bp;
    // floor keeps every weight <= total*10000/(k*cnt)
    rows.foreach { case (_, cnt, bp) =>
      val total = rows.map(_._2).sum
      assert(bp == total * 10000 / (rows.length * cnt), "exact floor formula")
    }
  }

  test("q125 hashed cross: buckets in range, counts bound key counts") {
    val rows = SparkEntry.queries("q125_hashed_cross")(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (b, n, k) =>
      assert(b >= 0 && b < 256)
      assert(n >= k && k >= 1, "each bucket holds >=1 key, n >= distinct keys")
    }
  }

  test("q151 padding buckets reconcile with the raw token counts") {
    val rows = SparkEntry.queries("q151_padding_waste")(spark, sf)
      .as[(Int, Int, Long, Long, Long, Int)].collect()
    // buckets are multiples of 16 capped at 80, rows internally consistent
    rows.foreach { case (bucket, n, kept, pad, _, bp) =>
      assert(bucket % 16 == 0 && bucket >= 16 && bucket <= 80)
      assert(pad == bucket.toLong * n - kept,
        "pad = capacity - kept must hold per bucket")
      assert(bp == pad * 10000 / (bucket.toLong * n), "exact waste formula")
    }
    // kept + truncated must re-add to the corpus token count
    val total = Tables(spark, sf, "documents")
      .select(size(split($"text", " ")).cast("long")).as[Long]
      .collect().sum
    assert(rows.map(r => r._3 + r._5).sum == total,
      "kept + truncated tokens must equal the corpus total")
  }
}
