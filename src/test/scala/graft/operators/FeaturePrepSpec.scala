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
}
