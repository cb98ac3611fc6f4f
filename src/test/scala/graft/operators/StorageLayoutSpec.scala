package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of the storage-layout operators. */
class StorageLayoutSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q106 codes span exactly the int8 range and pin the absmax dim") {
    val out = SparkEntry.queries("q106_embed_quantize")(spark, sf).cache()
    assert(out.filter($"min_code" < -127 || $"max_code" > 127).count() == 0,
      "a code outside [-127,127] breaks the int8 contract")
    // the dimension holding absmax must quantize to exactly ±127
    assert(out.filter($"max_code" =!= 127 && $"min_code" =!= -127).count() == 0,
      "every vector has a dim at ±absmax, so ±127 must be hit")
    assert(out.filter($"absmax" <= 0).count() == 0)
    out.unpersist()
  }

  test("q107 z-buckets partition the table and bound both column spans") {
    val out = SparkEntry.queries("q107_zorder_stats")(spark, sf).cache()
    val total = graft.Tables(spark, sf, "events").count()
    assert(out.agg(sum("n")).as[Long].head() == total)
    // bucket id = interleaved HIGH nibbles of (ux, vx), so inside one
    // bucket each column varies only in its low nibble: span <= 15.
    // This is the pruning guarantee z-ordering exists for.
    assert(out.filter($"u_max" - $"u_min" > 15).count() == 0,
      "user span inside a z-bucket must be <= 15")
    assert(out.filter($"v_max" - $"v_min" > 15).count() == 0,
      "value-band span inside a z-bucket must be <= 15")
    out.unpersist()
  }

  test("q108 thresholds are ordered data values and clip counts stay near 1%") {
    val out = SparkEntry.queries("q108_winsorize")(spark, sf).cache()
    assert(out.filter($"lo" > $"hi").count() == 0)
    val counts = graft.Tables(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val j = out.join(counts, "event_type")
    // below-lo count is < ceil(1% of n) by construction (lo is the
    // ceil(0.01n)-th smallest, strict < excludes it and its ties)
    assert(j.filter($"n_low" >= ceil($"cnt" * 0.01) + lit(1)).count() == 0)
    assert(j.filter($"n_high" > $"cnt" - ceil($"cnt" * 0.99) + lit(1)).count() == 0)
    // winsorized sum is bounded by the clip interval
    assert(j.filter($"sum_winsorized" < $"lo" * $"cnt" - 0.01 ||
      $"sum_winsorized" > $"hi" * $"cnt" + 0.01).count() == 0)
    out.unpersist()
  }
}
