package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the maintenance / time-series additions:
  * incremental aggregate merge (q139) and EWMA smoothing (q140). */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q139: merged base+delta states equal a direct full recompute") {
    val got = SparkEntry.queries("q139_incremental_agg")(spark, sf).collect()
    val want = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("int").as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        round(sum("o_totalprice") / count(lit(1)), 4).as("avg_price"))
      .orderBy("o_orderpriority").collect()
    assert(got.sameElements(want),
      s"merge(base,delta) must equal recompute(all):\n${got.toSeq}\n${want.toSeq}")
  }

  test("q140: EWMA matches a per-user reference fold; head rows renormalize") {
    val events = Tables(spark, sf, "events")
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    val byUser = events.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._3.getTime, e._2)).map(e => (e._2, e._4)))
    val uid = events.head._1
    val series = byUser(uid)
    val w = (0 to 7).map(k => math.pow(0.5, k))
    val want = series.zipWithIndex.map { case ((eid, _), i) =>
      val hist = (0 to math.min(7, i)).map(k => series(i - k)._2)
      val num = hist.zip(w).map { case (x, wk) => x * wk }.sum
      val den = w.take(hist.length).sum
      eid -> BigDecimal(num / den)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = SparkEntry.queries("q140_ewma_smooth")(spark, sf)
      .filter($"user_id" === uid)
      .select($"event_id", $"ewma8").as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (eid, v) =>
      assert(math.abs(v - want(eid)) < 2e-4,
        s"event $eid: got $v want ${want(eid)}")
    }
    // the first observation of a series is its own smoothed value
    val (firstEid, firstVal) = series.head
    assert(math.abs(got(firstEid) -
      BigDecimal(firstVal).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }
}
