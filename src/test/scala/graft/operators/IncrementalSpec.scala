package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the maintenance / time-series / robust-stat
  * additions: incremental aggregate merge (q139), EWMA smoothing (q140),
  * MAD outliers (q141), and quantized-rerank ANN (q142). */
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
    // the two plans sum o_totalprice in different associations, so an
    // unrounded sum within an ulp of a rounding boundary can round
    // differently — a whole-Row equality would then flake on partition
    // layout even though both results are correct. Tolerance per column
    // must be the column's OWN rounding quantum (a boundary flip moves
    // the value by exactly one quantum; anything smaller absorbs
    // nothing): total_price rounds to 2dp, avg_price to 4dp; min/max
    // select an input value unchanged, so they compare exactly.
    assert(got.length == want.length)
    val eps = Map(2 -> 0.011, 3 -> 0.0, 4 -> 0.0, 5 -> 1.1e-4)
    got.zip(want).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0) && g.getInt(1) == e.getInt(1))
      (2 to 5).foreach { i =>
        assert(math.abs(g.getDouble(i) - e.getDouble(i)) <= eps(i),
          s"col $i: ${g.toSeq} vs ${e.toSeq}")
      }
    }
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

  test("q141: MAD matches a reference computation; outlier rule exact") {
    val vals = Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val want = vals.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      t -> (med, mad, xs.length, xs.count(x => math.abs(x - med) > 3 * mad))
    }
    val got = SparkEntry.queries("q141_mad_outliers")(spark, sf)
      .as[(String, Double, Double, Int, Int)].collect()
    assert(got.length == want.size)
    got.foreach { case (t, med, mad, n, nOut) =>
      val (wmed, wmad, wn, wout) = want(t)
      assert(math.abs(med - wmed) < 1e-4 && math.abs(mad - wmad) < 1e-4)
      assert(n == wn && nOut == wout, s"$t: got ($n,$nOut) want ($wn,$wout)")
    }
  }

  test("q143: slope/intercept match a reference OLS on exact integers") {
    val rows = Tables(spark, sf, "events")
      .select($"event_type", $"ts", $"value")
      .as[(String, java.sql.Timestamp, Double)].collect()
    val want = rows.groupBy(_._1).map { case (t, es) =>
      val h = es.map(e => e._2.getTime / 1000 / 3600)
      val h0 = h.min
      val x = h.map(_ - h0)
      val y = es.map(e => math.round(e._3 * 100))
      val n = x.length.toLong
      val (sx, sy) = (x.sum, y.sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val sxx = x.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
      def r(v: Double, s: Int) =
        BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (n.toInt, r(slope, 6), r((sy - slope * sx) / n, 4))
    }
    val got = SparkEntry.queries("q143_trend_per_key")(spark, sf)
      .as[(String, Int, Double, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (t, n, sl, ic) =>
      val (wn, wsl, wic) = want(t)
      assert(n == wn && sl == wsl && ic == wic,
        s"$t: got ($n,$sl,$ic) want ($wn,$wsl,$wic)")
    }
  }

  test("q142: rerank results are a subset of the integer-coarse top-50") {
    val out = SparkEntry.queries("q142_quantized_rerank")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 10)
    // exact-rerank scores are sorted desc with vec_id tiebreak
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) },
      "rerank order must be (cos_sim desc, vec_id)")
    // every survivor's coarse score is within the corpus-wide top-50:
    // recompute the integer coarse scores directly
    val emb = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val q = emb.find(_._1 == 0L).get._2.map(_.toDouble)
    def codes(v: Seq[Double]): Seq[Long] = {
      val am = v.map(math.abs).max
      v.map(x => math.floor(x * 127 / am + 0.5).toLong)
    }
    val qc = codes(q)
    val coarseAll = emb.filter(_._1 != 0L).map { case (id, v) =>
      id -> codes(v.map(_.toDouble)).zip(qc).map { case (a, b) => a * b }.sum
    }
    val top50 = coarseAll.sortBy { case (id, c) => (-c, id) }.take(50)
      .map(_._1).toSet
    out.foreach { case (id, coarse, _) =>
      assert(top50.contains(id), s"vec $id not in true coarse top-50")
      assert(coarseAll.toMap.apply(id) == coarse, s"coarse mismatch for $id")
    }
  }
}
