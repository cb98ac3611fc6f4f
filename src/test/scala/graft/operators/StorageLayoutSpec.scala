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

  test("q150 compaction bins partition each source and respect the target") {
    val out = SparkEntry.queries("q150_compaction_plan")(spark, sf).cache()
    val docs = graft.Tables(spark, sf, "documents")
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
    // reference fold computed independently per source in driver memory:
    // each file keeps its (src, bin, id, sz) assignment
    val assigned = docs.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, id, sz) =>
        val bin = (cum / 2048).toInt; cum += sz; (src, bin, id, sz)
      }
    }
    val expected = assigned.groupBy(t => (t._1, t._2)).map {
      case ((src, bin), fs) =>
        (src, bin, fs.size, fs.map(_._4).sum, fs.map(_._3).min,
          fs.map(_._3).max)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = out.as[(String, Int, Int, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSeq
    assert(got == expected, "cumsum-chunked plan must match the reference fold")
    // the cumsum-chunk size guarantee: a bin's bytes minus its largest
    // file stay under the target (every file but the boundary-crossing
    // one fits inside the 2048 window) — what makes each bin a valid
    // ~target-sized rewrite task; and bins are contiguous from 0
    val maxFile = assigned.groupBy(t => (t._1, t._2))
      .map { case (k, fs) => k -> fs.map(_._4).max }
    got.foreach { case (src, bin, _, bytes, _, _) =>
      assert(bytes - maxFile((src, bin)) < 2048,
        s"$src bin $bin: $bytes bytes exceeds target + largest file")
    }
    got.groupBy(_._1).foreach { case (src, bins) =>
      assert(bins.map(_._2).sorted == (0 until bins.size).toList,
        s"$src bins must be contiguous from 0")
    }
    out.unpersist()
  }

  test("q160 shard plan: contiguous positions, invertible interleave") {
    val got = SparkEntry.queries("q160_shard_plan")(spark, sf)
      .select($"doc_id", $"shard", $"pos", $"global_pos")
      .as[(Long, Int, Long, Long)].collect()
    // every doc appears once; shard/pos pairs are unique
    assert(got.map(_._1).distinct.length == got.length)
    // per shard: positions are exactly 0..n_s-1 (a loader can stream a
    // shard by offset with no gaps)
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $sh positions not contiguous")
    }
    // the round-robin interleave is invertible: a global step number
    // maps back to (shard, offset) by mod/div alone
    got.foreach { case (_, sh, pos, g) =>
      assert(g % 8 == sh && g / 8 == pos, s"interleave broken at $g")
    }
    // determinism + hash order: the within-shard order is the md5 order
    // the driver can replay
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = java.lang.Long.parseLong(
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3).map(_._1).toSeq
      val byHash = rows.map(_._1).sortBy(id => (h(id), id)).toSeq
      assert(byPos == byHash, "within-shard order must be the md5 order")
    }
  }

  test("q168 equi-depth bins match brute-force ranks and balance depth") {
    val rows = graft.Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)].collect()
      .map { case (k, p) => (k, math.round(p * 100)) }
      .sortBy { case (k, c) => (c, k) }
    val n = rows.length
    val expected = rows.zipWithIndex
      .map { case ((_, c), i) => (i.toLong * 10 / n, c) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.length.toLong, g.map(_._2).min, g.map(_._2).max) }
    val got = SparkEntry.queries("q168_equidepth_hist")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected,
      "two-phase octave ranks must equal the sequential sort ranks")
    // exactly 10 bins partitioning the table, each within one row of
    // the ideal depth (the equi-depth guarantee rank-binning provides)
    assert(got.map(_._1) == (0L to 9L) && got.map(_._2).sum == n)
    got.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 10.0) <= 1.0, s"bin $b depth $cnt skewed")
    }
    // bins are value-contiguous: each bin's hi <= next bin's lo
    got.sliding(2).foreach { case Seq(a, b2) =>
      assert(a._4 <= b2._3, s"bins $a and $b2 overlap")
    case _ => }
  }
}
