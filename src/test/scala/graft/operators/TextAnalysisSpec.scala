package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantic invariants of the corpus-diagnostic additions: n-gram
  * novelty (q162) and the octave-binned Zipf slope (q163) — properties
  * the hash oracle cannot see (it only pins equality with DuckDB on one
  * corpus). */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q162 novelty equals brute force; novel grams partition the df=1 set") {
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams = docs.map { case (id, t) => id -> t.split(" ") }
      .filter(_._2.length >= 3)
      .map { case (id, ws) =>
        id -> ws.sliding(3).map(_.mkString(" ")).toArray.distinct
      }.toMap
    val df = grams.values.flatten.groupBy(identity).map { case (g, o) =>
      g -> o.size
    }
    val expected = grams.toSeq.sortBy(_._1).map { case (id, gs) =>
      val novel = gs.count(df(_) == 1).toLong
      (id, gs.length, novel, novel * 10000 / gs.length)
    }
    val got = SparkEntry.queries("q162_ngram_novelty")(spark, sf)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == expected, "novelty must match the brute-force recompute")
    // every corpus-unique gram is attributed to exactly one doc
    assert(got.map(_._3).sum == df.values.count(_ == 1),
      "sum of per-doc novel grams must equal the df=1 gram count")
  }

  test("q163 slope equals a brute-force integer OLS and decays") {
    val toks = Tables(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .flatMap { case (src, t) => t.split(" ").map(src -> _) }
    val expected = toks.groupBy(_._1).toSeq.map { case (src, ts) =>
      val top = ts.groupBy(_._2).map { case (tok, o) => (tok, o.size.toLong) }
        .toSeq.sortBy { case (tok, c) => (-c, tok) }.take(100)
      val pairs = top.zipWithIndex.map { case ((_, c), i) =>
        (java.lang.Long.toBinaryString(i + 1L).length.toLong,
          java.lang.Long.toBinaryString(c).length.toLong)
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val slope = BigDecimal((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, n.toInt, slope)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q163_zipf_octave")(spark, sf)
      .as[(String, Int, Double)].collect().toSeq
    assert(got == expected, "slope must match the driver-side integer OLS")
    // token frequencies decay: no source's octave slope is positive
    // (flat 0.0 is possible at octave resolution when every top count
    // shares a bit length), and the corpus as a whole really decays
    got.foreach { case (src, _, sl) =>
      assert(sl <= 0, s"$src slope $sl should not be positive")
    }
    assert(got.exists(_._3 < 0), "at least one source must strictly decay")
  }

  test("q169 offsets: substring round-trip, contiguous spans, full coverage") {
    val texts = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("q169_tokenize_offsets")(spark, sf)
      .as[(Long, Int, String, Long, Long)].collect()
    assert(rows.length == texts.values.map(_.split(" ", -1).length).sum)
    // THE property the operator exists for: every (char_start, char_end)
    // span cut from the ORIGINAL text is exactly its token
    rows.foreach { case (id, pos, tok, cs, ce) =>
      assert(ce - cs == tok.length, s"doc $id pos $pos span width")
      assert(texts(id).substring(cs.toInt, ce.toInt) == tok,
        s"doc $id pos $pos span must cut the token from the original text")
    }
    // spans tile the document: consecutive tokens are separated by
    // exactly the single joining space, and the last span ends at EOT
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val s = rs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._5 + 1, s"doc $id gap at ${b._2}")
        case _ => ()
      }
      assert(s.head._4 == 0L)
      assert(s.last._5 == texts(id).length.toLong, s"doc $id EOT")
    }
  }
}
