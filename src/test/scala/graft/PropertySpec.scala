package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.VectorKernel

/** ScalaCheck properties for the pure kernels (SURVEY.md §5 item 4).
  * The rounding property is load-bearing: VectorKernel.round4's fast
  * path MUST agree with Spark's BigDecimal HALF_UP everywhere, or the
  * kernel silently diverges from the declarative form and the oracle. */
object PropertySpec extends Properties("graft") {

  private def sparkRound4(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()

  property("round4 fast path ≡ Spark BigDecimal HALF_UP (uniform)") =
    Prop.forAll(Gen.chooseNum(-1.0, 1.0)) { x =>
      VectorKernel.round4(x) == sparkRound4(x)
    }

  property("round4 agrees on adversarial near-half values") =
    Prop.forAll(Gen.chooseNum(-20000, 20000), Gen.chooseNum(-3, 3)) {
      (n, ulps) =>
        // values at and within a few ulps of k/2e4 — exactly where the
        // fast path hands off to BigDecimal
        var x = n.toDouble / 2e4
        var i = 0
        while (i < math.abs(ulps)) {
          x = if (ulps > 0) Math.nextUp(x) else Math.nextDown(x)
          i += 1
        }
        VectorKernel.round4(x) == sparkRound4(x)
    }

  property("round4 idempotent") =
    Prop.forAll(Gen.chooseNum(-1.0, 1.0)) { x =>
      val r = VectorKernel.round4(x)
      VectorKernel.round4(r) == r
    }

  // q158's (dot, vec_id) → BIGINT packing: packed order must be exactly
  // (dot desc, vec_id asc) so an O(k) top-k heap over packed longs
  // equals a rank window over the pair — including ties and negative
  // dots. Bounds are the query's own: |dot| ≤ 127²·64 < 2^21,
  // vec_id < 2^40.
  private def pack(dot: Long, vecId: Long): Long =
    (dot + (1L << 21)) * (1L << 40) + ((1L << 40) - 1 - vecId)

  private val dotGen = Gen.chooseNum(-127L * 127 * 64, 127L * 127 * 64)
  private val idGen = Gen.chooseNum(0L, (1L << 40) - 1)

  property("q158 packing orders by (dot desc, id asc) and round-trips") =
    Prop.forAll(dotGen, idGen, dotGen, idGen) { (d1, i1, d2, i2) =>
      val (p1, p2) = (pack(d1, i1), pack(d2, i2))
      val orderOk =
        if (d1 != d2) (p1 > p2) == (d1 > d2)
        else if (i1 != i2) (p1 > p2) == (i1 < i2)
        else p1 == p2
      val decodeOk = {
        val id = (1L << 40) - 1 - java.lang.Math.floorMod(p1, 1L << 40)
        val dot = java.lang.Math.floorDiv(p1, 1L << 40) - (1L << 21)
        id == i1 && dot == d1
      }
      orderOk && decodeOk && p1 > 0
    }

  property("metadata.txt parse round-trips table blocks") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
      .map(_.distinct.take(5))) { cols =>
      cols.isEmpty || {
        val text = s"<begin_table>\nt1\n${cols.mkString("\n")}\n<end_table>\n"
        graft.sources.CsvCatalog.parseMetadata(text) == Map("t1" -> cols)
      }
    }
}
