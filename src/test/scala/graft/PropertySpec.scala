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

  property("metadata.txt parse round-trips table blocks") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
      .map(_.distinct.take(5))) { cols =>
      cols.isEmpty || {
        val text = s"<begin_table>\nt1\n${cols.mkString("\n")}\n<end_table>\n"
        graft.sources.CsvCatalog.parseMetadata(text) == Map("t1" -> cols)
      }
    }
}
