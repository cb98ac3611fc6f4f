package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the distinct winnowing fingerprints
  * (k=3, w=4 — Schleimer/Wilkerson/Aiken's MOSS sketch) of an
  * ARRAY<STRING> of words, in ONE imperative pass: build each positional
  * 3-gram's bytes, md5 it (binary — no hex string), take the top 60 bits
  * of the digest (== DuckDB's `('0x'||substr(md5(g),1,15))::BIGint`),
  * slide a window of 4 consecutive gram hashes keeping each window's
  * minimum, and emit the distinct minima. Output: ARRAY<BIGINT>.
  *
  * Bit-identical to the compositional form it replaces —
  * `transform(sequence(1, n-2), i -> HexWindowToLong(md5(concat_ws(' ',
  * ws[i], ws[i+1], ws[i+2])), 1))` then windowed
  * `array_min(slice(...))` + `array_distinct` — WinnowSpec property-
  * tests the equivalence on real corpus docs. The compositional form
  * runs every md5 through interpreted higher-order-function lambdas and
  * allocates a window slice per position (~500 s for the q146 pair join
  * at sf0.1, measured); this is one digest and a running min per gram.
  *
  * Fewer than w grams (docs under k+w-1+... = 6 words when k=3, w=4)
  * yield an empty array — callers filter those docs, mirroring the
  * oracle's `WHERE len(ws) >= 6`.
  */
case class WinnowFP(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFP.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WinnowFP.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFP =
    copy(child = newChild)
}

object WinnowFP {

  /** Shingle width and window size — fixed (they define the ≥ K+W-1 = 6
    * shared-run guarantee the operator documents). */
  final val K = 3
  final val W = 4

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private final val Mask60 = (1L << 60) - 1
  private final val Space = Array[Byte](' ')

  /** Distinct window-minima of the positional 3-gram hashes; empty when
    * there are fewer than W grams (under K+W-1 words). Null words hash
    * as empty strings (the splitters never produce nulls). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val nGrams = n - K + 1
    if (nGrams < W) return new GenericArrayData(Array.emptyLongArray)
    val md = md5.get()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      var j = 0
      while (j < K) {
        if (j > 0) md.update(Space)
        if (!words.isNullAt(i + j)) md.update(words.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      var hi = 0L
      var b = 0
      while (b < 8) {
        hi = (hi << 8) | (d(b) & 0xFFL)
        b += 1
      }
      hs(i) = (hi >>> 4) & Mask60 // first 15 hex chars = top 60 bits
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var w0 = 0
    while (w0 <= nGrams - W) {
      var m = hs(w0)
      var j = 1
      while (j < W) {
        if (hs(w0 + j) < m) m = hs(w0 + j)
        j += 1
      }
      out.add(m)
      w0 += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    new GenericArrayData(res)
  }

  import org.apache.spark.sql.Column
  def winnowFp(words: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WinnowFP(org.apache.spark.sql.graft.Bridge.expression(words)))
}
