package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: the 64-bit blockhash perceptual sketch of
  * a BINARY payload as its eight 8-bit band values, in ONE pass over the
  * bytes with whole-stage-codegen support. Output: ARRAY<BIGINT>(8),
  * band b = Σ_{k=0..7} bit_{8b+k} << k.
  *
  * Semantics (bit-identical to q171's oracle and to the pipelined
  * explode → partial-agg form this replaces): the n payload bytes are
  * cut into 64 integer-boundary blocks — 1-based position p belongs to
  * block (64p − 1) div n, the inverse of the oracle's boundary
  * hi_j = ((j+1)·n) div 64 — and block j's bit is set iff its mean byte
  * value is ≥ the whole payload's mean, decided in exact integer
  * arithmetic (s_j · n ≥ tot · l_j; overflow-safe below ~10⁹ bytes per
  * payload). Callers filter to n ≥ 64 (every block non-empty); an
  * accidental shorter input degrades gracefully (empty blocks → bit 0,
  * matching the aggregation form where absent rows contribute nothing).
  *
  * Why native: the sketch is per-row byte math, but no built-in
  * expresses "64 variable-boundary slice sums" without either an O(n²)
  * per-row substr scan, a 64×(slice+aggregate) expression tree (seconds
  * of codegen/eval overhead), or an explode + two-shuffle aggregation
  * (the previous form — correct and map-side-combined, but it pays two
  * exchanges and three aggregates for what is one tight loop). Codegen
  * emits a static call like [[MinHashSig]] — per-row loops gain nothing
  * from inlining and the codegen'd caller stays unbroken.
  */
case class BlockHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_blockhash64"

  override def nullSafeEval(input: Any): Any =
    BlockHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BlockHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): BlockHash64 =
    copy(child = newChild)
}

object BlockHash64 {

  /** One pass: per-block byte sums and counts, then the integer
    * mean-bit decision, then the 8-bit band fold. */
  def compute(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    val sums = new Array[Long](64)
    val lens = new Array[Long](64)
    var tot = 0L
    var p = 1
    while (p <= n) {
      val blk = ((64L * p - 1) / n).toInt
      val v = bytes(p - 1) & 0xFFL
      sums(blk) += v
      lens(blk) += 1
      tot += v
      p += 1
    }
    val bands = new Array[Long](8)
    var j = 0
    while (j < 64) {
      if (lens(j) > 0 && sums(j) * n >= tot * lens(j))
        bands(j >> 3) |= 1L << (j & 7)
      j += 1
    }
    new GenericArrayData(bands)
  }

  import org.apache.spark.sql.Column
  def blockhash64(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      BlockHash64(org.apache.spark.sql.graft.Bridge.expression(payload)))
}
