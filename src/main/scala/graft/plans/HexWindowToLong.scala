package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a 15-hex-char window of a digest string into a long, starting
  * at 1-based `offset`: semantically identical to
  * `conv(substr(hex, offset, 15), 16, 10) :: BIGINT` for lowercase hex
  * input, but a single codegen'd loop instead of conv's generic
  * radix-conversion machinery — the MinHash hot path evaluates this
  * millions of times per scale factor.
  */
case class HexWindowToLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, INT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_window"

  override def nullSafeEval(hex: Any, off: Any): Any = {
    val s = hex.asInstanceOf[UTF8String].toString
    val start = off.asInstanceOf[Int] - 1
    var v = 0L
    var i = start
    val end = math.min(start + 15, s.length)
    while (i < end) {
      val c = s.charAt(i)
      val d = if (c <= '9') c - '0' else c - 'a' + 10
      v = (v << 4) | d
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hex, off) => {
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      s"""
         |long $v = 0L;
         |int $i = $off - 1;
         |int $end = java.lang.Math.min($i + 15, $hex.numChars());
         |for (; $i < $end; $i++) {
         |  char $c = (char) $hex.getByte($i);
         |  $v = ($v << 4) | ($c <= '9' ? $c - '0' : $c - 'a' + 10);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HexWindowToLong =
    copy(left = newLeft, right = newRight)
}

object HexWindowToLong {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col => _, encode, md5}

  def hexWindow(hex: Column, offset1Based: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      HexWindowToLong(
        org.apache.spark.sql.graft.Bridge.expression(hex),
        org.apache.spark.sql.catalyst.expressions.Literal(offset1Based)))

  /** THE deterministic sampling/split gate every operator shares
    * (q87/q88/q92/q99/q104/q111, pack-sequence sharding, ...): first 15
    * hex chars of md5(key) as a long, mod `mod`. DuckDB twin:
    * `('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT % mod`.
    * ONE definition — the train/test splits of different operators are
    * documented to agree, so the expression must never fork per site. */
  def md5Bucket(key: Column, mod: Int): Column =
    hexWindow(md5(encode(key.cast("string"), "UTF-8")), 1) % mod
}
