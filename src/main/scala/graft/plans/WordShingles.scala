package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word n-gram shingles of a text
  * column, in one pass over the string.
  *
  * Semantically identical to the compositional form
  * `array_distinct(transform(sequence(1, size(ws)-n+1), i =>
  *   concat_ws(" ", element_at(ws,i), ..., element_at(ws,i+n-1))))`
  * with `ws = split(text, " ")` — including single-space (non-regex)
  * word splitting with empty tokens preserved, and first-seen dedup
  * order. The compositional form interprets ~n lambda evaluations per
  * shingle (higher-order functions don't codegen) and was the dominant
  * cost of the shared shingle cache that every text-similarity query
  * builds (~3-5s of whichever of q41-q44 runs first at sf0.1); this is
  * one string scan per document. Shingling is the hot map stage of text
  * dedup at any scale, so this is the (b)-tier custom-Expression case
  * from SURVEY §4.
  *
  * Codegen emits a static call (real work is per-row string building, so
  * inlining buys nothing) — whole-stage codegen stays unbroken.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WordShingles.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Distinct word n-grams of `text`, split on single spaces (empty
    * tokens kept, trailing empties kept — same as `split(text," ")` with
    * regex limit -1), joined with single spaces, first-seen order. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((words.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.Column
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordShingles(org.apache.spark.sql.graft.Bridge.expression(text), n))
}
