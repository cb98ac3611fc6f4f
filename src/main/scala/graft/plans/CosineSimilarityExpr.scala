package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two ARRAY<DOUBLE>
  * columns in a single fused pass (dot + both norms in one loop), with
  * full whole-stage-codegen support via doGenCode — the (b) tier of the
  * extension preference order (SURVEY.md §4): a codegen'd Expression
  * beats a Scala UDF (no serialization, no iterator breaks) and beats
  * the compositional zip_with/aggregate form (no intermediate arrays —
  * one loop instead of three plus two allocations per row).
  *
  * Numeric contract: each accumulator (dot, ‖a‖², ‖b‖²) folds strictly
  * left-to-right, so results are bit-identical to
  * graft.functions.VectorFunctions.cosine and to the DuckDB oracle's
  * list_sum comprehensions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dt = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dt += xi * yi; sa += xi * xi; sb += yi * yi
      i += 1
    }
    dt / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dt = ctx.freshName("dt")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dt = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dt += $xi * $yi; $sa += $xi * $xi; $sb += $yi * $yi;
         |}
         |${ev.value} = $dt / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "graft_cosine")
}
