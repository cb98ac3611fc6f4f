package graft.plans

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions

/** The native expression must be bit-identical to the compositional
  * higher-order-function form on both the interpreted and codegen paths,
  * and callable from SQL once registered. */
class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new Random(7)
    (1 to 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
  }

  test("fused expression ≡ compositional cosine, bit-exact") {
    val a = vecs.select($"id".as("i"), $"v".as("va"))
    val b = vecs.select($"id".as("j"), $"v".as("vb"))
    val both = a.join(b, $"i" < $"j")
      .select(
        VectorFunctions.cosineFast($"va", $"vb").as("fused"),
        VectorFunctions.cosine($"va", $"vb").as("composed"))
      .select(sum(when($"fused" === $"composed", 0).otherwise(1)).as("diff"))
      .as[Long].head()
    assert(both == 0, "fused and compositional cosine disagree")
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = CosineSimilarity(
      Literal.create(Array(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Array(2.0, 4.0, 6.0), ArrayType(DoubleType)))
    val interp = e.eval(null).asInstanceOf[Double]
    assert(math.abs(interp - 1.0) < 1e-12)
  }

  test("SQL registration via GraftExtensions builder") {
    // exercise the same builder the extension injects
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1)),
      "scala_udf")
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .as[Double].head()
    assert(math.abs(r) < 1e-12)
  }
}
