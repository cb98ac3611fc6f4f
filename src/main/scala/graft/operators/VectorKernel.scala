package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Broadcast block-kernel for dense all-pairs vector math.
  *
  * The declarative form of a k-NN self-join (`a.join(b, i =!= j)` +
  * higher-order-function cosine) materializes O(n²) join rows and
  * evaluates an array expression per row — measured 60s at sf0.1
  * (2000², 64-dim) on local[4]. This kernel broadcasts the corpus as
  * primitive double arrays and runs the pair loop inside mapPartitions:
  * same O(n²) arithmetic, none of the row/array materialization —
  * ~100× less overhead per pair. This is the documented "(d)
  * mapPartitions as a last resort" case: the win comes from changing
  * the *operator's physical shape* (block-nested loop over primitives),
  * which no scalar Expression or join hint can express.
  *
  * Numeric contract: dot and norm are strict left-to-right double folds
  * and rounding replicates Spark's `round` (BigDecimal HALF_UP on the
  * shortest decimal representation), so results are bit-identical to
  * both the declarative Spark form and the DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - the broadcast side must fit in executor memory (dim × n × 8B);
  *    that is the standard regime for "corpus vs reference-set" k-NN.
  *    For corpus × corpus at cluster scale, pre-bucket with
  *    VectorFunctions.lshBucket and run this kernel per bucket — the
  *    probe side stays fully partitioned either way;
  *  - emitting only survivors (top-k / above-threshold) means shuffle
  *    and sink see O(n·k) rows, never O(n²).
  */
object VectorKernel {

  /** Spark-equivalent round(x, 4): HALF_UP over the value's shortest
    * decimal form — NOT math.round(x*1e4)/1e4, which disagrees on
    * exact-half doubles. Fast path avoids the BigDecimal allocation
    * whenever the scaled value is clearly away from a half-boundary
    * (u ≫ one-ulp-of-scaled from .5), falling back only on ambiguity. */
  private[graft] def round4(x: Double): Double = {
    if (x < 0) return -round4(-x)
    val scaled = x * 1e4
    val fl = math.floor(scaled)
    val frac = scaled - fl
    if (math.abs(frac - 0.5) > 1e-6)
      (if (frac > 0.5) fl + 1 else fl) / 1e4
    else
      JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP).doubleValue()
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def norm(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** (vec_id, raw double vector, norm), corpus-ordered by vec_id. */
  private def corpus(vs: DataFrame): Array[(Long, Array[Double], Double)] =
    vs.select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, norm(v))
      }.sortBy(_._1)

  /** Exact k-NN self-join: for every vector the top-`k` others by
    * (round4(cosine) DESC, vec_j ASC). Output: vec_i, vec_j, cos_sim, rn —
    * identical to the window-over-cross-join formulation. */
  def knnJoin(vs: DataFrame, k: Int): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    val corp = spark.sparkContext.broadcast(corpus(vs))
    val out = vs.select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val c = corp.value
        it.flatMap { case (i, vSeq) =>
          val v = vSeq.toArray
          val nv = norm(v)
          // insertion top-k ordered by (cos desc, j asc)
          val top = new Array[(Double, Long)](k)
          var size = 0
          var ci = 0
          while (ci < c.length) {
            val (j, w, nw) = c(ci)
            if (j != i) {
              val raw = dot(v, w) / (nv * nw)
              // prune: rounding moves a value by <1e-4, so anything this
              // far under the current kth entry can't enter the top-k
              if (size < k || raw >= top(size - 1)._1 - 1e-4) {
              val cos = round4(raw)
              var pos = size
              while (pos > 0 && {
                val (pc, pj) = top(pos - 1)
                pc < cos || (pc == cos && pj > j)
              }) pos -= 1
              if (pos < k) {
                val last = math.min(size, k - 1)
                var m = last
                while (m > pos) { top(m) = top(m - 1); m -= 1 }
                top(pos) = (cos, j)
                if (size < k) size += 1
              }
              }
            }
            ci += 1
          }
          (0 until size).map(r => (i, top(r)._2, top(r)._1, r + 1))
        }
      }.toDF("vec_i", "vec_j", "cos_sim", "rn")
    out.orderBy("vec_i", "rn")
  }

  /** All pairs (i < j) with unrounded cosine ≥ `threshold`; cos_sim
    * output rounded to 4. Equal to the cross-join + filter formulation. */
  def nearDupPairs(vs: DataFrame, threshold: Double): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    val corp = spark.sparkContext.broadcast(corpus(vs))
    val out = vs.select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val c = corp.value
        it.flatMap { case (i, vSeq) =>
          val v = vSeq.toArray
          val nv = norm(v)
          val res = Seq.newBuilder[(Long, Long, Double)]
          var ci = 0
          while (ci < c.length) {
            val (j, w, nw) = c(ci)
            if (j > i) {
              val cos = dot(v, w) / (nv * nw)
              if (cos >= threshold) res += ((i, j, round4(cos)))
            }
            ci += 1
          }
          res.result()
        }
      }.toDF("vec_i", "vec_j", "cos_sim")
    out.orderBy("vec_i", "vec_j")
  }
}
