package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed block-nested-loop kernel for dense all-pairs vector math.
  *
  * The declarative form of a k-NN self-join (`a.join(b, i =!= j)` +
  * higher-order-function cosine) materializes O(n²) join rows and
  * evaluates an array expression per row — measured 60s at sf0.1
  * (2000², 64-dim) on local[4]. This kernel instead:
  *
  *   1. hashes every vector into one of B blocks and packs each block
  *      into a single row (`collect_list` — one shuffle of the corpus);
  *   2. joins the B-row block table to itself on `x.blk <= y.blk`
  *      (B(B+1)/2 block pairs; both sides are tiny, so this is a
  *      broadcast join of block handles, never of the corpus);
  *   3. runs the dense pair loop over primitive double arrays inside
  *      each block-pair task, emitting only survivors.
  *
  * No driver-side collect anywhere: the corpus never leaves the
  * executors (the earlier revision broadcast a driver-materialized
  * array — a driver OOM at real scale). Each task touches exactly two
  * blocks, so executor memory scales as O(n/B · dim) regardless of
  * corpus size; pick B so a block fits comfortably (at 100 TB that
  * means B grows with the corpus, and the B² task count is the
  * parallelism you want anyway). Emission is O(n·k) for top-k and
  * O(survivors) for threshold pairs, never O(n²) rows.
  *
  * This remains the documented "(d) mapPartitions as a last resort"
  * case: the win comes from the operator's physical shape (dense
  * block-nested loop over primitives), which no scalar Expression or
  * join hint can express.
  *
  * Numeric contract: dot and norm are strict left-to-right double folds
  * and rounding replicates Spark's `round` (BigDecimal HALF_UP on the
  * shortest decimal representation), so results are bit-identical to
  * both the declarative Spark form and the DuckDB oracle.
  */
object VectorKernel {

  /** One block of (vec_id, vector) rows, packed into a single row. */
  private type Block = Seq[(Long, Array[Double])]

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

  /** Block table self-joined into (bx, by, xs, ys) pairs, bx <= by.
    * Every unordered vector pair appears in exactly one block pair. */
  private def blockPairs(
      vs: DataFrame, numBlocks: Int): Dataset[(Int, Int, Block, Block)] = {
    val spark = vs.sparkSession
    import spark.implicits._
    val g = vs.select(
        pmod(hash(col("vec_id")), lit(numBlocks)).as("blk"),
        struct(col("vec_id").as("_1"), col("v").as("_2")).as("r"))
      .groupBy("blk").agg(collect_list(col("r")).as("rs"))
    g.as("x").join(g.as("y"), col("x.blk") <= col("y.blk"))
      .select(col("x.blk").as("_1"), col("y.blk").as("_2"),
        col("x.rs").as("_3"), col("y.rs").as("_4"))
      .as[(Int, Int, Block, Block)]
  }

  private def defaultBlocks(vs: DataFrame): Int =
    math.max(vs.sparkSession.sparkContext.defaultParallelism / 2, 4)

  private def dense(b: Block): (Array[Long], Array[Array[Double]], Array[Double]) = {
    val ids = new Array[Long](b.size)
    val vecs = new Array[Array[Double]](b.size)
    val norms = new Array[Double](b.size)
    var i = 0
    b.foreach { case (id, arr) =>
      ids(i) = id; vecs(i) = arr; norms(i) = norm(arr); i += 1
    }
    (ids, vecs, norms)
  }

  /** Exact k-NN self-join: for every vector the top-`k` others by
    * (round4(cosine) DESC, vec_j ASC). Output: vec_i, vec_j, cos_sim, rn —
    * identical to the window-over-cross-join formulation. Each block-pair
    * task emits a partial top-k per vector (≤ (|xs|+|ys|)·k rows); the
    * final window merges partials — the true top-k is always contained
    * in the union of per-task top-ks. */
  def knnJoin(vs: DataFrame, k: Int): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    val partial = blockPairs(vs, defaultBlocks(vs)).flatMap {
      case (bx, by, xsb, ysb) =>
        val (xi, xv, xn) = dense(xsb)
        val out = Seq.newBuilder[(Long, Long, Double)]
        // per-vector insertion top-k ordered by (cos desc, j asc)
        def topkOf(i: Int, ids: Array[Long], vecs: Array[Array[Double]],
                   cids: Array[Long], cvecs: Array[Array[Double]],
                   cnorms: Array[Double], selfNorm: Double): Unit = {
          val id = ids(i); val v = vecs(i)
          val top = new Array[(Double, Long)](k)
          var size = 0
          var c = 0
          while (c < cids.length) {
            val j = cids(c)
            if (j != id) {
              val cos = round4(dot(v, cvecs(c)) / (selfNorm * cnorms(c)))
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
            c += 1
          }
          var r = 0
          while (r < size) { out += ((id, top(r)._2, top(r)._1)); r += 1 }
        }
        if (bx == by) {
          var i = 0
          while (i < xi.length) { topkOf(i, xi, xv, xi, xv, xn, xn(i)); i += 1 }
        } else {
          val (yi, yv, yn) = dense(ysb)
          var i = 0
          while (i < xi.length) { topkOf(i, xi, xv, yi, yv, yn, xn(i)); i += 1 }
          i = 0
          while (i < yi.length) { topkOf(i, yi, yv, xi, xv, xn, yn(i)); i += 1 }
        }
        out.result()
    }.toDF("vec_i", "vec_j", "cos_sim")
    val w = Window.partitionBy("vec_i")
      .orderBy(col("cos_sim").desc, col("vec_j").asc)
    partial
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("vec_i", "rn")
  }

  /** All pairs (i < j) with unrounded cosine ≥ `threshold`; cos_sim
    * output rounded to 4. Equal to the cross-join + filter formulation. */
  def nearDupPairs(vs: DataFrame, threshold: Double): DataFrame = {
    val spark = vs.sparkSession
    import spark.implicits._
    blockPairs(vs, defaultBlocks(vs)).flatMap { case (bx, by, xsb, ysb) =>
      val (xi, xv, xn) = dense(xsb)
      val out = Seq.newBuilder[(Long, Long, Double)]
      if (bx == by) {
        var i = 0
        while (i < xi.length) {
          var j = i + 1
          while (j < xi.length) {
            val cos = dot(xv(i), xv(j)) / (xn(i) * xn(j))
            if (cos >= threshold) {
              val (lo, hi) =
                if (xi(i) < xi(j)) (xi(i), xi(j)) else (xi(j), xi(i))
              out += ((lo, hi, round4(cos)))
            }
            j += 1
          }
          i += 1
        }
      } else {
        val (yi, yv, yn) = dense(ysb)
        var i = 0
        while (i < xi.length) {
          var j = 0
          while (j < yi.length) {
            val cos = dot(xv(i), yv(j)) / (xn(i) * yn(j))
            if (cos >= threshold) {
              val (lo, hi) =
                if (xi(i) < yi(j)) (xi(i), yi(j)) else (yi(j), xi(i))
              out += ((lo, hi, round4(cos)))
            }
            j += 1
          }
          i += 1
        }
      }
      out.result()
    }.toDF("vec_i", "vec_j", "cos_sim")
      .orderBy("vec_i", "vec_j")
  }
}
