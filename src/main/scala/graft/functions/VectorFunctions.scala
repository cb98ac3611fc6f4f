package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built purely from
  * codegen'd higher-order functions (`transform`/`zip_with`/`aggregate`)
  * — no UDFs, so whole-stage codegen stays unbroken and the expressions
  * push through Catalyst like any built-in.
  *
  * All math is done in DOUBLE with strict left-to-right accumulation so
  * results are reproducible and comparable across engines.
  */
object VectorFunctions {

  /** Cast a float array to double element-wise. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ xᵢ·yᵢ, left-to-right in double. Arrays must have equal length. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** ‖v‖₂ */
  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))

  /** cos(a,b) = a·b / (‖a‖‖b‖); inputs must already be double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Same value as [[cosine]], computed by the fused native Catalyst
    * expression (one codegen'd loop, no intermediate arrays) —
    * graft.plans.CosineSimilarity. Bit-identical results. */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.CosineSimilarity(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Largest |xᵢ| of a double array — the symmetric-quantization scale
    * denominator. */
  def absMax(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** Symmetric int8 absmax quantization codes: floor(x·127/absmax + 0.5)
    * per element — floor(+0.5) instead of round() so every engine takes
    * the identical IEEE path (no HALF_UP vs half-away divergence). THE
    * single definition of the code rule: q106's per-vector report and
    * the shared int8Codes frame (q142 coarse sweep, q158 hard-negative
    * miner) and their DuckDB oracles must all agree bit-for-bit, so the
    * expression must never fork per site. Caller guards absmax > 0
    * (a zero vector has no direction to quantize). */
  def int8Code(v: Column, absmax: Column): Column =
    transform(v, x => floor(x * 127 / absmax + 0.5).cast("long"))

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim d):
    * integer arithmetic only, so any engine reproduces it exactly.
    * Values lie in [-48, 48]. */
  def planeWeight(j: Int, d: Column): Column =
    (lit(j.toLong * 73856093L) + d * lit(19349663L)) % 97 - 48

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits — the
    * classic SimHash-for-vectors construction. Two vectors with small
    * angle land in the same bucket with high probability; bucketing
    * turns brute-force O(n²) similarity search into a per-bucket join. */
  def lshBucket(v: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val d = aggregate(
        transform(v, (x, i) => x * planeWeight(j, i).cast("double")),
        lit(0.0), _ + _)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
