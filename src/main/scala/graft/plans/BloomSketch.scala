package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Column wrappers over Spark's native Bloom-filter expressions (the
  * machinery behind runtime row-group filtering, registered in the
  * FunctionRegistry as `bloom_filter_agg` / `might_contain` but not
  * exposed through `functions._`).
  *
  * Why not `DataFrameStatFunctions.bloomFilter` + a closure UDF: that
  * path collects the filter to the driver, re-broadcasts it as a Scala
  * object, and probes it through an interpreted UDF — three driver
  * round-trips and a codegen break per probe. Here the sketch is built
  * by a distributed aggregate (partial sketches OR-merged map-side),
  * reaches the probe side as a constant or scalar subquery — the only
  * two sketch shapes `might_contain` accepts (InjectRuntimeFilter emits
  * the subquery form via `Dataset.scalar()`; an eagerly-built sketch
  * binds as a binary literal) — and the probe is a native expression
  * that stays inside whole-stage codegen. Both sides hash with
  * `xxhash64`, the same keying the runtime-filter rule uses.
  */
object BloomSketch {

  /** Aggregate a column of xxhash64 values into one Bloom sketch
    * (binary). `expectedItems`/`numBits` size the sketch; use
    * [[optimalNumBits]] to derive bits from a target false-positive
    * rate. CAVEAT: the underlying aggregate silently clamps both values
    * to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/
    * `.maxNumBits` (4M / 64M-bit defaults) — when sizing past those,
    * raise the confs first or the real fpp quietly degrades (the Scrub
    * call site does this). */
  def bloomFilterAgg(hashes: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(hashes),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True iff the sketch may contain `hash` (an xxhash64 value). No
    * false negatives, so filtering on this before an exact verify join
    * loses nothing. */
  def mightContain(bloom: Column, hash: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom), Bridge.expression(hash)))

  /** Standard optimal sizing `-n·ln(p)/ln²2`, floored at 64 bits. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    math.max(64L,
      math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)).toLong)
  }
}
