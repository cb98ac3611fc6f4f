package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query paired with its DuckDB oracle SQL.
  *
  * The driver contract (SURVEY.md §5, BASELINE.md) hash-compares each
  * query's result against the oracle run on the same parquet tables, with
  * columns sorted by name — so every computed column must carry the SAME
  * alias on both sides, every query must be deterministic (explicit ORDER
  * BY on a unique key, or aggregation to provably-unique groups), and
  * result types must line up (DuckDB `sum(BIGINT)` returns HUGEINT, so
  * oracles cast back to BIGINT; `year()`/`length()` return BIGINT, cast to
  * INTEGER; `date_trunc('month', ts)` returns DATE, cast to TIMESTAMP).
  *
  * Queries without a SQL-expressible oracle (streaming, approximate
  * sketches) set `oracle = None`; the driver then records a weaker
  * rows-only check.
  *
  * STANDING RULE — constructors define plans, they do not execute:
  * `fn(spark, dir)` must launch ZERO Spark jobs (no `.head()`,
  * `.count()`, `.collect()`, eager writes). `Bench.deriveReleasePlan`,
  * the release-plan spec, and plan audits all replay construction and
  * rely on it being free; a constructor-time job also blurs Bench's
  * timed/untimed boundary. Data-dependent plan choices go behind a
  * conf gate whose branches consume identical cache keys (the
  * jaccard-pairs probe, `TextDedup.BranchConf`, is the pattern).
  * `PlanConstructionSpec` enforces this, with the eager-by-design
  * exceptions (q109 connector write, q110 ANALYZE, and the three
  * iterative materializers q89/q121/q135) pinned exactly there.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
