package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columnNodeSupport.scala); third-party expression
  * libraries conventionally expose them through a package-located shim
  * like this one. Only the two conversions are exposed — no other
  * internals leak past this file. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage blocks behind a `localCheckpoint()`ed frame.
    *
    * `Dataset.unpersist` only reaches CacheManager-cached plans; a
    * local checkpoint is a persisted RDD pinned inside the returned
    * frame's `LogicalRDD` leaf, invisible to both the cache manager
    * and graft's CacheRegistry release ledger — so every checkpoint
    * pin a lifecycle op takes (the append/repair delta pins) stayed
    * resident until the ContextCleaner happened to GC it (the ~0.6 MiB
    * final-resident tail the r17 close recorded). This walks the
    * analyzed plan and unpersists the pinned RDD(s) directly.
    *
    * CAUTION (the connected-components rule): a local checkpoint's
    * blocks are the frame's ONLY copy — lineage is truncated — so call
    * this strictly AFTER every consumer of the frame has materialized.
    * No-op on frames that carry no checkpoint leaf. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
