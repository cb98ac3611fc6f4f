package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Feature/example preparation for model training (SURVEY.md §2C): the
  * step between curated rows and tensors.
  *
  *  - q112 generates next-event-prediction examples from event
  *    sequences: per user, ordered by time, a sliding window of the 3
  *    preceding event types becomes the context and the current event
  *    the label — the classic sequence-model dataset build. One shuffle
  *    (window keyed by user); examples inherit the user partitioning,
  *    so at 100 TB the build is embarrassingly parallel over users and
  *    no user's history crosses an executor boundary.
  *  - q113 standardizes a numeric feature per group (z-score): group
  *    mean/variance from ONE pass of sums (sum, sum of squares, count —
  *    the same partial-agg shape as any rollup), broadcast back, then a
  *    narrow map. Mean/var are computed with the explicit sum formulas
  *    on BOTH engines so the oracle compares the identical arithmetic;
  *    z-scores carry a sqrt in the denominator, so 4-dp rounding never
  *    sits on a half boundary (oracle discipline: AVG alone is unsafe,
  *    x/sqrt(v) is fine).
  */
object FeaturePrep {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── sliding-window training examples: context = 3 previous event
    //    types for the same user (time order, event_id tiebreak), label
    //    = the current type. Users' first 3 events are incomplete
    //    contexts and are dropped — exactly what a trainer would do.
    QueryDef(
      "q112_next_event_examples",
      """SELECT event_id, user_id,
        |  ctx1 || ',' || ctx2 || ',' || ctx3 AS context,
        |  event_type AS label
        |FROM (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_type, 3) OVER w AS ctx1,
        |    lag(event_type, 2) OVER w AS ctx2,
        |    lag(event_type, 1) OVER w AS ctx3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |WHERE ctx1 IS NOT NULL
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          lag("event_type", 3).over(w).as("ctx1"),
          lag("event_type", 2).over(w).as("ctx2"),
          lag("event_type", 1).over(w).as("ctx3"))
        .filter(col("ctx1").isNotNull)
        .select(col("event_id"), col("user_id"),
          concat_ws(",", col("ctx1"), col("ctx2"), col("ctx3")).as("context"),
          col("event_type").as("label"))
        .orderBy("event_id")
    },

    // ── per-group z-score standardization: one stats pass (n, Σx, Σx²),
    //    broadcast the per-type stats, narrow-map the z. Explicit
    //    formulas (not avg/stddev built-ins) so both engines run the
    //    same arithmetic; population variance.
    QueryDef(
      "q113_zscore_normalize",
      """WITH st AS (SELECT event_type, count(*) AS n, sum(value) AS sx,
        |              sum(value * value) AS sxx
        |            FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - sx / n)
        |        / sqrt(sxx / n - (sx / n) * (sx / n)), 4) AS z
        |FROM events e JOIN st USING (event_type)
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = T(s, dir, "events")
      val st = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("sx"),
          sum(col("value") * col("value")).as("sxx"))
      val mean = col("sx") / col("n")
      ev.join(broadcast(st), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round((col("value") - mean)
            / sqrt(col("sxx") / col("n") - mean * mean), 4).as("z"))
        .orderBy("event_id")
    }
  )
}
