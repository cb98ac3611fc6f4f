package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Time-window aggregations over the `events` table, run in BATCH mode so
  * they are DuckDB-oracle-checkable (SURVEY.md §2C row 6). The identical
  * window()/session_window() expressions run unchanged on a stream —
  * graft.streaming.StreamingOps wires them to readStream + watermark, and
  * the scalatest suite drives that path through MemoryStream (streaming
  * has no SQL oracle; the contract allows omission).
  *
  * Scale notes (100 TB posture):
  *  - tumbling/sliding windows are plain groupBy keys: partial aggregation
  *    applies, the shuffle carries one row per (window × type), and in
  *    streaming mode state is bounded by the watermark horizon;
  *  - session windows shuffle once on user_id; per-key state is one open
  *    session — the merge is associative so AQE/skew handling applies;
  *  - sliding windows fan each row out to (size/slide) windows BEFORE the
  *    partial agg — network cost stays O(windows), not O(events).
  */
object StreamWindows {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── tumbling 1-hour windows per event type
    QueryDef(
      "q60_window_tumbling",
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM e GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin) {
      (s, dir) =>
        T(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
            col("event_type"), col("n"), col("total"))
          .orderBy("w_start", "event_type")
    },

    // ── session windows per user, 10-minute inactivity gap.
    //    Oracle reconstructs sessions with the lag/cumulative-break idiom;
    //    break on diff >= gap matches session_window's half-open
    //    [start, last+gap) semantics.
    QueryDef(
      "q61_window_session",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |g AS (SELECT user_id, ts, value,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id, ts, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
        |SELECT user_id, min(ts) AS w_start,
        |  max(ts) + INTERVAL 10 MINUTE AS w_end,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM s GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin) {
      (s, dir) =>
        T(s, dir, "events")
          .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .select(col("user_id"),
            col("session_window.start").as("w_start"),
            col("session_window.end").as("w_end"),
            col("n"), col("total"))
          .orderBy("user_id", "w_start")
    },

    // ── sliding windows: 1-hour size, 30-minute slide (each event lands
    //    in 2 windows; both engines align slides to the epoch grid)
    QueryDef(
      "q62_window_sliding",
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |x AS (SELECT event_type,
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
        |    AS w_start FROM e)
        |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
        |  count(*) AS n
        |FROM x GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin) {
      (s, dir) =>
        T(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
            col("event_type"), col("n"))
          .orderBy("w_start", "event_type")
    }
  )
}
