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
    },

    // ── rank-decile binning (quantile feature bucketization): each event
    //    lands in bin floor((rank−1)·10/n) within its type — pure integer
    //    rank math, so bins are exactly equi-depth and engine-exact (no
    //    percentile interpolation to disagree on). One shuffle keyed by
    //    event_type; the output is the 10-row-per-type bin profile a
    //    trainer uses to bucketize the feature at serve time.
    QueryDef(
      "q123_quantile_bins",
      """WITH e AS (SELECT event_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id)
        |    AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |b AS (SELECT event_type,
        |  CAST(floor((rn - 1) * 10 * 1.0 / n) AS INTEGER) AS bin, cents
        |  FROM r)
        |SELECT event_type, bin, CAST(count(*) AS INTEGER) AS n_rows,
        |  CAST(min(cents) AS BIGINT) AS lo_cents,
        |  CAST(max(cents) AS BIGINT) AS hi_cents
        |FROM b GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val wn = Window.partitionBy("event_type")
      T(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("bigint").as("cents"))
        .select(col("event_type"), col("cents"),
          row_number().over(w).as("rn"), count(lit(1)).over(wn).as("n"))
        .select(col("event_type"),
          floor((col("rn") - 1) * 10 * lit(1.0) / col("n")).cast("int")
            .as("bin"),
          col("cents"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).cast("int").as("n_rows"),
          min("cents").as("lo_cents"), max("cents").as("hi_cents"))
        .orderBy("event_type", "bin")
    },

    // ── class-balance weights: inverse-frequency sample weights in basis
    //    points (total/(k·cnt), the standard balanced-class weighting) —
    //    one tiny agg + a broadcast totals row; integer output so the
    //    oracle is exact.
    QueryDef(
      "q124_class_weights",
      """WITH c AS (SELECT label, count(*) AS cnt FROM embeddings
        |           GROUP BY label),
        |t AS (SELECT sum(cnt) AS total, count(*) AS k FROM c)
        |SELECT label, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(floor(total * 10000.0 / (k * cnt)) AS BIGINT) AS weight_bp
        |FROM c, t ORDER BY label""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "embeddings").groupBy("label")
        .agg(count(lit(1)).as("cnt"))
      val t = c.agg(sum("cnt").as("total"), count(lit(1)).as("k"))
      c.crossJoin(broadcast(t))
        .select(col("label"), col("cnt"),
          floor(col("total") * 10000.0 / (col("k") * col("cnt")))
            .as("weight_bp"))
        .orderBy("label")
    },

    // ── hashed feature crosses (the hashing trick): event_type × hour-of-
    //    day crossed into 256 md5 buckets — the portable hash both engines
    //    compute bit-identically. Narrow map + one partial-agg'd groupBy;
    //    top-20 bucket load shows the collision profile a trainer needs
    //    before sizing the hash space.
    QueryDef(
      "q125_hashed_cross",
      """WITH x AS (SELECT
        |  event_type || '|' || CAST(hour(ts) AS VARCHAR) AS crossed FROM events),
        |h AS (SELECT crossed,
        |  ('0x' || substr(md5(crossed), 1, 15))::BIGINT % 256 AS bucket FROM x)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT crossed) AS INTEGER) AS n_keys
        |FROM h GROUP BY bucket ORDER BY n DESC, bucket LIMIT 20""".stripMargin) {
      (s, dir) =>
        T(s, dir, "events")
          .select(concat_ws("|", col("event_type"),
            hour(col("ts")).cast("string")).as("crossed"))
          .select(col("crossed"),
            graft.plans.HexWindowToLong.md5Bucket(col("crossed"), 256)
              .as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("crossed")).cast("int").as("n_keys"))
          .orderBy(col("n").desc, col("bucket"))
          .limit(20)
    },

    // ── per-key OLS trend: closed-form regression of value (integer
    //    cents) on time (hour index from the group's own start), one
    //    partial-agg'd pass collecting the five sufficient statistics
    //    (n, Σx, Σy, Σxy, Σx²). Everything up to the final division is
    //    EXACT 64-bit integer arithmetic — no float reduction-order
    //    drift anywhere in the sums, so the slope/intercept are a pure
    //    function of the data on any engine and at any partitioning.
    //    The drift/trend monitor a feature pipeline runs per key at
    //    100 TB: reduce state is 5 longs per key; magnitudes stay in
    //    range because x is centered at the per-key minimum hour
    //    (n·Σxy ≲ 7·10¹⁵ here — checked against long overflow).
    QueryDef(
      "q143_trend_per_key",
      """WITH b AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type, min(h) AS h0 FROM b GROUP BY event_type),
        |p AS (SELECT b.event_type, b.h - m.h0 AS x, b.cents AS y
        |      FROM b JOIN m USING (event_type)),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x*y) AS BIGINT) AS sxy,
        |        CAST(sum(x*x) AS BIGINT) AS sxx
        |      FROM p GROUP BY event_type)
        |SELECT event_type, CAST(n AS INTEGER) AS n,
        |  round((n*sxy - sx*sy) * 1.0 / (n*sxx - sx*sx), 6)
        |    AS slope_cents_per_hr,
        |  round((sy - (n*sxy - sx*sy) * 1.0 / (n*sxx - sx*sx) * sx) / n, 4)
        |    AS intercept_cents
        |FROM s WHERE n*sxx - sx*sx <> 0 ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      val b = T(s, dir, "events").select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("h"),
        round(col("value") * 100).cast("long").as("cents"))
      val m = b.groupBy("event_type").agg(min("h").as("h0"))
      val stats = b.join(broadcast(m), "event_type")
        .select(col("event_type"), (col("h") - col("h0")).as("x"),
          col("cents").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      // a key with no time variance (every event in one hour, or n = 1)
      // has denominator 0 and no defined trend — excluded on BOTH sides
      // rather than emitting an engine-dependent NaN/NULL
      stats.filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
        .select(col("event_type"), col("n").cast("int").as("n"),
          round(slope, 6).as("slope_cents_per_hr"),
          round((col("sy") - slope * col("sx")) / col("n"), 4)
            .as("intercept_cents"))
        .orderBy("event_type")
    },

    // ── padding-waste audit: the batching-efficiency report that decides
    //    a trainer's bucketing config. Docs are length-bucketed to the
    //    next multiple of 16 tokens, capped at an 80-token context —
    //    fixture-scaled constants (the corpus runs 10–99 tokens; a real
    //    trainer uses 64-multiples up to 512+, same plan either way) —
    //    the way a bucketed batcher pads; per bucket the audit reports
    //    how many padding tokens that costs and the waste in basis
    //    points — all integer `div` arithmetic, ONE narrow map + one
    //    tiny aggregate over ≤5 buckets, so it runs at any corpus size
    //    for the price of a token-count scan. Docs past the cap truncate
    //    (trunc_tokens counts the loss), matching q91's packing contract.
    QueryDef(
      "q151_padding_waste",
      """WITH t AS (SELECT
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |b AS (SELECT toks,
        |  least(((toks + 15) // 16) * 16, 80) AS bucket,
        |  least(toks, 80) AS kept FROM t)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS INTEGER) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS kept_tokens,
        |  CAST(sum(bucket - kept) AS BIGINT) AS pad_tokens,
        |  CAST(sum(CASE WHEN toks > 80 THEN toks - 80 ELSE 0 END) AS BIGINT)
        |    AS trunc_tokens,
        |  CAST(sum(bucket - kept) * 10000 // sum(bucket) AS INTEGER)
        |    AS waste_bp
        |FROM b GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      val b = T(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("toks"))
        .select(col("toks"),
          least(expr("((toks + 15) div 16) * 16"), lit(80L)).as("bucket"),
          least(col("toks"), lit(80L)).as("kept"))
      b.groupBy(col("bucket"))
        .agg(count(lit(1)).cast("int").as("n_docs"),
          sum(col("kept")).as("kept_tokens"),
          sum(col("bucket") - col("kept")).as("pad_tokens"),
          sum(when(col("toks") > 80, col("toks") - 80).otherwise(0L))
            .as("trunc_tokens"),
          expr("sum(bucket - kept) * 10000 div sum(bucket)").cast("int")
            .as("waste_bp"))
        .select(col("bucket").cast("int").as("bucket"), col("n_docs"),
          col("kept_tokens"), col("pad_tokens"), col("trunc_tokens"),
          col("waste_bp"))
        .orderBy("bucket")
    }
  )
}
