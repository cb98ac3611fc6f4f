package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Storage-layout operators for the 100 TB lake (SURVEY.md §2C): the
  * transforms that decide how many bytes a scan reads before a single
  * query operator runs.
  *
  *  - int8 embedding quantization (q106): symmetric absmax codes shrink
  *    an embedding column 4× (float32 → int8 + one scale per vector) —
  *    at 100 TB the difference between an ANN sweep that fits page cache
  *    and one that doesn't. A pure narrow map over higher-order
  *    functions; nothing shuffles.
  *  - z-order clustering (q107): interleaving the bits of two correlated
  *    scan predicates (user, value band) gives a 1-D sort key whose
  *    ranges are 2-D-local, so per-file min/max stats prune BOTH columns
  *    — the standard lakehouse layout trick for multi-column pruning.
  *    The query reports per-z-bucket row counts and min/max spans: the
  *    exact numbers a writer would get as file-skipping stats after
  *    `ORDER BY z`. Computing z is a narrow map; the stats are one
  *    partial-agg'd shuffle on the bucket id.
  *  - winsorization (q108): per-group exact rank-based p01/p99 clipping
  *    — outlier conditioning before numeric features feed a model. The
  *    thresholds are actual data values picked by row_number (no
  *    interpolation — bit-identical across engines); at corpus scale the
  *    same contract would swap the per-group sort for approx_percentile
  *    or a sampled quickselect, trading exactness explicitly.
  */
object StorageLayout {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Bits per dimension for the q107 interleave (8+8 → 16-bit z). */
  private val B = 8

  /** Cumsum-chunked compaction plan: appends column `bin` assigning each
    * file (one row: partition key `partCol`, rewrite order `orderCol`,
    * size `sizeCol`) to a ~`target`-sized output bin — bin = the running
    * size before the file, integer-divided by `target`. Order-preserving
    * (keeps any existing clustering), one `partCol`-keyed window shuffle,
    * runs on the manifest rather than the data; a file larger than
    * `target` gets its own bin rather than splitting. `files` must not
    * already carry a `bin` or `__cum0` column (enforced — `bin` would
    * be silently clobbered otherwise). Backs q150_compaction_plan. */
  private[graft] def compactionPlan(files: DataFrame, partCol: String,
      orderCol: String, sizeCol: String, target: Long): DataFrame = {
    require(target > 0, "target bin size must be positive")
    require(!files.columns.contains("bin") && !files.columns.contains("__cum0"),
      "input must not carry a 'bin' or '__cum0' column")
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__cum0",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum0 div $target").cast("int"))
      .drop("__cum0")
  }

  val defs: Seq[QueryDef] = Seq(

    // ── symmetric int8 quantization: scale = absmax/127, code =
    //    floor(x·127/absmax + 0.5) — floor(+0.5) instead of round() so
    //    both engines take the identical IEEE path (no HALF_UP vs
    //    half-away divergence). absmax is an actual float of the vector
    //    (exact on both sides); code stats are integers.
    QueryDef(
      "q106_embed_quantize",
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS absmax FROM v),
        |c AS (SELECT vec_id, absmax,
        |  list_transform(v, x -> CAST(floor(x * 127 / absmax + 0.5) AS BIGINT))
        |    AS codes FROM a)
        |SELECT vec_id, absmax,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_code,
        |  CAST(list_min(codes) AS INTEGER) AS min_code,
        |  CAST(list_max(codes) AS INTEGER) AS max_code
        |FROM c ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // the code rule is the ONE shared VectorFunctions.int8Code
      // definition (also behind Similarity's cached codes frame and
      // both engines' oracles) — it must never fork per site
      T(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
        .withColumn("absmax",
          graft.functions.VectorFunctions.absMax(col("v")))
        .withColumn("codes",
          graft.functions.VectorFunctions.int8Code(col("v"), col("absmax")))
        .select(col("vec_id"), col("absmax"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("sum_code"),
          array_min(col("codes")).cast("int").as("min_code"),
          array_max(col("codes")).cast("int").as("max_code"))
        .orderBy("vec_id")
    },

    // ── z-order layout stats: z interleaves the low 8 bits of the user
    //    id and the value band (floor(value/2)); bucket = z >> 8 is the
    //    "file" a z-sorted writer would cut. n + min/max per bucket are
    //    the skip-stats both predicates would prune on.
    QueryDef(
      "q107_zorder_stats", {
        val zsql = (0 until B).map(k =>
          s"(((ux >> $k) & 1) * ${1L << (2 * k + 1)} + " +
            s"((vx >> $k) & 1) * ${1L << (2 * k)})").mkString(" + ")
        s"""WITH b AS (SELECT user_id & 255 AS ux,
           |  CAST(floor(value / 2) AS BIGINT) & 255 AS vx FROM events),
           |z AS (SELECT ux, vx, $zsql AS z FROM b)
           |SELECT CAST(z >> 8 AS INTEGER) AS zbucket,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(min(ux) AS INTEGER) AS u_min, CAST(max(ux) AS INTEGER) AS u_max,
           |  CAST(min(vx) AS INTEGER) AS v_min, CAST(max(vx) AS INTEGER) AS v_max
           |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
      }) { (s, dir) =>
      val ux = col("user_id").bitwiseAND(lit(255))
      val vx = floor(col("value") / 2).cast("long").bitwiseAND(lit(255))
      val base = T(s, dir, "events").select(ux.as("ux"), vx.as("vx"))
      val z = (0 until B).map { k =>
        shiftleft(shiftright(col("ux"), k).bitwiseAND(lit(1)), 2 * k + 1) +
          shiftleft(shiftright(col("vx"), k).bitwiseAND(lit(1)), 2 * k)
      }.reduce(_ + _)
      base.withColumn("z", z)
        .groupBy(shiftright(col("z"), 8).cast("int").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("ux").cast("int").as("u_min"), max("ux").cast("int").as("u_max"),
          min("vx").cast("int").as("v_min"), max("vx").cast("int").as("v_max"))
        .orderBy("zbucket")
    },

    // ── per-type winsorization: lo/hi are the ceil(0.01n)-th and
    //    ceil(0.99n)-th smallest values (real data points — exact on
    //    both engines), then every value clips into [lo, hi]. The
    //    clipped sum is a 2-decimal quantity rounded at 4dp (two digits
    //    finer than intrinsic precision, per the oracle discipline).
    QueryDef(
      "q108_winsorize",
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value)
        |          AS rn FROM events),
        |t AS (SELECT r.event_type,
        |        max(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
        |            THEN value END) AS lo,
        |        max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
        |            THEN value END) AS hi
        |      FROM r JOIN n USING (event_type) GROUP BY r.event_type)
        |SELECT e.event_type, t.lo, t.hi,
        |  CAST(sum(CASE WHEN e.value < t.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(sum(CASE WHEN e.value > t.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high,
        |  round(sum(CASE WHEN e.value < t.lo THEN t.lo
        |            WHEN e.value > t.hi THEN t.hi ELSE e.value END), 4)
        |    AS sum_winsorized
        |FROM events e JOIN t USING (event_type)
        |GROUP BY e.event_type, t.lo, t.hi
        |ORDER BY e.event_type""".stripMargin) { (s, dir) =>
      val ev = T(s, dir, "events").select("event_type", "value")
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val rn = row_number().over(
        Window.partitionBy("event_type").orderBy("value"))
      val ranked = ev.withColumn("rn", rn)
        .join(broadcast(n), Seq("event_type"))
      val thresholds = ranked
        .groupBy("event_type")
        .agg(
          max(when(col("rn") === ceil(lit(0.01) * col("n")).cast("long"),
            col("value"))).as("lo"),
          max(when(col("rn") === ceil(lit(0.99) * col("n")).cast("long"),
            col("value"))).as("hi"))
      ev.join(broadcast(thresholds), Seq("event_type"))
        .groupBy("event_type", "lo", "hi")
        .agg(
          sum(when(col("value") < col("lo"), 1).otherwise(0)).as("n_low"),
          sum(when(col("value") > col("hi"), 1).otherwise(0)).as("n_high"),
          round(sum(
            when(col("value") < col("lo"), col("lo"))
              .when(col("value") > col("hi"), col("hi"))
              .otherwise(col("value"))), 4).as("sum_winsorized"))
        .select(col("event_type"), col("lo"), col("hi"),
          col("n_low"), col("n_high"), col("sum_winsorized"))
        .orderBy("event_type")
    },

    // ── robust outlier detection: median + MAD (median absolute
    //    deviation), the breakdown-point-0.5 alternative to q113's
    //    mean/stddev z-score — a single corrupted batch can't drag the
    //    threshold. Two keyed median passes (value, then |value−med|),
    //    each a 5-group aggregate broadcast back; the outlier test
    //    compares raw doubles against 3·MAD — medians are selections
    //    (or the midpoint of two values), not sums, so both engines
    //    compute bit-equal thresholds and the flag is exactly
    //    reproducible. At 100 TB swap percentile for approx_percentile
    //    (same shape, documented tolerance) — exact grouped medians are
    //    the declared oracle-parity semantics here.
    QueryDef(
      "q141_mad_outliers",
      """WITH med AS (SELECT event_type, median(value) AS med FROM events
        |             GROUP BY event_type),
        |dev AS (SELECT e.event_type, abs(e.value - m.med) AS ad
        |        FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(ad) AS mad FROM dev
        |        GROUP BY event_type)
        |SELECT e.event_type, round(m.med, 4) AS med, round(d.mad, 4) AS mad,
        |  CAST(count(*) AS INTEGER) AS n,
        |  CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * d.mad
        |           THEN 1 ELSE 0 END) AS INTEGER) AS n_outliers
        |FROM events e JOIN med m USING (event_type)
        |  JOIN mad d USING (event_type)
        |GROUP BY e.event_type, m.med, d.mad
        |ORDER BY e.event_type""".stripMargin) { (s, dir) =>
      val ev = T(s, dir, "events").select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("ad"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(count(lit(1)).cast("int").as("n"),
          sum(when(col("ad") > lit(3) * col("mad"), 1).otherwise(0))
            .cast("int").as("n_outliers"))
        .select(col("event_type"), round(col("med"), 4).as("med"),
          round(col("mad"), 4).as("mad"), col("n"), col("n_outliers"))
        .orderBy("event_type")
    },

    // ── small-file compaction planner: the maintenance job every lake
    //    runs nightly — group each partition's files (here: docs per
    //    source, sized by n_chars) into target-sized output bins by
    //    cumulative-sum chunking: bin = floor(running-bytes-before /
    //    target). Pure integer `div` arithmetic, one source-keyed window
    //    shuffle, and the plan output is O(bins) — at 100 TB this runs
    //    on the FILE MANIFEST (count ≈ millions), never the data, and
    //    each bin maps 1:1 to one rewrite task reading only its own
    //    files. Cumsum-chunking (vs first-fit) keeps input order, so the
    //    rewrite preserves any clustering the data already has; a file
    //    larger than the target gets its own bin rather than splitting.
    QueryDef(
      "q150_compaction_plan",
      """WITH f AS (SELECT source, doc_id, n_chars,
        |  coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |  FROM documents)
        |SELECT source, CAST(cum0 // 2048 AS INTEGER) AS bin,
        |  CAST(count(*) AS INTEGER) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM f GROUP BY source, bin
        |ORDER BY source, bin""".stripMargin) { (s, dir) =>
      compactionPlan(
          T(s, dir, "documents")
            .select(col("source"), col("doc_id"), col("n_chars")),
          "source", "doc_id", "n_chars", 2048L)
        .groupBy("source", "bin")
        .agg(count(lit(1)).cast("int").as("n_files"),
          sum(col("n_chars")).as("bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    },

    // ── deterministic training-shard plan: the writer-side op that turns
    //    a curated corpus into the sharded, globally-shuffled layout a
    //    data loader streams. Each doc's md5 long h gives both its shard
    //    (h % 8) and its within-shard order (h, doc_id — a deterministic
    //    shuffle: no RNG, append-stable, and any engine reproduces it);
    //    global_pos = pos·8 + shard is the round-robin interleave — the
    //    exact read order of a loader cycling shards — so a step number
    //    maps back to (shard, offset) by div/mod alone (the provenance
    //    lookup a loss-spike post-mortem needs). ONE shard-keyed window
    //    shuffle; within-shard sort is exactly what the shard writer
    //    does anyway. 8 shards is fixture-scaled (a real run uses
    //    thousands — same plan, more window partitions).
    QueryDef(
      "q160_shard_plan",
      """WITH b AS (SELECT doc_id, n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, h, h % 8 AS shard FROM b),
        |r AS (SELECT doc_id, n_chars, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS pos
        |  FROM s)
        |SELECT doc_id, CAST(shard AS INTEGER) AS shard,
        |  CAST(pos AS BIGINT) AS pos,
        |  CAST(pos * 8 + shard AS BIGINT) AS global_pos,
        |  CAST(n_chars AS BIGINT) AS n_chars
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("h", graft.plans.HexWindowToLong.hexWindow(
          md5(encode(col("doc_id").cast("string"), "UTF-8")), 1))
        .withColumn("shard", (col("h") % 8).cast("int"))
      base
        .withColumn("pos",
          (row_number().over(Window.partitionBy("shard")
            .orderBy("h", "doc_id")) - 1).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"),
          (col("pos") * 8 + col("shard")).as("global_pos"),
          col("n_chars"))
        .orderBy("doc_id")
    },

    // ── exact equi-depth histogram: decile bins of o_totalprice by
    //    exact global rank — the file-layout / partition-boundary
    //    profile a range-bucketing writer needs (each bin ≈ N/10 rows;
    //    bin edges are actual data values). The global rank is NOT a
    //    global sort: prices in integer cents bucket by their bit
    //    length PLUS the 4 bits after the leading 1 (a float-style
    //    exponent+mantissa key — strictly monotone in the value, 16×
    //    finer than raw octaves so no single bucket holds an octave's
    //    whole mass), and the q155/q157 two-phase prefix sum with unit
    //    weights turns per-bucket counts + a few-hundred-row broadcast
    //    ladder into every row's exact rank; bin = rank·10 div N.
    //    The bucket key is Spark-internal — the oracle needs only the
    //    global (cents, key) order. Integer end to end (cents, ranks,
    //    counts) — no float, no ulp exposure, two scans at any scale.
    QueryDef(
      "q168_equidepth_hist",
      """WITH b AS (SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT cents,
        |        row_number() OVER (ORDER BY cents, o_orderkey) - 1 AS cum0,
        |        count(*) OVER () AS n
        |      FROM b)
        |SELECT CAST(cum0 * 10 // n AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(cents) AS BIGINT) AS lo_cents,
        |  CAST(max(cents) AS BIGINT) AS hi_cents
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      val base = T(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .withColumn("__bucket", expr(
          "CAST(length(bin(cents)) AS BIGINT) * 16" +
            " + shiftright(cents, greatest(length(bin(cents)) - 5, 0)) % 16"))
        .withColumn("__w", lit(1L))
      Curation.twoPhasePrefixSum(base,
          Seq(col("cents"), col("o_orderkey")), "__total", "__n")
        .select(expr("cum0 * 10 div __n").as("bin"), col("cents"))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"),
          min("cents").as("lo_cents"), max("cents").as("hi_cents"))
        .orderBy("bin")
    }
  )
}
