package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Coverage completions + the end-to-end curation capstone: range join,
  * GROUPING SETS (beyond rollup/cube), regex group extraction, and a
  * composed dedup → quality-filter → token-accounting pipeline — the
  * shape an actual training-data curation job takes, as one plan.
  */
object PipelineCapstone {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── range join: events binned into value bands. The bands side is
    //    tiny and broadcast, so the range condition evaluates map-side
    //    (BroadcastNestedLoopJoin) — the standard shape when one side of
    //    a range join is a dimension.
    QueryDef(
      "q74_range_join",
      """WITH bands(band, lo, hi) AS (
        |  SELECT band, band*20.0, (band+1)*20.0
        |  FROM (SELECT unnest(range(0, 5)) AS band)
        |)
        |SELECT band, count(*) AS n, round(sum(value), 2) AS total
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      val bands = s.range(0, 5).select(
        col("id").as("band"),
        (col("id") * 20.0).as("lo"),
        ((col("id") + 1) * 20.0).as("hi"))
      T(s, dir, "events")
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("band")
    },

    // ── GROUPING SETS (arbitrary set list — rollup/cube cover only the
    //    hierarchical/full lattices). SQL text shared with the oracle.
    QueryDef(
      "q75_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // ── regex group extraction
    QueryDef(
      "q76_regex_groups",
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS word1,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS word2,
        |  regexp_extract(source, '[0-9]+', 0) AS src_num
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 1).as("word1"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("word2"),
          regexp_extract(col("source"), "[0-9]+", 0).as("src_num"))
        .orderBy("doc_id")
    },

    // ── curation pipeline capstone: exact-dedup → quality filter →
    //    per-language token accounting, one composed plan (what a real
    //    training-data job submits; every stage is a narrow map or a
    //    single keyed shuffle)
    QueryDef(
      "q78_curation_pipeline",
      """WITH dedup AS (
        |  SELECT doc_id, lang, text FROM (
        |    SELECT doc_id, lang, text,
        |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1
        |),
        |quality AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words,
        |    length(text) AS n_chars
        |  FROM dedup
        |  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
        |    AND len(list_distinct(string_split(text, ' '))) * 2
        |        >= len(string_split(text, ' '))
        |)
        |SELECT lang,
        |  count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CAST(sum(CAST(ceil(n_chars / 4.0) AS INTEGER)) AS BIGINT)
        |    AS est_llm_tokens
        |FROM quality GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val ws = split(col("text"), " ")
      // quality stats are pure functions of text, so compute them in the
      // narrow map BEFORE the dedup agg; keep-first is then a map-side
      // min(struct(doc_id, ...)) on the content hash — the reduce buffer
      // holds one small survivor tuple per hash, never the text, and no
      // duplicate row crosses the wire unreduced (a window rank shuffles
      // and sorts them all)
      T(s, dir, "documents")
        .select(md5(encode(col("text"), "UTF-8")).as("h"),
          struct(col("doc_id"), col("lang"), size(ws).as("n_words"),
            size(array_distinct(ws)).as("n_distinct"),
            length(col("text")).as("n_chars")).as("r"))
        .groupBy("h").agg(min(col("r")).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.lang").as("lang"),
          col("m.n_words").as("n_words"),
          col("m.n_distinct").as("n_distinct"),
          col("m.n_chars").as("n_chars"))
        .filter(col("n_words").between(20, 1000)
          && col("n_distinct") * 2 >= col("n_words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words").cast("long")).as("total_words"),
          sum(ceil(col("n_chars") / 4.0).cast("int").cast("long"))
            .as("est_llm_tokens"))
        .orderBy("lang")
    },

    // ── explode_outer: rows with empty arrays survive with NULLs
    //    (DuckDB emulates outer-unnest by substituting [NULL] for
    //    empty lists)
    QueryDef(
      "q79_explode_outer",
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), w -> w = 'spark') AS hits
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END) AS hit
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w === "spark").as("hits"))
        .select(col("doc_id"), explode_outer(col("hits")).as("hit"))
        .orderBy("doc_id")
    },

    // ── custom TypedImperativeAggregate: exact top-3 order keys per
    //    priority as ONE aggregate (O(k) state, sketch-style contract) —
    //    oracle reconstructs via window + string_agg
    QueryDef(
      "q80_topk_aggregate",
      """SELECT o_orderpriority, string_agg(o_orderkey, ',' ORDER BY o_orderkey DESC)
        |    AS top_keys
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_orderkey DESC) AS rn
        |      FROM orders) WHERE rn <= 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(graft.plans.TopKLongs.topk(col("o_orderkey"), 3).as("top_keys"))
          .orderBy("o_orderpriority")
    },

    // ── schema-based JSON parsing (from_json with an explicit schema —
    //    the production path when payload shape is known; q26 covers the
    //    schemaless get_json_object path)
    QueryDef(
      "q82_json_schema",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  (json_extract_string(props, '$.k') IS NOT NULL) AS parsed_ok
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      T(s, dir, "events")
        // parse once, read the struct twice (CollapseProject keeps the
        // non-cheap JsonToStructs un-duplicated; previously both output
        // columns carried their own from_json call)
        .select(col("event_id"),
          from_json(col("props"), "k INT", Map.empty[String, String]).as("j"))
        .select(col("event_id"),
          col("j").getField("k").as("k"),
          col("j").getField("k").isNotNull.as("parsed_ok"))
        .orderBy("event_id")
    },

    // ── funnel analytics: signup → first subsequent purchase per user,
    //    conversion flag + seconds-to-convert (epoch floors on both
    //    sides: DuckDB date_diff counts boundary crossings, not elapsed
    //    intervals, so it is NOT used)
    QueryDef(
      "q83_funnel",
      """WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS signup_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS first_purchase_ts
        |      FROM events e JOIN s ON e.user_id = s.user_id
        |      WHERE e.event_type = 'purchase'
        |        AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts
        |      GROUP BY e.user_id)
        |SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
        |  (p.user_id IS NOT NULL) AS converted,
        |  CAST(floor(epoch(p.first_purchase_ts)) AS BIGINT)
        |    - CAST(floor(epoch(s.signup_ts)) AS BIGINT) AS secs_to_convert
        |FROM s LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin) { (s, dir) =>
      val ev = T(s, dir, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts") >= col("signup_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("first_purchase_ts"))
        .withColumnRenamed("user_id", "p_user_id")
      su.join(pu, col("user_id") === col("p_user_id"), "left")
        .select(col("user_id"), col("signup_ts"), col("first_purchase_ts"),
          col("p_user_id").isNotNull.as("converted"),
          (unix_timestamp(col("first_purchase_ts").cast("timestamp"))
            - unix_timestamp(col("signup_ts").cast("timestamp")))
            .as("secs_to_convert"))
        .orderBy("user_id")
    },

    // ── bag-semantics set op: INTERSECT ALL preserves multiplicity
    //    (min of the two sides per value; q20 covers the distinct form)
    QueryDef(
      "q84_intersect_all",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(
          T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // ── deterministic hash sampling: the scale-safe replacement for
    //    rand()-based TABLESAMPLE in data pipelines — md5(key) bucketing
    //    is a pure narrow map (no RNG state, no shuffle), reproducible
    //    across engines, reruns, and backfills, and composable (the same
    //    predicate always selects the same ~10% of any table)
    QueryDef(
      "q87_hash_sample",
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bucket = graft.plans.HexWindowToLong.md5Bucket(col("doc_id"), 10)
      T(s, dir, "documents")
        .filter(bucket === 0)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // ── deterministic train/val/test split (80/10/10 by md5 bucket) +
    //    per-split token accounting — the dataset-manifest query every
    //    training pipeline runs; the split is a function of the key
    //    alone, so adding data never reassigns existing docs
    QueryDef(
      "q88_dataset_split",
      """WITH h AS (SELECT doc_id, lang, text,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |  FROM documents),
        |s AS (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |             ELSE 'test' END AS split, lang,
        |        len(string_split(text, ' ')) AS nw FROM h)
        |SELECT split, lang, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS total_words
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin) {
      (s, dir) =>
        val bucket = graft.plans.HexWindowToLong.md5Bucket(col("doc_id"), 100)
        T(s, dir, "documents")
          .select(
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"),
            col("lang"),
            size(split(col("text"), " ")).cast("long").as("nw"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("nw").as("total_words"))
          .orderBy("split", "lang")
    },

    // ── stratified quota sampling: a deterministic per-source quota
    //    (top-5 by md5 of the key) — the data-mixing primitive that
    //    caps any one domain's contribution. Hash order makes the
    //    sample a pure function of the key (reruns and appends never
    //    swap picks); one shuffle keyed by source, and the per-group
    //    rank-5 filter compiles to WindowGroupLimit, so each partition
    //    keeps 5 rows, not the group.
    QueryDef(
      "q95_stratified_sample",
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 5 ORDER BY source, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source")
        .orderBy(md5(encode(col("doc_id").cast("string"), "UTF-8")),
          col("doc_id"))
      T(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("source", "rn")
    },

    // ── sequence packing (concat-and-chunk): assign every doc the
    //    training sequence its first token lands in, packing 2048-token
    //    sequences per shard. Sharding by the same md5 bucket as q87/q88
    //    keeps the running sum a PER-SHARD window (never one global
    //    partition — the scale killer of naive packing); within a shard
    //    order is doc_id, so the layout is deterministic and append-only
    //    reruns reproduce it.
    QueryDef(
      "q91_pack_sequences",
      """WITH t AS (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
        |    len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(n_tok AS INTEGER) AS n_tok,
        |  (cum - n_tok) // 2048 AS seq_id,
        |  (cum - n_tok) % 2048 AS seq_off
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val shard = graft.plans.HexWindowToLong.md5Bucket(col("doc_id"), 8)
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "documents")
        .select(col("doc_id"), shard.as("shard"),
          size(split(col("text"), " ")).as("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
        .withColumn("start", col("cum") - col("n_tok"))
        .select(col("doc_id"), col("shard"), col("n_tok"),
          expr("start div 2048").as("seq_id"),
          expr("start % 2048").as("seq_off"))
        .orderBy("doc_id")
    },

    // ── LATERAL correlated subquery (per-row dependent subquery), one
    //    SQL text for both engines
    QueryDef(
      "q85_lateral",
      """SELECT c_custkey, c_name, round(o.total, 2) AS total_spent,
        |  o.n AS n_orders
        |FROM customer,
        |LATERAL (SELECT coalesce(sum(o_totalprice), 0) AS total,
        |                count(*) AS n FROM orders
        |         WHERE o_custkey = c_custkey) o
        |WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_name, round(o.total, 2) AS total_spent,
          |  o.n AS n_orders
          |FROM customer,
          |LATERAL (SELECT coalesce(sum(o_totalprice), 0) AS total,
          |                count(*) AS n FROM orders
          |         WHERE o_custkey = c_custkey) o
          |WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin)
    }
  )
}
