package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Extended relational surface (SURVEY.md §2B "Ext" rows): join variants
  * beyond inner/cross, set operations, window functions, grouping sets,
  * JSON / date / string / math scalar functions, exact percentiles, and
  * multi-join analytic queries.
  *
  * Scale notes (100 TB posture):
  *  - semi/anti joins broadcast the filtering side when it is a dimension
  *    — at cluster scale that turns an existence check over the fact
  *    table into a map-side bloom-style probe with zero shuffle of the
  *    big side;
  *  - window functions shuffle once on the partition key and sort within
  *    partitions — the partition key (user_id, o_orderpriority) is what
  *    bounds per-task state, so frames never materialize a whole table;
  *  - rollup/cube expand grouping sets BEFORE the partial aggregate, so
  *    map-side combine still applies to every grouping set;
  *  - the multi-join analytics keep dimension sides broadcast and let
  *    AQE pick shuffle-hash vs sort-merge for fact-fact joins.
  */
object ExtendedRelational {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── left semi join: customers that placed a big order
    QueryDef(
      "q15_semijoin",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer").select("c_custkey", "c_name")
      val o = T(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "leftsemi")
        .orderBy("c_custkey")
    },

    // ── left anti join: parts that never appear in any lineitem
    QueryDef(
      "q16_antijoin",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val p = T(s, dir, "part").select("p_partkey", "p_name")
      val l = T(s, dir, "lineitem").select("l_partkey")
      p.join(l, p("p_partkey") === l("l_partkey"), "leftanti")
        .orderBy("p_partkey")
    },

    // ── left outer join + aggregate: order count per customer incl. zeros
    QueryDef(
      "q17_left_outer",
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice),0),2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer").select("c_custkey", "c_name")
      val o = T(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    // ── full outer join (mismatched key ranges → NULLs on both sides)
    QueryDef(
      "q18_full_outer",
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier FULL JOIN nation ON s_suppkey = n_nationkey
        |ORDER BY coalesce(s_suppkey, n_nationkey)""".stripMargin) { (s, dir) =>
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_name")
      val nat = T(s, dir, "nation").select("n_nationkey", "n_name")
      sup.join(nat, sup("s_suppkey") === nat("n_nationkey"), "full")
        .orderBy(coalesce(col("s_suppkey"), col("n_nationkey")))
    },

    // ── UNION (distinct): nation keys present among customers or suppliers
    QueryDef(
      "q19_union",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .union(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy("nationkey")
    },

    // ── INTERSECT: large parts that were actually ordered
    QueryDef(
      "q20_intersect",
      """SELECT p_partkey AS partkey FROM part WHERE p_size > 40
        |INTERSECT SELECT l_partkey FROM lineitem ORDER BY partkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "part").filter(col("p_size") > 40)
          .select(col("p_partkey").as("partkey"))
          .intersect(T(s, dir, "lineitem").select(col("l_partkey").as("partkey")))
          .orderBy("partkey")
    },

    // ── EXCEPT: part keys never ordered (set-op complement of q16)
    QueryDef(
      "q21_except",
      """SELECT p_partkey AS partkey FROM part
        |EXCEPT SELECT l_partkey FROM lineitem ORDER BY partkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "part").select(col("p_partkey").as("partkey"))
          .except(T(s, dir, "lineitem").select(col("l_partkey").as("partkey")))
          .orderBy("partkey")
    },

    // ── ranking window functions: top-5 orders per priority class
    QueryDef(
      "q22_window_rank",
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(rank()       OVER w AS INTEGER) AS rnk,
        |    CAST(dense_rank() OVER w AS INTEGER) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 5)
        .orderBy("o_orderpriority", "rn")
    },

    // ── lag + running/sliding frames per user over the event stream
    QueryDef(
      "q23_window_frames",
      """SELECT event_id, user_id, round(value,2) AS value,
        |  round(lag(value) OVER w, 2) AS prev_value,
        |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
        |  round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS sliding_avg
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sliding = w.rowsBetween(-2, Window.currentRow)
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"),
          round(lag("value", 1).over(w), 2).as("prev_value"),
          round(sum("value").over(running), 2).as("running_sum"),
          // round(.,3) not 2: `value` is a 2-decimal quantity, so a 2- or
          // 3-row frame average can land exactly on a .xx5 half-boundary,
          // where Spark (BigDecimal HALF_UP) and DuckDB (raw-double
          // rounding) disagree; at 3 decimals no frame average can sit on
          // a boundary.
          round(avg("value").over(sliding), 3).as("sliding_avg"))
        .orderBy("user_id", "event_id")
    },

    // ── ROLLUP grouping sets (status, priority) → (status) → ()
    QueryDef(
      "q24_rollup",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin) {
      (s, dir) =>
        T(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
    },

    // ── CUBE grouping sets over lineitem flags
    QueryDef(
      "q25_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) {
      (s, dir) =>
        T(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    // ── JSON extraction from the events.props payload column
    QueryDef(
      "q26_json_extract",
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)
        .orderBy("event_id")
    },

    // ── date/time functions: truncation + field extraction + monthly agg
    QueryDef(
      "q27_date_trunc",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mth,
        |  count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2, 3 ORDER BY month""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        .groupBy(
          date_trunc("month", col("o_orderdate")).as("month"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mth"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("month")
    },

    // ── string functions over documents
    QueryDef(
      "q28_string_fns",
      """SELECT doc_id, upper(lang) AS lang_u, CAST(length(text) AS INTEGER) AS len,
        |  substr(text, 1, 10) AS prefix,
        |  replace(source, 'src', 'origin-') AS origin,
        |  (text LIKE '%spark%') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          upper(col("lang")).as("lang_u"),
          length(col("text")).as("len"),
          substring(col("text"), 1, 10).as("prefix"),
          regexp_replace(col("source"), "src", "origin-").as("origin"),
          col("text").like("%spark%").as("has_spark"))
        .orderBy("doc_id")
    },

    // ── math scalar functions
    QueryDef(
      "q29_math_fns",
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice),4) AS root_price,
        |  round(abs(l_discount - 0.05),4) AS disc_dev,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 4).as("root_price"),
            round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
            floor(col("l_quantity")).as("qty_floor"),
            ceil(col("l_tax") * 100).cast("long").as("tax_pct"),
            (col("l_orderkey") % 7).as("key_mod"))
          .orderBy("l_orderkey")
    },

    // ── exact percentiles (interpolated), matching DuckDB quantile_cont
    QueryDef(
      "q30_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5),3) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9),3) AS p90_price,
        |  round(quantile_cont(l_quantity, 0.25),3) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            // round(.,3): interpolated quantiles of 2-decimal prices have
            // at most 3 decimals, so 3-decimal rounding never sits on a
            // half-boundary (2-decimal rounding does — caught at sf0.001).
            round(expr("percentile(l_extendedprice, 0.5)"), 3).as("median_price"),
            round(expr("percentile(l_extendedprice, 0.9)"), 3).as("p90_price"),
            round(expr("percentile(l_quantity, 0.25)"), 3).as("q1_qty"))
          .orderBy("l_returnflag")
    },

    // ── approximate aggregates (HLL + t-digest): sketch estimates are
    //    implementation-defined, so the oracle can't compare them value
    //    for value. Instead both engines emit the EXACT value plus a
    //    tolerance verdict (relative error of their OWN approximation
    //    < 5%) — the hash then verifies the exact values bit-for-bit and
    //    that each engine's sketch meets the documented error bound.
    //    rsd=0.01 makes the 5% cut a 5-sigma bound on Spark's HLL++;
    //    percentile_approx at accuracy 10000 is well inside 5% at any SF.
    //    At 100 TB these replace exact count-distinct/percentile whenever
    //    small error is acceptable: constant memory, one pass, no shuffle
    //    of distinct values.
    QueryDef(
      "q31_approx_agg",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |     * 1.0 / count(DISTINCT l_partkey) < 0.05) AS parts_ok,
        |  round(quantile_cont(l_extendedprice, 0.5), 3) AS exact_median,
        |  (abs(approx_quantile(l_extendedprice, 0.5)
        |       - quantile_cont(l_extendedprice, 0.5))
        |     / quantile_cont(l_extendedprice, 0.5) < 0.05) AS median_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val exactMedian = expr("percentile(l_extendedprice, 0.5)")
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            (abs(approx_count_distinct(col("l_partkey"), 0.01)
                - countDistinct(col("l_partkey")))
              / countDistinct(col("l_partkey")) < 0.05).as("parts_ok"),
            // round(.,3): interpolated medians of 2-decimal prices have at
            // most 3 decimals — never on a rounding half-boundary
            round(exactMedian, 3).as("exact_median"),
            (abs(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
                - exactMedian) / exactMedian < 0.05).as("median_ok"))
          .orderBy("l_returnflag")
    },

    // ── Apache DataSketches HLL: mergeable sketch objects (the 100 TB
    //    path for distinct-counting across partitions/days: sketches
    //    union associatively, estimates come out at read time). The
    //    binary sketch has no DuckDB twin, so — like q31 — the oracle
    //    hashes the exact count plus each engine's own tolerance verdict:
    //    Spark checks its DataSketches estimate, DuckDB its native
    //    approx_count_distinct, both against the same exact value at the
    //    same 5% bound (lgConfigK=14 → ~0.6% standard error, so 5% ≈ 8σ).
    QueryDef(
      "q81_hll_sketch",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_parts,
        |  (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |     * 1.0 / count(DISTINCT l_partkey) < 0.05) AS sketch_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        T(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), 14))
              .as("hll_est"),
            countDistinct(col("l_partkey")).as("exact_distinct_parts"))
          .select(col("l_returnflag"), col("exact_distinct_parts"),
            (abs(col("hll_est") - col("exact_distinct_parts"))
              / col("exact_distinct_parts") < 0.05).as("sketch_ok"))
          .orderBy("l_returnflag")
    },

    // ── CASE WHEN bucketing + conditional aggregation
    QueryDef(
      "q32_case_when",
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .select(
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          col("o_orderstatus"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"))
        .orderBy("bucket")
    },

    // ── IN-list predicate
    QueryDef(
      "q33_in_list",
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#11','Brand#22','Brand#33') AND p_size >= 20
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      T(s, dir, "part")
        .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
          && col("p_size") >= 20)
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    },

    // ── scalar subquery: orders above the global average price.
    //    DataFrame form: 1-row aggregate broadcast-cross-joined against the
    //    fact table — the Spark idiom for an uncorrelated scalar subquery
    //    (no driver round-trip, works at any scale).
    QueryDef(
      "q34_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = T(s, dir, "orders")
      val avgDf = o.agg(avg("o_totalprice").as("avg_price"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("avg_price"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ── multi-join analytics (TPC-H Q3 shape): unshipped revenue top-10.
    //    customer is broadcast; orders⋈lineitem is the only shuffle pair.
    QueryDef(
      "q35_multijoin_topk",
      """SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = T(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = T(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ── 6-table snowflake join (TPC-H Q5 shape): revenue by nation.
    //    All dimensions broadcast; the lineitem⋈orders fact join is the
    //    only shuffle — at 1000 executors this is one co-partitioned
    //    exchange, not five.
    QueryDef(
      "q36_snowflake_join",
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_regionkey <= 2
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = T(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = T(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val reg = T(s, dir, "region").filter(col("r_regionkey") <= 2)
        .select("r_regionkey")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey")
            && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ── PIVOT: long → wide with an EXPLICIT value list. Passing the
    //    values to pivot() matters at scale: without them Spark runs an
    //    extra distinct-collect job over the whole input just to discover
    //    the column set; with them the plan is a single pass — one
    //    hash aggregate keyed by the row dimension, each pivot cell a
    //    conditional partial aggregate (exactly the oracle's CASE form).
    //    Counts are integers, so cells are order-independent; absent
    //    (status, month) cells surface as NULL from pivot and are
    //    coalesced to 0 to match COUNT's no-rows semantics.
    QueryDef(
      "q127_pivot_month_counts",
      """SELECT o_orderstatus,
        |  count(CASE WHEN month(o_orderdate) = 1 THEN 1 END) AS m01,
        |  count(CASE WHEN month(o_orderdate) = 2 THEN 1 END) AS m02,
        |  count(CASE WHEN month(o_orderdate) = 3 THEN 1 END) AS m03,
        |  count(CASE WHEN month(o_orderdate) = 4 THEN 1 END) AS m04,
        |  count(CASE WHEN month(o_orderdate) = 5 THEN 1 END) AS m05,
        |  count(CASE WHEN month(o_orderdate) = 6 THEN 1 END) AS m06,
        |  count(CASE WHEN month(o_orderdate) = 7 THEN 1 END) AS m07,
        |  count(CASE WHEN month(o_orderdate) = 8 THEN 1 END) AS m08,
        |  count(CASE WHEN month(o_orderdate) = 9 THEN 1 END) AS m09,
        |  count(CASE WHEN month(o_orderdate) = 10 THEN 1 END) AS m10,
        |  count(CASE WHEN month(o_orderdate) = 11 THEN 1 END) AS m11,
        |  count(CASE WHEN month(o_orderdate) = 12 THEN 1 END) AS m12
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val wide = T(s, dir, "orders")
        .select(col("o_orderstatus"), month(col("o_orderdate")).as("m"))
        .groupBy("o_orderstatus")
        .pivot("m", (1 to 12).map(Integer.valueOf))
        .agg(count(lit(1)))
      wide.select(col("o_orderstatus") +:
          (1 to 12).map(i =>
            coalesce(col(s"$i"), lit(0L)).as(f"m$i%02d")): _*)
        .orderBy("o_orderstatus")
    },

    // ── UNPIVOT (melt): wide → long via the native unpivot operator —
    //    a narrow per-row expand (each input row emits one row per value
    //    column), no shuffle beyond the upstream aggregate. Every
    //    (id, column) pair emits a row even when the measure is 0, which
    //    a groupBy re-derivation would drop — the oracle therefore builds
    //    the same wide frame and UNION ALLs one SELECT per column.
    QueryDef(
      "q128_unpivot_priority_counts",
      """WITH w AS (SELECT o_orderstatus,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, 'urgent' AS priority, urgent AS n FROM w
        |UNION ALL SELECT o_orderstatus, 'medium', medium FROM w
        |UNION ALL SELECT o_orderstatus, 'low', low FROM w
        |ORDER BY o_orderstatus, priority""".stripMargin) { (s, dir) =>
      val wide = T(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
          count(when(col("o_orderpriority") === "3-MEDIUM", 1)).as("medium"),
          count(when(col("o_orderpriority") === "5-LOW", 1)).as("low"))
      wide.unpivot(
          Array(col("o_orderstatus")),
          Array(col("urgent"), col("medium"), col("low")),
          "priority", "n")
        .orderBy("o_orderstatus", "priority")
    },

    // ── salted SKEW JOIN (q70 is the salted aggregate; this is the join
    //    half of the skew toolkit). A hot key floods one reducer in a
    //    plain shuffle join; salting splits each probe-side key into 8
    //    deterministic sub-keys (event_id % 8 — content-derived, no RNG)
    //    and replicates each build-side row once per salt, so the hot
    //    key's rows spread over 8 reducers. The salt is carried only in
    //    the join key: the joined row set — and therefore the aggregate
    //    and the oracle, which joins unsalted — is exactly the plain
    //    join's. This is the manual form of what AQE skew-join does to
    //    sort-merge partitions; salting also covers broadcast-ineligible
    //    build sides and hash joins, which AQE's splitter does not.
    QueryDef(
      "q131_salted_join",
      """SELECT c_mktsegment, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin) { (s, dir) =>
      val nSalts = 8
      val ev = T(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          (col("event_id") % nSalts).cast("int").as("_salt"))
      val dim = T(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        .withColumn("_salt",
          explode(array((0 until nSalts).map(lit): _*)))
      ev.join(dim, Seq("user_id", "_salt"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"))
        .orderBy("c_mktsegment", "event_type")
    }
  )
}
