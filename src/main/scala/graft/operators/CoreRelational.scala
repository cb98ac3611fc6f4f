package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** The reference engine's full query surface (SURVEY.md §2A rows 1–13),
  * re-expressed as declarative DataFrame plans so Catalyst supplies what
  * the reference lacked: predicate pushdown into parquet, column pruning,
  * broadcast-vs-shuffle join selection, two-phase (partial+final)
  * aggregation, and whole-stage codegen.
  *
  * Scale notes (100 TB posture):
  *  - every filter/projection here reaches the parquet scan (verified via
  *    `.explain("formatted")` → PushedFilters / ReadSchema);
  *  - dimension joins (`customer ⋈ orders`) broadcast the small side
  *    explicitly — at 1000-executor scale that is the difference between
  *    a map-side join and a full shuffle of the fact table;
  *  - the only cross joins are over bounded dimension tables
  *    (region × nation = 125 rows at any scale factor);
  *  - global sorts use range partitioning (Spark's `orderBy`), which
  *    samples keys and scales linearly with executor count.
  */
object CoreRelational {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── scan + filter + group + agg + sort in one plan (flagship; TPC-H Q1 shape)
    QueryDef(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ── projection incl. computed columns
    QueryDef(
      "q02_project_arith",
      """SELECT p_partkey, p_name,
        |  round(p_retailprice*0.9,2) AS discounted,
        |  p_size+10 AS padded_size
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"), col("p_name"),
          round(col("p_retailprice") * lit(0.9), 2).as("discounted"),
          (col("p_size") + lit(10)).as("padded_size"))
        .orderBy("p_partkey")
    },

    // ── single comparison predicate (<), pushed to the parquet scan
    QueryDef(
      "q03_filter_cmp",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 5 ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(col("l_quantity") < 5)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // ── AND of two predicates (>=, <>)
    QueryDef(
      "q04_filter_and",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_totalprice >= 400000 AND o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_totalprice") >= 400000 && col("o_orderstatus") =!= "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ── OR of two predicates (<=, =)
    QueryDef(
      "q05_filter_or",
      """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_acctbal <= 0 OR c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      T(s, dir, "customer")
        .filter(col("c_acctbal") <= 0 || col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ── cartesian product (bounded: dimension × dimension only)
    QueryDef(
      "q06_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      T(s, dir, "region").select("r_name")
        .crossJoin(T(s, dir, "nation").select("n_name"))
        .orderBy("r_name", "n_name")
    },

    // ── equi-join; small side broadcast explicitly (map-side join at scale)
    QueryDef(
      "q07_equijoin",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val c = T(s, dir, "customer").select("c_custkey", "c_name")
      val o = T(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ── theta join (inequality): cross + filter over bounded dims;
    //    Catalyst executes it as BroadcastNestedLoopJoin with the
    //    predicate applied in the join, not after materialization
    QueryDef(
      "q08_theta_join",
      """SELECT s_suppkey, s_nationkey, n_nationkey, n_name
        |FROM supplier, nation WHERE s_nationkey < n_nationkey
        |ORDER BY s_suppkey, n_nationkey""".stripMargin) { (s, dir) =>
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = T(s, dir, "nation").select("n_nationkey", "n_name")
      sup.join(broadcast(nat), sup("s_nationkey") < nat("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_nationkey", "n_name")
        .orderBy("s_suppkey", "n_nationkey")
    },

    // ── whole-table aggregates: SUM/AVG/MIN/MAX/COUNT(+DISTINCT)
    QueryDef(
      "q09_agg_global",
      """SELECT round(sum(l_extendedprice),2) AS total_price,
        |  round(avg(l_discount),6) AS avg_disc,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  count(*) AS cnt, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem").agg(
        round(sum("l_extendedprice"), 2).as("total_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        count(lit(1)).as("cnt"),
        countDistinct(col("l_partkey")).as("n_parts"))
    },

    // ── DISTINCT projection
    QueryDef(
      "q10_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ── aggregate over DISTINCT values
    QueryDef(
      "q11_agg_distinct",
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
        |  round(avg(DISTINCT l_quantity),4) AS avg_qty_distinct,
        |  CAST(sum(DISTINCT l_linenumber) AS BIGINT) AS sum_ln
        |FROM lineitem""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem").agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        round(expr("avg(DISTINCT l_quantity)"), 4).as("avg_qty_distinct"),
        sum_distinct(col("l_linenumber")).as("sum_ln"))
    },

    // ── GROUP BY + HAVING
    QueryDef(
      "q12_groupby_having",
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_orderpriority HAVING count(*) > 10
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .filter(col("n") > 10)
        .orderBy("o_orderpriority")
    },

    // ── top-k: orderBy+limit compiles to TakeOrderedAndProject (heap-k per
    //    partition + driver merge — no global sort even at 100 TB)
    QueryDef(
      "q13_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        T(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
    },

    // ── multi-key global sort (range-partitioned exchange)
    QueryDef(
      "q14_orderby_multi",
      """SELECT p_partkey, p_brand, p_retailprice FROM part
        |ORDER BY p_brand ASC, p_retailprice DESC, p_partkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "part")
          .select("p_partkey", "p_brand", "p_retailprice")
          .orderBy(col("p_brand").asc, col("p_retailprice").desc,
            col("p_partkey").asc)
    }
  )
}
