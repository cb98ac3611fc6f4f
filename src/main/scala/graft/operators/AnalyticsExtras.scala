package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Second wave of analytic operators: pivot, ordered string aggregation,
  * value/distribution window functions, scalar conditionals, UNION ALL.
  *
  * Scale notes: pivot with explicit values compiles to conditional
  * aggregation — one pass, partial aggregation applies, no shuffle
  * explosion; collect_set for string_agg is bounded by the group's
  * distinct-value count (here: 5 priorities), NOT the row count.
  */
object AnalyticsExtras {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val prioAlias =
    Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")

  val defs: Seq[QueryDef] = Seq(

    // ── pivot: order counts, statuses × priorities
    QueryDef(
      "q37_pivot",
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (s, dir) =>
        val pivoted = T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", priorities)
          .agg(count(lit(1)))
        // pivot leaves absent combinations NULL; the oracle's CASE-sum
        // yields 0 — align, and give the value-columns stable names
        pivoted.select(
          col("o_orderstatus") +:
            priorities.zip(prioAlias).map { case (v, a) =>
              coalesce(col(s"`$v`"), lit(0L)).as(a)
            }: _*)
          .orderBy("o_orderstatus")
    },

    // ── ordered string aggregation (LISTAGG): distinct priorities per status
    QueryDef(
      "q38_string_agg",
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS prio_list,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
              .as("prio_list"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
    },

    // ── value + distribution window functions
    QueryDef(
      "q39_window_value_fns",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  first_value(o_orderkey) OVER w AS cheapest_key,
        |  last_value(o_orderkey) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS priciest_key,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_orderkey <= 500
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        T(s, dir, "orders")
          .filter(col("o_orderkey") <= 500)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            first("o_orderkey").over(w).as("cheapest_key"),
            last("o_orderkey").over(wFull).as("priciest_key"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    },

    // ── scalar conditionals: greatest/least/nullif/ifnull
    QueryDef(
      "q63_conditionals",
      """SELECT l_orderkey, l_linenumber,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_tax, l_discount) AS le,
        |  ifnull(nullif(l_returnflag, 'N'), 'none') AS flag
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
            .as("flag"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ── UNION ALL (bag semantics — q19 covers distinct UNION)
    QueryDef(
      "q64_union_all",
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier
        |  UNION ALL SELECT n_nationkey FROM nation
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin) { (s, dir) =>
      T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .union(T(s, dir, "nation").select(col("n_nationkey").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")
    },

    // ── key-skew diagnostic: the counts-of-counts histogram of
    //    orders.o_custkey (how many keys occur exactly cnt times) — the
    //    profile that decides salting / AQE-skew-join settings before a
    //    big shuffle. Two chained partial-agg groupBys; the second input
    //    is one row per key, so the histogram costs O(keys), not O(rows),
    //    and the answer frame is O(max multiplicity) — tiny at any scale.
    QueryDef(
      "q120_key_skew_histogram",
      """WITH k AS (SELECT o_custkey, count(*) AS cnt FROM orders
        |           GROUP BY o_custkey)
        |SELECT CAST(cnt AS BIGINT) AS cnt, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(cnt * count(*) AS BIGINT) AS n_rows
        |FROM k GROUP BY cnt ORDER BY cnt""".stripMargin) { (s, dir) =>
      T(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        .groupBy("cnt").agg(count(lit(1)).as("n_keys"))
        .select(col("cnt"), col("n_keys"),
          (col("cnt") * col("n_keys")).as("n_rows"))
        .orderBy("cnt")
    },

    // ── count-min sketch heavy-hitter audit: a 2×64 CMS over user_id
    //    built from the engine-portable md5 hash, then the top-10 exact
    //    keys read back through the sketch — estimate = min over the two
    //    salted rows, always ≥ exact (one-sided error, verified by the
    //    overcount column). All integers, so the whole sketch is
    //    hash-oracled. Shape: one narrow map + a 128-cell partial-agg'd
    //    groupBy (the sketch), one exact top-k, and a broadcast join of
    //    the 128-row sketch back to 10 keys — at 100 TB the sketch agg
    //    is O(cells) network, the same trick CMS exists for.
    QueryDef(
      "q126_countmin_audit",
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        |h AS (SELECT k,
        |  ('0x' || substr(md5('0:' || k), 1, 15))::BIGINT % 64 AS c0,
        |  ('0x' || substr(md5('1:' || k), 1, 15))::BIGINT % 64 AS c1 FROM e),
        |cms0 AS (SELECT c0 AS cell, count(*) AS n FROM h GROUP BY c0),
        |cms1 AS (SELECT c1 AS cell, count(*) AS n FROM h GROUP BY c1),
        |ex AS (SELECT k, count(*) AS cnt,
        |  min(c0) AS c0, min(c1) AS c1 FROM h GROUP BY k
        |  ORDER BY cnt DESC, k LIMIT 10)
        |SELECT CAST(ex.k AS BIGINT) AS user_id, CAST(cnt AS BIGINT) AS exact,
        |  CAST(least(cms0.n, cms1.n) AS BIGINT) AS estimate,
        |  CAST(least(cms0.n, cms1.n) - cnt AS BIGINT) AS overcount
        |FROM ex JOIN cms0 ON ex.c0 = cms0.cell
        |        JOIN cms1 ON ex.c1 = cms1.cell
        |ORDER BY exact DESC, user_id""".stripMargin) { (s, dir) =>
      import graft.plans.HexWindowToLong.md5Bucket
      // the hashed frame feeds THREE aggregations (cms0, cms1, ex) in one
      // plan — registry-persist it so the scan + two md5 digests per row
      // run once per session, not three times per execution (same
      // discipline as q130's tf frame)
      val h = graft.CacheRegistry.cached(s, s"cms-hashed:$dir") {
        T(s, dir, "events")
          .select(col("user_id").cast("string").as("k"))
          .select(col("k"),
            md5Bucket(concat(lit("0:"), col("k")), 64).as("c0"),
            md5Bucket(concat(lit("1:"), col("k")), 64).as("c1"))
      }
      val cms0 = h.groupBy(col("c0").as("cell")).agg(count(lit(1)).as("n0"))
      val cms1 = h.groupBy(col("c1").as("cell")).agg(count(lit(1)).as("n1"))
      val ex = h.groupBy("k")
        .agg(count(lit(1)).as("cnt"), min("c0").as("c0"), min("c1").as("c1"))
        .orderBy(col("cnt").desc, col("k")).limit(10)
      ex.join(broadcast(cms0), col("c0") === cms0("cell"))
        .join(broadcast(cms1), col("c1") === cms1("cell"))
        .select(col("k").cast("bigint").as("user_id"),
          col("cnt").as("exact"),
          least(col("n0"), col("n1")).as("estimate"),
          (least(col("n0"), col("n1")) - col("cnt")).as("overcount"))
        .orderBy(col("exact").desc, col("user_id"))
    },

    // ── incremental aggregate maintenance (materialized-view delta
    //    merge): the base partition (orders before 2001) keeps its
    //    aggregate STATE (count/sum/min/max per group); when the delta
    //    partition (2001+) arrives, only its own state is computed and
    //    the two states MERGE — count+count, sum+sum, min(min), max(max),
    //    avg derived from merged sum/count. At 100 TB this is the
    //    difference between touching the 0.1% of new data and
    //    recomputing the world; the mergeable-state algebra here is
    //    exactly what Spark's partial aggregation uses inside one query,
    //    lifted to cross-run maintenance. The oracle recomputes from
    //    scratch over the full table — hash-equality IS the proof that
    //    merge(base, delta) == recompute(all).
    QueryDef(
      "q139_incremental_agg",
      """SELECT o_orderpriority, CAST(count(*) AS INTEGER) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  round(sum(o_totalprice) / count(*), 4) AS avg_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val split = lit("2001-01-01").cast("timestamp")
      // both states carry the SAME mergeable shape; each scan's filter
      // is pushed to parquet, so at scale each run reads only its slice.
      // The slices must be a true PARTITION of the table: the delta side
      // is the complement (>= split OR NULL), not just >= split — a bare
      // >= would silently drop NULL-dated rows from both slices and break
      // the merge == recompute invariant the oracle proves
      def state(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        T(s, dir, "orders")
          .filter(f(col("o_orderdate")))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("tot"),
            min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      state(_ < split).unionByName(state(c => c >= split || c.isNull))
        .groupBy("o_orderpriority")
        .agg(sum("cnt").as("cnt"), sum("tot").as("tot"),
          min("mn").as("mn"), max("mx").as("mx"))
        .select(col("o_orderpriority"),
          col("cnt").cast("int").as("n_orders"),
          round(col("tot"), 2).as("total_price"),
          col("mn").as("min_price"), col("mx").as("max_price"),
          round(col("tot") / col("cnt"), 4).as("avg_price"))
        .orderBy("o_orderpriority")
    }
  )
}
