package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.sources.JdbcConnector

/** Catalog / connector / DML surface (SURVEY.md §2B rows previously
  * declared Skip — external connectors, statistics, transactions/DML —
  * now implemented with what the Spark classpath already ships):
  *
  *  - q109: a REAL external JDBC roundtrip against the embedded Apache
  *    Derby engine (on every Spark classpath): dimension sync out, then
  *    a range-partitioned parallel read back (N concurrent cursors over
  *    key strides — the only JDBC ingest shape that scales past one
  *    connection) with the filter pushed into the remote SQL;
  *  - q110: ANALYZE-backed table+column statistics, read back from the
  *    catalog — rowCount / nullCount / exact min/max per column. These
  *    are the numbers CBO join-reorder and broadcast-threshold decisions
  *    consume; emitting them as a result set lets the DuckDB oracle
  *    verify the statistics machinery end-to-end (distinctCount is HLL-
  *    approximate in Spark, so it stays out of the hash-compared set);
  *  - q111: MERGE-style upsert semantics as a copy-on-write plan —
  *    deletes dropped, updates replaced, inserts emitted — the exact
  *    rewrite every pre-ACID lake (and Delta/Iceberg underneath)
  *    executes; the change set derives deterministically from the same
  *    md5 gate as q87/q88 so both engines agree bit-for-bit, which
  *    lets the whole merge collapse to ONE scan of the target
  *    (explode of 0–2 output rows per input row). The write-path
  *    (partition-overwrite COW to parquet and re-read) is
  *    spec-verified in CatalogOpsSpec.
  *
  * Scale notes (100 TB posture): the JDBC path is dimension-sized by
  * design (an RDBMS is never the fact path); ANALYZE is two scans that
  * run once per table mutation, amortized across every plan that uses
  * the stats; the COW merge shuffles the fact side once on the join key
  * and rewrites only what changed when partition-scoped.
  */
object CatalogOps {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Deterministic md5 bucket on the order key (q87/q88 discipline). */
  private def keyGate =
    graft.plans.HexWindowToLong.md5Bucket(col("o_orderkey"), 100)

  val defs: Seq[QueryDef] = Seq(

    // ── external connector roundtrip: supplier → Derby (overwrite) →
    //    range-partitioned parallel read (4 cursors) → pushed filter →
    //    aggregate. The oracle reads the same parquet directly, so the
    //    hash proves the connector loses nothing in either direction.
    //    Stride bounds derive from the data (one tiny dim aggregate) —
    //    hard-coded bounds would dump every row into the first cursor
    //    and silently serialize the "parallel" read.
    QueryDef(
      "q109_jdbc_roundtrip",
      """SELECT CAST(s_nationkey AS INTEGER) AS s_nationkey,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(s_acctbal), 4) AS bal
        |FROM supplier WHERE s_acctbal > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val sup = T(s, dir, "supplier")
      JdbcConnector.write(sup, "graftdb", "supplier_dim")
      val b = sup.agg(min("s_suppkey"), max("s_suppkey")).head()
      JdbcConnector.readPartitioned(s, "graftdb", "supplier_dim",
          partCol = "s_suppkey", lower = b.getLong(0), upper = b.getLong(1),
          numPartitions = 4)
        .filter(col("s_acctbal") > 0)
        .groupBy(col("s_nationkey").cast("int").as("s_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 4).as("bal"))
        .orderBy("s_nationkey")
    },

    // ── ANALYZE-backed statistics: register an external catalog table
    //    over the orders parquet, compute table+column stats, read them
    //    back from the catalog. rowCount/nullCount/min/max are exact in
    //    Spark's ColumnStat, so the oracle can recompute them.
    QueryDef(
      "q110_column_stats",
      """SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_null AS BIGINT) AS n_null, min_v, max_v
        |FROM (
        |  SELECT 'o_custkey' AS col, count(*) AS n_rows,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_null,
        |    CAST(min(o_custkey) AS DOUBLE) AS min_v,
        |    CAST(max(o_custkey) AS DOUBLE) AS max_v FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
        |    min(o_totalprice), max(o_totalprice) FROM orders
        |) ORDER BY col""".stripMargin) { (s, dir) =>
      val tbl = "graft_orders_stats"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/orders.parquet'")
      s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS " +
        "FOR COLUMNS o_custkey, o_totalprice")
      val stats = s.sessionState.catalog
        .getTableMetadata(TableIdentifier(tbl)).stats.get
      val nRows = stats.rowCount.get.toLong
      val rows = Seq("o_custkey", "o_totalprice").map { c =>
        val cs = stats.colStats(c)
        (c, nRows, cs.nullCount.get.toLong,
          cs.min.get.toDouble, cs.max.get.toDouble)
      }
      import s.implicits._
      rows.toDF("col", "n_rows", "n_null", "min_v", "max_v")
        .orderBy("col")
    },

    // ── MERGE upsert semantics (copy-on-write rewrite): 5% of orders
    //    deleted, 10% repriced (+10.0 — exact in IEEE on both engines),
    //    5% re-inserted under shifted keys with status 'N'. The oracle
    //    spells the textbook COW plan (keep ∪ upd ∪ ins); the Spark
    //    side exploits that the change set derives from the SAME bk
    //    gate, so "target anti-join touched-keys" is just bk >= 15 and
    //    the whole merge is ONE scan of orders emitting 0–2 rows per
    //    input row via explode(array_compact(...)) — no join, no
    //    re-scan per branch (the r12 shape re-scanned orders five
    //    times; PlanAuditSpec now pins the single scan). A real MERGE
    //    whose change set arrives as a separate frame keeps the
    //    anti-join — but then the change frame, not the target, is the
    //    thing scanned twice, and the target still scans once.
    QueryDef(
      "q111_merge_upsert",
      """WITH g AS (SELECT *,
        |  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |    % 100 AS bk FROM orders),
        |upd AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 10.0
        |          AS o_totalprice FROM g WHERE bk >= 5 AND bk < 15),
        |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey,
        |          'N' AS o_orderstatus, o_totalprice FROM g WHERE bk >= 95),
        |keep AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |         FROM g WHERE bk >= 15)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM keep
        |UNION ALL SELECT * FROM upd
        |UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      def row(k: Column, st: Column, p: Column): Column =
        struct(k.as("o_orderkey"), st.as("o_orderstatus"),
          p.as("o_totalprice"))
      // per input row: bk<5 → nothing (deleted); 5–14 → repriced;
      // ≥15 → kept as-is; ≥95 ALSO emits the shifted insert
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), keyGate.as("bk"))
        .select(explode(array_compact(array(
          when(col("bk") >= 15,
            row(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice")))
            .when(col("bk") >= 5,
              row(col("o_orderkey"), col("o_orderstatus"),
                col("o_totalprice") + 10.0)),
          when(col("bk") >= 95,
            row(col("o_orderkey") + 10000000L, lit("N"),
              col("o_totalprice")))))).as("r"))
        .select(col("r.o_orderkey").as("o_orderkey"),
          col("r.o_orderstatus").as("o_orderstatus"),
          col("r.o_totalprice").as("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // ── order-independent table DIGEST: the integrity audit that makes
    //    copies comparable without moving data. Per row, md5 over a
    //    canonical '|'-joined rendering of the key columns (ints and
    //    strings only — float/timestamp formatting is engine-specific),
    //    folded with bit_xor: commutative and width-stable, so the
    //    digest is one narrow scan + a partial-aggregated fold with NO
    //    overflow and NO row-order sensitivity — two 100 TB replicas
    //    compare by exchanging 16 bytes each. XOR's blind spot (a row
    //    appearing an even number of times cancels out) is covered by
    //    publishing n_rows beside the digest.
    QueryDef(
      "q132_table_digest",
      """SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(('0x' || substr(md5(
        |    concat_ws('|', c_custkey, c_name, c_mktsegment)), 1, 15))::BIGINT)
        |    AS digest
        |FROM customer
        |UNION ALL
        |SELECT 'orders', CAST(count(*) AS BIGINT),
        |  bit_xor(('0x' || substr(md5(concat_ws('|',
        |    o_orderkey, o_custkey, o_orderstatus, o_orderpriority)), 1, 15))
        |    ::BIGINT)
        |FROM orders
        |ORDER BY tbl""".stripMargin) { (s, dir) =>
      import graft.plans.HexWindowToLong.hexWindow
      def digest(df: DataFrame, tbl: String, cols: Seq[String]): DataFrame =
        df.select(hexWindow(
            md5(encode(concat_ws("|", cols.map(col): _*), "UTF-8")), 1)
            .as("h"))
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))
          .select(lit(tbl).as("tbl"), col("n_rows"), col("digest"))
      digest(T(s, dir, "customer"), "customer",
          Seq("c_custkey", "c_name", "c_mktsegment"))
        .unionAll(digest(T(s, dir, "orders"), "orders",
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")))
        .orderBy("tbl")
    },

    // ── data-quality audit: the constraint report a pipeline gates a
    //    publish on — PK uniqueness, FK orphans both directions,
    //    domain-band violations. Each referential check is ONE scan of
    //    the child table left-joined to the broadcast distinct key set
    //    of its parent (violations and totals counted in the same
    //    conditional aggregate — no second pass, no anti-join + count
    //    double-scan); domain checks are pure conditional aggregates.
    //    At 100 TB the fact-side scan dominates and shuffles nothing;
    //    zero-violation rows are the PASS state and stay in the report.
    QueryDef(
      "q147_dq_audit",
      """WITH ck AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |ok AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |ouk AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT * FROM (
        |SELECT 'customer_negative_acctbal' AS chk,
        |  CAST(count(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT)
        |    AS n_violations,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM customer
        |UNION ALL
        |SELECT 'customer_without_orders',
        |  CAST(count(CASE WHEN ouk.k IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM customer LEFT JOIN ouk ON c_custkey = ouk.k
        |UNION ALL
        |SELECT 'lineitem_discount_band',
        |  CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
        |    AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_fk_orphans',
        |  CAST(count(CASE WHEN ok.k IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem LEFT JOIN ok ON l_orderkey = ok.k
        |UNION ALL
        |SELECT 'orders_fk_orphans',
        |  CAST(count(CASE WHEN ck.k IS NULL THEN 1 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM orders LEFT JOIN ck ON o_custkey = ck.k
        |UNION ALL
        |SELECT 'orders_pk_duplicates',
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |) ORDER BY chk""".stripMargin) { (s, dir) =>
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders")
      val li = T(s, dir, "lineitem")
      def row(chk: String, viol: org.apache.spark.sql.Column,
          base: DataFrame): DataFrame =
        base.agg(count(viol).as("n_violations"), count(lit(1)).as("n_rows"))
          .select(lit(chk).as("chk"), col("n_violations"), col("n_rows"))
      val negBal = row("customer_negative_acctbal",
        when(col("c_acctbal") < 0, 1), cust)
      val noOrders = row("customer_without_orders",
        when(col("k").isNull, 1),
        cust.join(broadcast(ord.select(col("o_custkey").as("k")).distinct()),
          col("c_custkey") === col("k"), "left"))
      val discBand = row("lineitem_discount_band",
        when(col("l_discount") < 0 || col("l_discount") > 0.1, 1), li)
      val liOrphans = row("lineitem_fk_orphans",
        when(col("k").isNull, 1),
        li.join(broadcast(ord.select(col("o_orderkey").as("k")).distinct()),
          col("l_orderkey") === col("k"), "left"))
      // distinct() even though c_custkey is nominally the PK: a DQ audit
      // must SURVIVE dirty data, and a duplicated parent key would
      // otherwise fan out child rows and inflate n_rows past the table
      val ordOrphans = row("orders_fk_orphans",
        when(col("k").isNull, 1),
        ord.join(broadcast(cust.select(col("c_custkey").as("k")).distinct()),
          col("o_custkey") === col("k"), "left"))
      val pkDup = ord
        .agg((count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("n_violations"), count(lit(1)).as("n_rows"))
        .select(lit("orders_pk_duplicates").as("chk"),
          col("n_violations"), col("n_rows"))
      negBal.unionAll(noOrders).unionAll(discBand).unionAll(liOrphans)
        .unionAll(ordOrphans).unionAll(pkDup)
        .orderBy("chk")
    },

    // ── snapshot diff (CDC without a table format): classify every key
    //    across two snapshots as added / removed / changed / unchanged
    //    and net the ledger impact per class. Snapshots derive
    //    deterministically from the md5 gate (old = buckets 0-94,
    //    new = 5-99, buckets 40-49 get +$5.00), so both engines build
    //    bit-identical inputs with no second table. The diff itself is
    //    the production shape: ONE full-outer join keyed by the primary
    //    key — co-partitionable at any scale — then a 4-group aggregate.
    //    Money in integer cents end to end.
    QueryDef(
      "q148_snapshot_diff",
      """WITH b AS (SELECT o_orderkey AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |    % 100 AS bk
        |  FROM orders),
        |old AS (SELECT k, cents AS old_c FROM b WHERE bk < 95),
        |new_ AS (SELECT k,
        |  CASE WHEN bk BETWEEN 40 AND 49 THEN cents + 500 ELSE cents END
        |    AS new_c
        |  FROM b WHERE bk >= 5),
        |d AS (SELECT coalesce(old.k, new_.k) AS k, old_c, new_c,
        |  CASE WHEN old_c IS NULL THEN 'added'
        |       WHEN new_c IS NULL THEN 'removed'
        |       WHEN old_c <> new_c THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(new_c, 0) - coalesce(old_c, 0) AS dc
        |  FROM old FULL JOIN new_ ON old.k = new_.k)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(dc) AS BIGINT) AS delta_cents
        |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      val b = T(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"),
          keyGate.as("bk"))
      val old = b.filter(col("bk") < 95).select(col("k"), col("cents").as("old_c"))
      val neu = b.filter(col("bk") >= 5)
        .select(col("k"),
          when(col("bk").between(40, 49), col("cents") + 500)
            .otherwise(col("cents")).as("new_c"))
      old.join(neu, Seq("k"), "full")
        .select(
          when(col("old_c").isNull, "added")
            .when(col("new_c").isNull, "removed")
            .when(col("old_c") =!= col("new_c"), "changed")
            .otherwise("unchanged").as("status"),
          (coalesce(col("new_c"), lit(0L)) - coalesce(col("old_c"), lit(0L)))
            .as("dc"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_rows"), sum(col("dc")).as("delta_cents"))
        .orderBy("status")
    },

    // ── partition-level digest diff: the incremental-processing
    //    front-door. Before reprocessing a 100 TB table, compare each
    //    partition's order-independent digest (q132's bit_xor fold)
    //    between the old and new snapshot and re-run ONLY the partitions
    //    whose digest moved — the standard manifest-diff trick when the
    //    source has no CDC log. Snapshots derive deterministically from
    //    the md5 gate (new pays +$5.00 on gate<10 rows in every third
    //    month), so one scan computes both digests side by side; a real
    //    deployment digests each snapshot where it lives and joins the
    //    O(partitions) digest frames. Month is the partition key —
    //    exactly the layout q139's slice-merge maintenance consumes.
    QueryDef(
      "q153_partition_digest_diff",
      """WITH b AS (SELECT
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  o_orderkey AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |    % 100 AS bk
        |  FROM orders),
        |p AS (SELECT mon, k, cents AS old_c,
        |  CASE WHEN bk < 10 AND month(mon) % 3 = 0 THEN cents + 500
        |       ELSE cents END AS new_c
        |  FROM b)
        |SELECT mon, CAST(count(*) AS BIGINT) AS n_rows,
        |  CASE WHEN
        |    bit_xor(('0x' || substr(md5(concat_ws('|', k, old_c)), 1, 15))::BIGINT)
        |    = bit_xor(('0x' || substr(md5(concat_ws('|', k, new_c)), 1, 15))::BIGINT)
        |    THEN 'unchanged' ELSE 'changed' END AS status
        |FROM p GROUP BY mon
        |ORDER BY mon""".stripMargin) { (s, dir) =>
      import graft.plans.HexWindowToLong.hexWindow
      val p = T(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("mon"),
          col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"),
          keyGate.as("bk"))
        .select(col("mon"), col("k"), col("cents").as("old_c"),
          when(col("bk") < 10 && month(col("mon")) % 3 === 0,
            col("cents") + 500).otherwise(col("cents")).as("new_c"))
        .select(col("mon"),
          hexWindow(md5(encode(
            concat_ws("|", col("k"), col("old_c")), "UTF-8")), 1).as("ho"),
          hexWindow(md5(encode(
            concat_ws("|", col("k"), col("new_c")), "UTF-8")), 1).as("hn"))
      p.groupBy("mon")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(ho)").as("xo"), expr("bit_xor(hn)").as("xn"))
        .select(col("mon"), col("n_rows"),
          when(col("xo") === col("xn"), "unchanged")
            .otherwise("changed").as("status"))
        .orderBy("mon")
    }
  )
}
