package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}
import graft.sources.JdbcConnector

/** Connector fidelity, statistics plumbing, and the copy-on-write
  * upsert write path (the parts q109–q111's oracles can't see). */
class CatalogOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("JDBC roundtrip preserves every supplier row and column exactly") {
    val src = Tables(spark, sf, "supplier")
    JdbcConnector.write(src, "spectest", "supplier_rt")
    val back = JdbcConnector.read(spark, "spectest", "supplier_rt")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    assert(back.count() == src.count())
    // symmetric difference empty = bit-exact roundtrip (doubles included:
    // Derby DOUBLE is IEEE 754, no precision loss)
    assert(back.exceptAll(src.select(back.columns.map(col).toSeq: _*))
      .count() == 0)
  }

  test("partitioned JDBC read pushes the filter and splits into cursors") {
    val src = Tables(spark, sf, "supplier")
    JdbcConnector.write(src, "spectest", "supplier_pp")
    val b = src.agg(min("s_suppkey"), max("s_suppkey")).head()
    val df = JdbcConnector.readPartitioned(spark, "spectest", "supplier_pp",
      "s_suppkey", b.getLong(0), b.getLong(1), 4)
    assert(df.rdd.getNumPartitions == 4,
      "4 range strides must become 4 concurrent cursors")
    // the strides must actually split the key range — every cursor
    // carries rows (hard-coded bounds would drain all rows through one)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.count(_ > 0) == 4, s"empty JDBC strides: ${sizes.toSeq}")
    val p = df.filter(col("s_acctbal") > 0)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(s_acctbal"),
      s"filter must ship into the remote SQL:\n$p")
  }

  test("ANALYZE stats reach the optimizer's plan estimates") {
    SparkEntry.queries("q110_column_stats")(spark, sf).collect() // runs ANALYZE
    val actual = Tables(spark, sf, "orders").count()
    // rowCount flows into plan estimates only under cost-based optimization
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("graft_orders_stats")
        .queryExecution.optimizedPlan
      assert(plan.stats.rowCount.contains(BigInt(actual)),
        s"optimizer must see rowCount=$actual, got ${plan.stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("COW partition overwrite rewrites only the touched partition") {
    val out = Files.createTempDirectory("graft_cow").toString + "/t"
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    orders.write.partitionBy("o_orderstatus").parquet(out)
    // dynamic overwrite: replace ONLY status 'F' with repriced rows
    val repriced = orders.filter($"o_orderstatus" === "F")
      .withColumn("o_totalprice", $"o_totalprice" + 10.0)
    repriced.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderstatus").parquet(out)
    val after = spark.read.parquet(out)
    assert(after.count() == orders.count(), "untouched partitions survive")
    val fSum = after.filter($"o_orderstatus" === "F")
      .agg(sum("o_totalprice")).as[Double].head()
    val fExpect = repriced.agg(sum("o_totalprice")).as[Double].head()
    assert(math.abs(fSum - fExpect) < 1e-6, "F partition carries the update")
    val oSum = after.filter($"o_orderstatus" === "O")
      .agg(sum("o_totalprice")).as[Double].head()
    val oExpect = orders.filter($"o_orderstatus" === "O")
      .agg(sum("o_totalprice")).as[Double].head()
    assert(math.abs(oSum - oExpect) < 1e-6, "O partition is untouched")
  }

  test("q147 DQ audit: brute-force one check, violations bounded by rows") {
    val out = SparkEntry.queries("q147_dq_audit")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 6)
    out.foreach { case (chk, (v, n)) =>
      assert(v >= 0 && v <= n, s"$chk: $v violations of $n rows")
    }
    // re-derive customer_without_orders from the raw tables
    val custKeys = graft.Tables(spark, sf, "customer")
      .select("c_custkey").as[Long].collect().toSet
    val orderCust = graft.Tables(spark, sf, "orders")
      .select("o_custkey").as[Long].collect().toSet
    val expected = custKeys.count(k => !orderCust.contains(k)).toLong
    assert(out("customer_without_orders")._1 == expected)
    assert(out("customer_without_orders")._2 == custKeys.size.toLong)
  }

  test("q148 snapshot diff: statuses partition the key universe, deltas add up") {
    val out = SparkEntry.queries("q148_snapshot_diff")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bk = graft.plans.HexWindowToLong.md5Bucket($"o_orderkey", 100)
    val buckets = graft.Tables(spark, sf, "orders")
      .select(bk.as("bk")).as[Long].collect()
    val nOld = buckets.count(_ < 95).toLong
    val nNew = buckets.count(_ >= 5).toLong
    val nBoth = buckets.count(b => b >= 5 && b < 95).toLong
    assert(out("removed")._1 == nOld - nBoth)
    assert(out("added")._1 == nNew - nBoth)
    assert(out("changed")._1 + out("unchanged")._1 == nBoth)
    // every changed row is the deterministic +$5.00 edit
    assert(out("changed")._1 == buckets.count(b => b >= 40 && b < 50).toLong)
    assert(out("changed")._2 == out("changed")._1 * 500)
    assert(out("unchanged")._2 == 0L)
  }

  test("q153 flags exactly the months containing a modified row") {
    val out = SparkEntry.queries("q153_partition_digest_diff")(spark, sf)
      .as[(java.sql.Timestamp, Long, String)].collect()
    val bk = graft.plans.HexWindowToLong.md5Bucket($"o_orderkey", 100)
    // a month's digest moves iff >=1 of its rows takes the +500 edit
    val touched = Tables(spark, sf, "orders")
      .select(date_trunc("month", $"o_orderdate").as("mon"), bk.as("bk"))
      .filter($"bk" < 10 && month($"mon") % 3 === 0)
      .select("mon").distinct()
      .as[java.sql.Timestamp].collect().toSet
    val flagged = out.filter(_._3 == "changed").map(_._1).toSet
    assert(flagged == touched,
      "changed set must equal the months holding an edited row")
    assert(out.exists(_._3 == "unchanged"),
      "the gate must leave some months untouched or the diff is vacuous")
    // row accounting: months partition the table
    assert(out.map(_._2).sum == Tables(spark, sf, "orders").count())
  }

  test("q111 merge preserves row accounting: kept + updated + inserted") {
    val out = SparkEntry.queries("q111_merge_upsert")(spark, sf).cache()
    val base = Tables(spark, sf, "orders")
    val n = base.count()
    val inserted = out.filter($"o_orderkey" > 10000000L).count()
    val deleted = n + inserted - out.count()
    assert(deleted > 0 && inserted > 0, "change set must actually fire")
    // deletes are the bk<5 bucket: ~5% of keys
    assert(deleted < n / 10, s"deleted $deleted of $n — gate too wide")
    out.unpersist()
  }
}
