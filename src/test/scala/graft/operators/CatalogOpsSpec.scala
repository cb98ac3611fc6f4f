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
