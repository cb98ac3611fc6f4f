package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Plan-audited write-side posture: partition pruning after partitioned
  * writes, Exchange-free joins after bucketed writes. */
class SinksSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned write → partition-pruned scan") {
    val path = Files.createTempDirectory("part").toString + "/docs"
    Sinks.writePartitioned(Tables(spark, sf, "documents"), path, "lang")
    val back = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = back.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning:\n$plan")
    val want = Tables(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(back.count() == want)
  }

  test("bucketed tables join without an Exchange") {
    Sinks.writeBucketed(
      Tables(spark, sf, "orders").select("o_orderkey", "o_custkey",
        "o_totalprice"), "orders_b", 4, "o_orderkey")
    Sinks.writeBucketed(
      Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "lineitem_b", 4, "l_orderkey")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
    // disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // inner join: one group per order that has ≥1 lineitem
      assert(joined.count() ==
        Tables(spark, sf, "lineitem").select("l_orderkey").distinct().count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("ORC round-trip preserves rows and pushes predicates to the scan") {
    val path = Files.createTempDirectory("orc").toString + "/orders"
    val src = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Sinks.writeOrc(src, path)
    val back = Sinks.readOrc(spark, path)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "ORC round-trip must be lossless")
    val plan = back.filter(col("o_custkey") === 7L).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"),
      s"ORC scan must push the predicate:\n$plan")
  }

  test("JSON-lines round-trip with explicit schema preserves rows") {
    val path = Files.createTempDirectory("json").toString + "/nation"
    val src = Tables(spark, sf, "nation")
    Sinks.writeJsonLines(src, path)
    val back = Sinks.readJsonLines(spark, path, src.schema)
    assert(back.schema == src.schema, "explicit schema must pin types")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("CSV round-trip with explicit schema preserves rows") {
    val path = Files.createTempDirectory("csv").toString + "/region"
    val src = Tables(spark, sf, "region")
    Sinks.writeCsv(src, path)
    val back = Sinks.readCsv(spark, path, src.schema)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
