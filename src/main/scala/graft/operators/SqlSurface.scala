package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** The secondary entry styles (SURVEY.md §3): SQL text through
  * spark.sql over registered views — one string serving BOTH engines —
  * and the typed Aggregator UDAF surface.
  */
object SqlSurface {

  /** CTE + correlated EXISTS + scalar subquery, one dialect-neutral
    * string: Spark executes it via spark.sql over temp views; DuckDB
    * executes the same text as the oracle. */
  private val cteSql =
    """WITH cust_spend AS (
      |  SELECT o_custkey, sum(o_totalprice) AS spent
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT c_custkey, c_name, round(spent, 2) AS spent
      |FROM customer JOIN cust_spend ON c_custkey = o_custkey
      |WHERE EXISTS (SELECT 1 FROM orders o2
      |              WHERE o2.o_custkey = c_custkey
      |                AND o2.o_orderstatus = 'F')
      |  AND spent > (SELECT avg(o_totalprice) * 5 FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** Weighted arithmetic mean as a typed Aggregator — the UDAF surface
    * for aggregations Spark's built-ins can't express. Buffer is a pure
    * product type so partial aggregation + merge distribute exactly like
    * a DeclarativeAggregate. */
  final case class WAvgBuf(s: Double, w: Double)
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
      WAvgBuf(b.s + a._1 * a._2, b.w + a._2)
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.s + y.s, x.w + y.w)
    override def finish(b: WAvgBuf): Double = b.s / b.w
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Seq[QueryDef] = Seq(

    // ── SQL-text entry: identical string on both engines
    QueryDef("q71_cte_exists", cteSql) { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(cteSql)
    },

    // ── typed Aggregator UDAF: quantity-weighted average price
    QueryDef(
      "q72_weighted_avg_udaf",
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
        |    AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val wavg = udaf(WeightedAvg)
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
              .as("wavg_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
    }
  )
}
