package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Scalar-function coverage wave 2 (SURVEY.md §2B date/string/array
  * rows): date arithmetic and field extraction, array functions over the
  * embedding vectors, argmax-style and boolean aggregates, and the
  * remaining string toolbox. All narrow maps or single-shuffle
  * aggregations — nothing here changes plan shape at scale. */
object ScalarFunctions {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── date arithmetic: diff, interval shift, epoch, field extraction
    QueryDef(
      "q65_date_arith",
      """SELECT o_orderkey,
        |  CAST(date_diff('day', CAST(o_orderdate AS TIMESTAMP),
        |                 TIMESTAMP '2001-01-01') AS INTEGER) AS days_to_y2k1,
        |  CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS due_date,
        |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        T(s, dir, "orders")
          .filter(col("o_orderkey") <= 200)
          .select(col("o_orderkey"),
            datediff(lit("2001-01-01").cast("timestamp_ntz"), col("o_orderdate"))
              .as("days_to_y2k1"),
            (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
            unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_s"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofmonth(col("o_orderdate")).as("dom"))
          .orderBy("o_orderkey")
    },

    // ── array functions over the embedding vectors (scalar outputs only:
    //    array-valued result columns don't survive the pandas compare)
    QueryDef(
      "q66_array_fns",
      """WITH e AS (SELECT vec_id, embedding AS v, embedding::DOUBLE[] AS vd
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(v) AS INTEGER) AS dim,
        |  round(CAST(list_max(v) AS DOUBLE), 4) AS mx,
        |  CAST(list_position(v, list_max(v)) AS INTEGER) AS mx_pos,
        |  round(list_sum(vd[1:3]), 4) AS head3_sum,
        |  round(CAST(v[1] AS DOUBLE), 4) AS first_elem
        |FROM e ORDER BY vec_id""".stripMargin) { (s, dir) =>
      T(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"),
          transform(col("embedding"), _.cast("double")).as("vd"))
        .select(col("vec_id"),
          size(col("v")).as("dim"),
          round(array_max(col("v")).cast("double"), 4).as("mx"),
          array_position(col("v"), array_max(col("v"))).cast("int").as("mx_pos"),
          round(aggregate(slice(col("vd"), 1, 3), lit(0.0), _ + _), 4)
            .as("head3_sum"),
          round(element_at(col("v"), 1).cast("double"), 4).as("first_elem"))
        .orderBy("vec_id")
    },

    // ── argmax / boolean / conditional-count aggregates. max_by ordering
    //    key made unique (price-cents ⊕ orderkey) so both engines pick the
    //    same winner deterministically. The key is 128-bit (HUGEINT in
    //    DuckDB, DECIMAL(38,0) in Spark): cents·10¹⁸ + orderkey stays
    //    unique for any orderkey < 10¹⁸, i.e. at any realistic scale —
    //    a 64-bit key would let orderkey bleed into the price component
    //    past ~10⁷ orders.
    QueryDef(
      "q68_argmax_aggs",
      """SELECT o_orderpriority,
        |  max_by(o_orderkey, CAST(round(o_totalprice*100) AS HUGEINT)*1000000000000000000 + o_orderkey)
        |    AS priciest_order,
        |  min_by(o_orderkey, CAST(round(o_totalprice*100) AS HUGEINT)*1000000000000000000 + o_orderkey)
        |    AS cheapest_order,
        |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
        |  bool_or(o_totalprice > 500000) AS any_jumbo,
        |  bool_and(o_totalprice > 0) AS all_positive
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        // round() on BOTH sides before the cast: Spark cast truncates
        // toward zero while DuckDB's CAST rounds — explicit round makes
        // the ordering key identical in both engines
        val ord = round(col("o_totalprice") * 100).cast("decimal(20,0)") *
          lit("1000000000000000000").cast("decimal(19,0)") + col("o_orderkey")
        T(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            max_by(col("o_orderkey"), ord).as("priciest_order"),
            min_by(col("o_orderkey"), ord).as("cheapest_order"),
            count_if(col("o_orderstatus") === "F").as("n_finished"),
            bool_or(col("o_totalprice") > 500000).as("any_jumbo"),
            bool_and(col("o_totalprice") > 0).as("all_positive"))
          .orderBy("o_orderpriority")
    },

    // ── string toolbox: pad/trim/reverse/repeat/search
    QueryDef(
      "q69_string_toolbox",
      """SELECT doc_id,
        |  lpad(lang, 5, '*') AS lang_padded,
        |  rpad(source, 8, '.') AS src_padded,
        |  reverse(lang) AS lang_rev,
        |  repeat(lang, 2) AS lang_twice,
        |  CAST(strpos(text, 'spark') AS INTEGER) AS spark_pos,
        |  trim(substr(text, 1, 12)) AS head_trimmed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          lpad(col("lang"), 5, "*").as("lang_padded"),
          rpad(col("source"), 8, ".").as("src_padded"),
          reverse(col("lang")).as("lang_rev"),
          repeat(col("lang"), 2).as("lang_twice"),
          instr(col("text"), "spark").as("spark_pos"),
          trim(substring(col("text"), 1, 12)).as("head_trimmed"))
        .orderBy("doc_id")
    }
  )
}
