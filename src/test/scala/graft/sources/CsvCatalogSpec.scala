package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException

import graft.SparkTestBase

/** Drives the reference's native format end-to-end: metadata.txt + quoted
  * integer CSVs → temp views → the reference's own query shapes via
  * spark.sql, including its error paths (unknown table/column). */
class CsvCatalogSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("csvcat").toString
    Files.writeString(java.nio.file.Paths.get(s"$d/metadata.txt"),
      """<begin_table>
        |table1
        |A
        |B
        |C
        |<end_table>
        |<begin_table>
        |table2
        |B
        |D
        |<end_table>
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$d/table1.csv"),
      "1,2,3\n4,\"5\",6\n7,8,9\n")
    Files.writeString(java.nio.file.Paths.get(s"$d/table2.csv"),
      "2,20\n8,80\n")
    d
  }

  test("metadata.txt parses into ordered catalog") {
    val cat = CsvCatalog.parseMetadata(
      Files.readString(java.nio.file.Paths.get(s"$dir/metadata.txt")))
    assert(cat == Map("table1" -> Seq("A", "B", "C"), "table2" -> Seq("B", "D")))
  }

  test("reference query shapes run over registered views") {
    CsvCatalog.register(spark, dir)
    // projection + filter (quoted "5" parsed as int)
    assert(spark.sql("SELECT A, B FROM table1 WHERE B >= 5")
      .collect().map(_.toSeq.toList).toList == List(List(4L, 5L), List(7L, 8L)))
    // aggregate
    assert(spark.sql("SELECT MAX(C) FROM table1").head().getLong(0) == 9L)
    // equi-join on the shared column, reference style
    assert(spark.sql(
      """SELECT table1.A, table2.D FROM table1, table2
        |WHERE table1.B = table2.B ORDER BY A""".stripMargin)
      .collect().map(_.toSeq.toList).toList ==
      List(List(1L, 20L), List(7L, 80L)))
    // DISTINCT
    assert(spark.sql("SELECT DISTINCT B FROM table2").count() == 2)
  }

  test("reference error paths: unknown table/column reject cleanly") {
    CsvCatalog.register(spark, dir)
    intercept[AnalysisException](spark.sql("SELECT * FROM nosuch").collect())
    intercept[AnalysisException](spark.sql("SELECT Z FROM table1").collect())
    intercept[IllegalArgumentException](
      CsvCatalog.load(spark, dir, "nosuch", Map("table1" -> Seq("A"))))
  }
}
