package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException

import graft.SparkTestBase

/** End-to-end parity for the reference CLI: metadata.txt + CSVs in,
  * qualified header + comma-joined rows out, reference error paths. */
class CliSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("cli").toString
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

  test("projection prints qualified header + comma-joined rows") {
    val out = Cli.run(spark, dir, "SELECT A, C FROM table1 WHERE B >= 5;")
    assert(out.head == "table1.A,table1.C")
    assert(out.tail.sorted == Seq("4,6", "7,9"))
  }

  test("join output qualifies columns by their FROM table") {
    val out = Cli.run(spark, dir,
      "SELECT table1.A, table2.D FROM table1, table2 WHERE table1.B = table2.B ORDER BY A;")
    assert(out.head == "table1.A,table2.D")
    assert(out.tail == Seq("1,20", "7,80"))
  }

  test("aggregate prints the derived column name") {
    val out = Cli.run(spark, dir, "SELECT MAX(C) FROM table1;")
    assert(out == Seq("max(C)", "9"))
  }

  test("reference error paths: missing semicolon, unknown table/column") {
    intercept[IllegalArgumentException](
      Cli.run(spark, dir, "SELECT A FROM table1"))
    intercept[AnalysisException](
      Cli.run(spark, dir, "SELECT A FROM nosuch;"))
    intercept[AnalysisException](
      Cli.run(spark, dir, "SELECT Z FROM table1;"))
  }
}
