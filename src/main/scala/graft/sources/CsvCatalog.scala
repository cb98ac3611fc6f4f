package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The reference engine's native input format: a `metadata.txt` catalog
  * (`<begin_table>` / table name / column names / `<end_table>` blocks)
  * over one integer CSV file per table, values optionally quoted.
  * [R] Mini_SQL_Engine metadata.txt + table*.csv (SURVEY.md §1).
  *
  * This source lets a reference user point the engine at their existing
  * data unchanged: `CsvCatalog.register` gives temp views, after which
  * every reference query runs via `spark.sql` (Catalyst supplies the
  * validation the reference hand-rolled: unknown table/column →
  * AnalysisException, same failure class as the reference's error path).
  *
  * Scale note: explicit schema (all BIGINT) keeps the CSV scan
  * single-pass (no inference read), and csv scans parallelize by file
  * split exactly like parquet — though production data should be
  * converted to parquet for pushdown + column pruning.
  */
object CsvCatalog {

  /** table → ordered column names, as declared in metadata.txt. */
  def parseMetadata(text: String): Map[String, Seq[String]] = {
    val entries = Map.newBuilder[String, Seq[String]]
    var current: Option[String] = None
    var cols = List.empty[String]
    text.linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
      case "<begin_table>" => current = None; cols = Nil
      case "<end_table>" =>
        current.foreach(t => entries += t -> cols.reverse)
        current = None
      case line if current.isEmpty => current = Some(line)
      case line => cols ::= line
    }
    entries.result()
  }

  /** Load one table: integer CSV, no header, columns per the catalog.
    * Quoted values ("123") are handled by the csv reader natively. */
  def load(spark: SparkSession, dataDir: String, table: String,
      catalog: Map[String, Seq[String]]): DataFrame = {
    val cols = catalog.getOrElse(table,
      throw new IllegalArgumentException(s"table '$table' not in metadata.txt"))
    val schema = StructType(cols.map(c => StructField(c, LongType, nullable = false)))
    spark.read.schema(schema).csv(s"$dataDir/$table.csv")
  }

  /** Parse metadata.txt in `dataDir`, register every table as a temp view;
    * returns the catalog. After this, reference queries run via spark.sql. */
  def register(spark: SparkSession, dataDir: String): Map[String, Seq[String]] = {
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dataDir/metadata.txt")), "UTF-8")
    val catalog = parseMetadata(meta)
    catalog.keys.foreach { t =>
      load(spark, dataDir, t, catalog).createOrReplaceTempView(t)
    }
    catalog
  }
}
