package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Dev-only: print schema + count for every test table, so parquet
  * type-mapping surprises (ns timestamps, NTZ inference, float arrays)
  * surface before queries are built on them. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      try {
        val df = Tables(spark, sfDir, t)
        println(s"== $t: ${df.count()} rows")
        df.schema.foreach(f => println(s"   ${f.name}: ${f.dataType.sql}"))
        df.show(2, 60, vertical = false)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
