package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench

/** Prints the cache release plan derived from the REAL query definitions
  * (see [[graft.Bench.deriveReleasePlan]]) as Scala source, ready to
  * paste into `Bench.releaseAfter` whenever the inventory changes. The
  * `BenchReleaseSpec` gate fails until the pasted map matches, so the
  * hand-copied plan can never silently drift from the code.
  */
object ReleasePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = Bench.deriveReleasePlan(spark,
      args.headOption.getOrElse("/root/testdata/sf0.001"))
    println("  val releaseAfter: Map[String, Seq[String]] = Map(")
    plan.toSeq.sortBy(_._1).foreach { case (q, keys) =>
      println(s"""    "$q" -> Seq(${keys.sorted.map("\"" + _ + "\"").mkString(", ")}),""")
    }
    println("  )")
    spark.stop()
  }
}
