package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, CacheRegistry, SparkEntry}

/** Measures the PEAK resident cache footprint of a Bench-ordered run —
  * the number the r9 gate failure turned on (the full session's resident
  * set vs the ~4.6 GiB storage pool of an 8g driver). Replays every
  * query in Bench's sorted order with Bench's scoped release plan
  * applied, sampling the block manager's cached-RDD totals after each
  * query; prints the peak (MiB in memory / on disk, and the query at
  * which it occurred) and the final resident set. Run with and without
  * `--no-release` to see what the scoped release plan saves.
  */
object CacheFootprint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val release = !args.contains("--no-release")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var peakMem = 0L; var peakDisk = 0L; var peakAt = ""
    def sample(name: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum
      val disk = infos.map(_.diskSize).sum
      if (mem + disk > peakMem + peakDisk) {
        peakMem = mem; peakDisk = disk; peakAt = name
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"[footprint] $name FAILED: $e") }
      // sample BEFORE the release: frames built and released within the
      // same query must count toward the peak, or the with-release
      // number silently excludes exactly the frames the plan touches
      sample(name)
      if (release) Bench.releaseAfter.getOrElse(name, Nil)
        .foreach(p => CacheRegistry.releaseByPrefix(spark, p))
    }
    def mib(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f MiB"
    println(s"[footprint] release=$release sf=$sfDir")
    println(s"[footprint] PEAK resident cache: mem=${mib(peakMem)} " +
      s"disk=${mib(peakDisk)} at $peakAt")
    println(s"[footprint] final resident entries:")
    spark.sparkContext.getRDDStorageInfo.sortBy(-_.memSize).take(20)
      .foreach { i =>
        println(f"[footprint]   ${mib(i.memSize)}%12s mem ${mib(i.diskSize)}%10s disk  ${i.name.take(80)}")
      }
    spark.stop()
  }
}
