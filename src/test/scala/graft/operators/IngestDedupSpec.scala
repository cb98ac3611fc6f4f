package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** q156's incremental ingest dedup must agree with the full-corpus LSH
  * candidate generator: restricting the all-pairs band-collision set to
  * (new, resident) pairs and counting residents per new doc is exactly
  * the report the incremental path produces — proving the batch-vs-
  * incremental split loses no candidate and invents none. */
class IngestDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q156 equals the full-corpus pair set restricted to new x resident") {
    val gates = TextDedup.docShingles(spark, sf)
      .select($"doc_id",
        graft.plans.HexWindowToLong.md5Bucket($"doc_id", 100).as("bk"))
      .as[(Long, Long)].collect().toMap
    val newIds = gates.filter(_._2 >= 95).keySet
    // full-corpus candidate pairs (doc_i < doc_j), reduced to new-old
    val pairs = TextDedup.lshCandidatePairs(spark, sf)
      .as[(Long, Long)].collect()
    val dupCount = pairs.flatMap { case (i, j) =>
      val (ni, nj) = (newIds.contains(i), newIds.contains(j))
      if (ni && !nj) Some(i -> j) else if (nj && !ni) Some(j -> i) else None
    }.groupBy(_._1).map { case (d, os) => d -> os.map(_._2).distinct.size }
    val expected = newIds.toSeq.sorted.map { d =>
      val n = dupCount.getOrElse(d, 0)
      (d, n, if (n > 0) "reject" else "admit")
    }
    val got = SparkEntry.queries("q156_incremental_dedup")(spark, sf)
      .as[(Long, Int, String)].collect().toSeq
    assert(got == expected,
      "incremental verdicts must match the restricted full-corpus pairs")
    assert(got.exists(_._3 == "reject") && got.exists(_._3 == "admit"),
      "gate must produce both verdicts or the fixture is vacuous")
  }
}
