package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the round-19 absorbed-bootstrap JOB-COUNT cut so it cannot
  * silently rot: q187's first touch (the full two-store coordinated
  * lifecycle — writes, ledgered append, frame takedown, compacts —
  * plus the composed serve) went 53 → 29 scheduler jobs at sf0.1 by
  * removing whole CLASSES of overhead jobs (model-frame
  * schema-inference reads, un-hinted tiny-join broadcasts inside
  * one-partition bootstraps, separate stats/bounds/isEmpty
  * aggregates folded into shared actions). A regression
  * re-introducing any class adds jobs in steps of ~2–8; the bound
  * here carries enough headroom for AQE's data-dependent wobble at
  * fixture scale but not for a class coming back. Job counts are
  * deterministic for a fixed (data, config) — the JobCount tool's
  * standing rationale — and this spec runs against cold memos and a
  * cold registry exactly like the tool's standalone measurement. */
class JobShapeSpec extends SparkTestBase {

  test("q187 first-touch schedules at most 34 jobs (the r19 cut, " +
      "with wobble headroom — 53 before the cut)") {
    CacheRegistry.clear(spark)
    graft.operators.Similarity.resetDiskIndexMemo()
    graft.operators.TextDedup.resetDiskDedupMemo()
    graft.operators.Search.resetDiskSearchMemo()
    val dir = "/root/testdata/sf0.001"
    // metastore warm-up outside the counted window (the
    // PlanConstructionSpec discipline)
    Tables.names.foreach(Tables(spark, dir, _))
    val jobs = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("q187_coord_takedown")(spark, dir).count()
      // listener events drain asynchronously — poll until quiet
      var settled = 0
      var last = -1
      while (settled < 4) {
        Thread.sleep(250)
        val now = jobs.get
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
      val n = jobs.get
      info(s"q187 first-touch jobs: $n")
      assert(n <= 34,
        s"q187 first-touch scheduled $n jobs — the r19 cut bounded " +
          "this at ~29 (sf0.1) by killing schema-inference reads, " +
          "tiny-bootstrap broadcasts, and separate stats/bounds " +
          "aggregates; a count this high means one of those classes " +
          "regressed (run tools.JobTrace q187_coord_takedown to name " +
          "the new jobs)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      CacheRegistry.clear(spark)
      graft.operators.Similarity.resetDiskIndexMemo()
      graft.operators.TextDedup.resetDiskDedupMemo()
      graft.operators.Search.resetDiskSearchMemo()
    }
  }
}
