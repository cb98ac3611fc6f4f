package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the round-19/20 absorbed-bootstrap JOB-COUNT cuts so they
  * cannot silently rot: the r19 cut removed whole CLASSES of overhead
  * jobs (model-frame schema-inference reads, un-hinted tiny-join
  * broadcasts inside one-partition bootstraps, separate
  * stats/bounds/isEmpty aggregates folded into shared actions) from
  * every disk-store first touch — q187 53 → 29 scheduler jobs at
  * sf0.1, q186 29 → 19, q182 18 → 12, q185 12 → 10, q164 23 → 18 —
  * and r20 added the pair store whose first touch (q188) replaces the
  * 21-job LSH chain rebuild for audit consumers. A regression
  * re-introducing any class adds jobs in steps of ~2–8; each bound
  * carries headroom for AQE's data-dependent wobble at fixture scale
  * but not for a class coming back. Job counts are deterministic for
  * a fixed (data, config) — the JobCount tool's standing rationale —
  * and every pin here runs against cold memos and a cold registry
  * exactly like the tool's standalone measurement. Only q187 was
  * pinned in r19; the r19 verdict's ask #3 extends the pin to every
  * query the cut touched (a schema-inference read or un-gated
  * broadcast regressing in ANY of them must fail `sbt test`, not the
  * round). Bounds are measured at sf0.001 in THIS spec's context
  * (cold everything, tables pre-resolved) + ~5 headroom.
  */
class JobShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** First-touch scheduler-job count of `name` against cold memos and
    * a cold registry, tables pre-resolved (the PlanConstructionSpec
    * warm-up discipline), listener drained to quiescence. */
  private def firstTouchJobs(name: String): Int = {
    CacheRegistry.clear(spark)
    graft.operators.Similarity.resetDiskIndexMemo()
    graft.operators.TextDedup.resetDiskDedupMemo()
    graft.operators.TextDedup.resetDiskAuditMemo()
    graft.operators.Search.resetDiskSearchMemo()
    Tables.names.foreach(Tables(spark, dir, _))
    val jobs = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries(name)(spark, dir).count()
      // listener events drain asynchronously — poll until quiet
      var settled = 0
      var last = -1
      while (settled < 4) {
        Thread.sleep(250)
        val now = jobs.get
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
      jobs.get
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      CacheRegistry.clear(spark)
      graft.operators.Similarity.resetDiskIndexMemo()
      graft.operators.TextDedup.resetDiskDedupMemo()
      graft.operators.TextDedup.resetDiskAuditMemo()
      graft.operators.Search.resetDiskSearchMemo()
    }
  }

  private def pin(name: String, bound: Int, rationale: String): Unit =
    test(s"$name first-touch schedules at most $bound jobs " +
        s"($rationale)") {
      val n = firstTouchJobs(name)
      info(s"$name first-touch jobs: $n")
      assert(n <= bound,
        s"$name first-touch scheduled $n jobs (bound $bound) — an " +
          "overhead-job class (schema-inference read, tiny-bootstrap " +
          "broadcast, separate stats/bounds aggregate) likely " +
          s"regressed; run tools.JobTrace $name to name the new jobs")
    }

  pin("q187_coord_takedown", 33,
    "r19 cut 53 → 29 at sf0.1; r22 folds the takedown bounds " +
      "aggregate into the id pin's observed metrics — 28 measured here")
  pin("q186_rag_fuse_disk", 24, "r19 cut: 29 → 19 at sf0.1; 18 here")
  pin("q182_ivfpq_disk", 17, "r19 cut: 18 → 12 at sf0.1; 11 here")
  pin("q185_bm25_disk", 15, "r19 cut: 12 → 10 at sf0.1; 9 here")
  pin("q164_nb_source", 28, "r19 cut: 23 → 18 at sf0.1; 23 here — " +
    "the fixture-scale LM branch schedules more, bound = here + 5")
  pin("q188_disk_lsh_audit", 18,
    "the r20 pair store: first touch reads the store instead of " +
      "rebuilding the 21-job LSH chain; 13 measured here")
  // the r20 verdict's ask #4: the deep-chain class gets drift pins
  // too — a schema-inference read or un-gated broadcast creeping into
  // the chain must fail `sbt test`, not surface as a judged-line
  // mystery. After the r21 store rewiring q117's first touch IS the
  // store build + serve and q121's candidate graph reads the store.
  pin("q117_lsh_recall", 19,
    "r21 rewiring: first touch = pair-store build + audit serve " +
      "(was the 21-job chain at sf0.1); 14 measured here")
  pin("q121_pagerank_neardup", 24,
    "r21 rewiring: store-fed candidate graph + 2 structure pins + 3 " +
      "unrolled rounds (was 19 at sf0.1); 19 measured here")
  pin("q134_session_cooccurrence", 17,
    "the r20-traced floor: cache build + pair join + top-k, every " +
      "exchange semantically required; 12 measured here")
}
