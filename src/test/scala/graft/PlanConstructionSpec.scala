package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the rule QueryDef documents: query CONSTRUCTORS are plan
  * definitions, not executions — building a plan launches no Spark
  * jobs, so `Bench.deriveReleasePlan`, the release spec, and any plan
  * audit can replay construction for free and Bench's timed/untimed
  * boundary stays sharp.
  *
  * The declared exceptions, each eager BY DESIGN (not by accident), are
  * pinned exactly so a new offender cannot hide behind them:
  *  - q109_jdbc_roundtrip: the query IS the connector roundtrip — the
  *    Derby write plus the stride-bounds row must happen before the
  *    partitioned read-back plan exists;
  *  - q110_column_stats: ANALYZE TABLE runs its stats scans so the
  *    catalog read-back has something to read;
  *  - q173_cluster_rep: first consumer (in sorted order) of the shared
  *    dup-cc cache, whose connected-components build converges by
  *    driver-read changed-counts — the loop runs to build the final
  *    plan (q89/q174/q175 then ride the cache job-free);
  *  - q121_pagerank_neardup / q135_kmeans: iterative plans that
  *    localCheckpoint their loop-invariant structure (eager by Spark's
  *    API) so unrolled iterations don't replay it;
  *  - q182_ivfpq_disk / q183_ivfpq_filtered: the on-disk serving path
  *    is construction-eager BY CONTRACT (ivfPqIndexServe scaladoc) —
  *    first touch writes the index directory once per corpus
  *    (diskIndexDir), and every serve runs the manifest check plus the
  *    driver-side probed-cells argmin that becomes the plan's literal
  *    PartitionFilters;
  *  - q184_disk_incremental_dedup: same contract on the text store —
  *    first touch writes the band-partitioned signature store once per
  *    corpus (diskDedupDir), and every serve runs the geometry
  *    manifest check;
  *  - q185_bm25_disk: same contract on the search index — first touch
  *    writes the term-bucketed postings store (diskSearchDir), and
  *    every serve runs the manifest check plus the driver-side
  *    term-bucket hash that becomes the plan's PartitionFilters;
  *  - q186_rag_fuse_disk: the three-store capstone composes BOTH
  *    serving contracts — first touch writes the chunk-level search
  *    index (diskChunkSearchDir) and rides q182's ANN index memo, and
  *    the serve runs both manifest checks plus both driver-side
  *    probe/bucket lists;
  *  - q187_coord_takedown: the coordinated-lifecycle twin — first
  *    touch builds its OWN two-store layout through the mutation ops
  *    (partial writes, a ledgered appendAll, a takedownAll whose id
  *    slice is a driver collect), and the serve adds the cross-store
  *    version-alignment read on top of q186's eager set;
  *  - q117_lsh_recall: owns the pair-store build since the r21
  *    rewiring — the jaccard-pairs/lsh-cand registry caches read
  *    THROUGH the on-disk audit store (diskAuditDir), and q117 is the
  *    chain's first consumer in sorted order, so its construction
  *    writes the bucket-partitioned verified-pair + candidate store
  *    once per corpus. q188 consequently constructs JOB-FREE here:
  *    its serve is a memo hit + a driver-side manifest/generation
  *    read + two declared-schema scans.
  * Table RESOLUTION (parquet footer/schema read on a table's first
  * touch) also runs small jobs; it is the memoized metastore role, not
  * a query cost, and the spec pre-resolves every table so those jobs
  * never charge to a constructor.
  *
  * The jaccard-pairs adaptive branch probe — the one data-dependent
  * constructor — is gated behind TextDedup.BranchConf; this spec pins
  * both that the pinned branches construct job-free AND that the two
  * branches consume identical cache keys, which is what makes
  * deriveReleasePlan's branch pinning (and its sf0.001-vs-sf0.1
  * scale-invariance assumption) sound.
  */
class PlanConstructionSpec extends SparkTestBase {

  private val eagerByDesign = Set(
    "q109_jdbc_roundtrip", "q110_column_stats",
    "q173_cluster_rep", "q121_pagerank_neardup", "q135_kmeans",
    "q182_ivfpq_disk", "q183_ivfpq_filtered",
    "q184_disk_incremental_dedup", "q185_bm25_disk",
    "q186_rag_fuse_disk", "q187_coord_takedown",
    "q117_lsh_recall")

  private val TagProp = "graft.construct.query"

  test("constructing every plan launches zero jobs outside the declared eager set") {
    CacheRegistry.clear(spark)
    val sc = spark.sparkContext
    val dir = "/root/testdata/sf0.001"
    // metastore warm-up: resolve every table first, so first-touch
    // schema-read jobs don't charge to whichever query reads it first
    Tables.names.foreach(Tables(spark, dir, _))
    val jobsByQuery = new ConcurrentHashMap[String, Integer]()
    val listener = new SparkListener {
      // attribution via the submit-time local property, NOT a shared
      // var read at (async) delivery time — delivery can lag a query
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val q = Option(s.properties.getProperty(TagProp)).getOrElse("untagged")
        jobsByQuery.merge(q, 1, (a, b) => a + b)
      }
    }
    sc.addSparkListener(listener)
    // replay against COLD disk-index memos (the deriveReleasePlan
    // discipline): a store built by an earlier suite in the same
    // session would memo-hit here and skip its build jobs, flipping
    // the eager set's exact-equality pin on suite order
    graft.operators.Similarity.resetDiskIndexMemo()
    graft.operators.TextDedup.resetDiskDedupMemo()
    graft.operators.TextDedup.resetDiskAuditMemo()
    graft.operators.Search.resetDiskSearchMemo()
    val bc = graft.operators.TextDedup.BranchConf
    spark.conf.set(bc, "count")
    // pin the LM broadcast branch the same way: auto's one-time doc
    // count is a (memoized) constructor job this spec must not charge
    // to whichever LM query constructs first
    val lmc = graft.operators.Curation.LmBroadcastConf
    spark.conf.set(lmc, "on")
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        sc.setLocalProperty(TagProp, name)
        fn(spark, dir)
      }
      sc.setLocalProperty(TagProp, null)
      // jobs start synchronously inside the constructors; listener
      // delivery is async — poll until the count quiesces
      var prev = -1
      var same = 0
      while (same < 3) {
        val now = jobsByQuery.values().stream().mapToInt(_.intValue).sum
        if (now == prev) same += 1 else { same = 0; prev = now }
        Thread.sleep(200)
      }
    } finally {
      spark.conf.unset(bc)
      spark.conf.unset(lmc)
      sc.setLocalProperty(TagProp, null)
      sc.removeSparkListener(listener)
    }
    val offenders = jobsByQuery.keySet().toArray.map(_.toString).toSet
    assert(offenders == eagerByDesign,
      s"constructor-time Spark jobs drifted — job-free construction is a " +
        s"standing rule (QueryDef scaladoc): unexpected=" +
        s"${(offenders -- eagerByDesign).toSeq.sorted.mkString(",")} " +
        s"missing=${(eagerByDesign -- offenders).toSeq.sorted.mkString(",")}")
    CacheRegistry.clear(spark)
  }

  test("jaccard branch gate: both branches consume identical cache keys") {
    val bc = graft.operators.TextDedup.BranchConf
    def keysUnder(branch: String): Set[String] = {
      CacheRegistry.clear(spark)
      // cold audit-store memo per branch: the jaccard-pairs cache reads
      // through the store since r21, so a memo left warm by the other
      // branch (or another suite) would skip the build's nested
      // shingles/minhash-sig accesses and fake a key divergence
      graft.operators.TextDedup.resetDiskAuditMemo()
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      spark.conf.set(bc, branch)
      try CacheRegistry.withAccessHook(
        (k: String) => seen += k.takeWhile(_ != ':')) {
        SparkEntry.queries("q42_jaccard_pairs")(spark, "/root/testdata/sf0.001")
      } finally spark.conf.unset(bc)
      seen.toSet
    }
    val ck = keysUnder("count")
    val pk = keysUnder("prefix")
    assert(ck == pk,
      s"branch cache keys diverge (count=$ck prefix=$pk) — " +
        "deriveReleasePlan's branch pinning would derive a wrong lifecycle")
    CacheRegistry.clear(spark)
  }

  test("withAccessHook fails fast when already armed") {
    CacheRegistry.withAccessHook((_: String) => ()) {
      intercept[IllegalArgumentException] {
        CacheRegistry.withAccessHook((_: String) => ())(())
      }
    }
  }
}
