package graft.operators

import org.apache.spark.sql.functions._

import graft.{Graft, SparkTestBase}

/** Pins the EXECUTABLE crash repair (r16 verdict ask #3): every crash
  * window the stores' lifecycle scaladoc documents is reconstructed on
  * disk, [[Stores.storeFsck]] classifies and repairs it, and the
  * repaired store serves byte-identically to a clean rebuild over the
  * live corpus — the scaladoc recovery, as code, on all three stores.
  *
  * Crash states are constructed the honest way: a TWIN store built
  * from the same frozen derivation supplies REAL compacted scratch
  * (`searchIndexWrite`/`dedupIndexWrite` are deterministic over the
  * fixture), and `java.io.File` renames reproduce each interruption
  * point of the compact sequence exactly (the SearchIndexSpec crash-leg
  * technique). */
class StoreFsckSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fsck").toString

  private val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "beta gamma delta epsilon zeta"),
    (2L, "alpha alpha beta zeta eta"),
    (3L, "gamma delta epsilon eta theta"),
    (4L, "alpha beta beta theta iota"),
    (5L, "rare alpha beta gamma iota"))
  private val deleted = Seq(2L, 5L)
  private def docsDf = corpus.toDF("doc_id", "text")
  private def liveDf =
    corpus.filterNot(d => deleted.contains(d._1)).toDF("doc_id", "text")

  private def mv(dir: String, from: String, to: String): Unit =
    assert(new java.io.File(dir, from)
      .renameTo(new java.io.File(dir, to)), s"rename $from -> $to")
  private def mvAcross(fromDir: String, name: String, toDir: String,
      toName: String): Unit =
    assert(new java.io.File(fromDir, name)
      .renameTo(new java.io.File(toDir, toName)),
      s"rename $fromDir/$name -> $toDir/$toName")
  private def touch(dir: String, name: String): Unit = {
    new java.io.File(dir, name).createNewFile(); ()
  }
  private def exists(dir: String, name: String): Boolean =
    new java.io.File(dir, name).exists

  private def serveAll(idx: String): Seq[String] =
    Search.searchIndexServe(spark, idx, Seq("alpha", "beta"), topK = 100)
      .collect().map(_.toString).toSeq

  /** A search store with `deleted` tombstoned, plus REAL compacted
    * postings/docs scratch (harvested from an identically-derived twin
    * that ran the full compact), frozen at the given crash point. */
  private def searchCrashState(stage: String): (String, Seq[String]) = {
    val idx = tmp(); val twin = tmp()
    for (d <- Seq(idx, twin)) {
      Search.searchIndexWrite(docsDf, d)
      Search.searchIndexDelete(spark, d, deleted)
    }
    val expected = serveAll(idx) // tombstone-subtracted, pre-crash
    Search.searchIndexCompact(spark, twin)
    mvAcross(twin, "postings", idx, "postings-compact")
    mvAcross(twin, "docs", idx, "docs-compact")
    touch(idx, "compact-inflight")
    stage match {
      case "pre-rename" => // marker + scratch, store fully intact
      case "between-renames" =>
        mv(idx, "postings", "postings-retired")
      case "postings-swapped" =>
        mv(idx, "postings", "postings-retired")
        mv(idx, "postings-compact", "postings")
      case "retired-only" =>
        // defensive window: scratch lost, only the retired copy left
        mv(idx, "postings", "postings-retired")
        rmrf(new java.io.File(idx, "postings-compact"))
        rmrf(new java.io.File(idx, "docs-compact"))
    }
    (idx, expected)
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  for (stage <- Seq("pre-rename", "between-renames", "postings-swapped"))
    test(s"search fsck completes a compact crashed at '$stage' forward; " +
        "serving is unchanged and the sidecars are clean") {
      val (idx, expected) = searchCrashState(stage)
      val report = Graft.storeFsck(spark, idx)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(report("compact-inflight") == "forward-completed",
        s"fsck must roll the compact forward: $report")
      assert(serveAll(idx) == expected,
        "the repaired store must serve its pre-crash results")
      for (d <- Seq("compact-inflight", "postings-compact", "docs-compact",
          "postings-retired", "docs-retired", "tombstones"))
        assert(!exists(idx, d), s"$d must be reclaimed after fsck")
      // the compact applied the tombstones physically — stats agree
      val st = Search.readSearchStats(spark, idx)._1
      assert(st == corpus.size - deleted.size,
        s"stats must reflect the compacted live corpus: $st")
      // and a second fsck is a clean no-op
      val again = Graft.storeFsck(spark, idx)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(again.values.forall(a => a == "none"),
        s"fsck must be idempotent on a healthy store: $again")
    }

  test("search fsck falls back to the retired copy when the scratch " +
      "is lost, then recompacts — tombstones still apply") {
    val (idx, expected) = searchCrashState("retired-only")
    val report = Graft.storeFsck(spark, idx)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("compact-inflight") == "recompacted",
      s"the defensive window re-runs the full compact: $report")
    assert(serveAll(idx) == expected,
      "the recompacted store must serve its pre-crash results")
    assert(!exists(idx, "compact-inflight") && !exists(idx, "tombstones"),
      "the recompact clears the marker and applies the tombstones")
  }

  test("classify-only mode reports the window without touching the " +
      "store") {
    val (idx, _) = searchCrashState("between-renames")
    val report = Graft.storeFsck(spark, idx, execute = false)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("compact-inflight") == "would complete forward",
      s"classification must name the pending repair: $report")
    assert(exists(idx, "compact-inflight")
        && exists(idx, "postings-retired")
        && !exists(idx, "postings"),
      "execute=false must leave the crash state untouched")
  }

  test("search fsck repairs BOTH append-crash windows: orphaned " +
      "postings reclaimed, stale stats re-derived") {
    val idx = tmp()
    Search.searchIndexWrite(docsDf, idx)
    val expected = serveAll(idx)
    // window 1: postings landed, docs never did (orphan) — written
    // under its true term bucket, as a real torn append would land
    Seq((999999L, "alpha", 3)).toDF("doc_id", "term", "tf")
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(8L)).cast("int"))
      .repartition(1)
      .write.mode("append").partitionBy("bkt").parquet(s"$idx/postings")
    // window 2: stats overwritten behind docs/ (the crash-after-docs
    // shape: stats no longer equals the docs aggregate)
    Search.writeSearchStats(spark, idx, 1L, 1L)
    val report = Graft.storeFsck(spark, idx)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("stats").startsWith("re-derived"),
      s"stale stats must be re-derived from docs/: $report")
    assert(report("orphan-postings").startsWith("compacted"),
      s"orphans must be reclaimed by compaction: $report")
    assert(serveAll(idx) == expected,
      "the repaired store must serve exactly the clean-store results")
    val orphan = spark.read
      .schema("doc_id BIGINT, term STRING, tf INT, bkt INT")
      .parquet(s"$idx/postings")
      .filter(col("doc_id") === 999999L).count()
    assert(orphan == 0, "the orphan row must be physically gone")
  }

  test("duplicate ids are reported, never silently rewritten — the " +
      "repair needs the source batch") {
    val idx = tmp()
    val (a, b) = corpus.splitAt(4)
    Search.searchIndexWrite(a.toDF("doc_id", "text"), idx)
    Search.searchIndexAppend(b.toDF("doc_id", "text"), idx)
    // violate the unique-id contract: replay the append (the ingest
    // at-least-once window)
    Search.searchIndexAppend(b.toDF("doc_id", "text"), idx)
    val rows = Graft.storeFsck(spark, idx).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("dup-ids")._1.contains(s"${b.size} ids"),
      s"fsck must count the replayed ids: ${rows("dup-ids")}")
    assert(rows("dup-ids")._2.startsWith("report-only"),
      "dup repair needs the source — fsck must not guess")
    val dupRows = spark.read.schema("doc_id BIGINT, dl INT")
      .parquet(s"$idx/docs")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupRows == b.size.toLong,
      "report-only: the duplicate rows must still be present")
  }

  test("dedup fsck completes a half-swapped compact; serving verdicts " +
      "are unchanged") {
    val idx = tmp(); val twin = tmp()
    for (d <- Seq(idx, twin)) {
      TextDedup.dedupIndexWrite(docsDf, d)
      TextDedup.dedupIndexDelete(spark, d, deleted)
    }
    def verdicts(d: String): Seq[String] =
      TextDedup.dedupIndexServe(
          Seq((100L, corpus(2)._2), (101L, "wholly novel text run"))
            .toDF("doc_id", "text"), d)
        .collect().map(_.toString).toSeq
    val expected = verdicts(idx)
    TextDedup.dedupIndexCompact(spark, twin)
    mvAcross(twin, "bands", idx, "bands-compact")
    touch(idx, "compact-inflight")
    mv(idx, "bands", "bands-retired") // crash between the renames
    val report = Graft.storeFsck(spark, idx)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("compact-inflight") == "forward-completed", s"$report")
    assert(verdicts(idx) == expected,
      "the repaired dedup store must serve its pre-crash verdicts")
    for (d <- Seq("compact-inflight", "bands-compact", "bands-retired",
        "tombstones"))
      assert(!exists(idx, d), s"$d must be reclaimed after fsck")
  }

  test("ANN fsck completes a half-swapped compact; the served top-k " +
      "is unchanged") {
    def codesDf =
      ((0L to 1L).map(i => (i, Seq(0.0, 0.0, 0.0, 1.0 + i))) ++
        (2L to 6L).map(i => (i, Seq(-90.0, -90.0, -90.0, -90.0 - i % 3))) ++
        (7L to 12L).map(i => (i, Seq(80.0, 80.0, 80.0, 80.0 + i % 4))))
        .toDF("vec_id", "emb")
    val idx = tmp(); val twin = tmp()
    for (d <- Seq(idx, twin)) {
      Graft.annIndexWrite(codesDf, "vec_id", "emb", d,
        kIvf = 2, m = 2, subDim = 2, k = 3)
      Graft.annIndexDelete(spark, d, Seq(9L))
    }
    def serve(d: String): Seq[String] =
      Graft.annIndexServe(codesDf, "vec_id", "emb", d, queryId = 8L,
          nprobe = 2, m = 2, subDim = 2, coarseK = 50, topK = 5)
        .collect().map(_.toString).toSeq
    val expected = serve(idx)
    assert(!expected.exists(_.startsWith("[9,")),
      "fixture: vec 9 must be tombstoned out pre-crash")
    Graft.annIndexCompact(spark, twin)
    mvAcross(twin, "enc", idx, "enc-compact")
    touch(idx, "compact-inflight")
    mv(idx, "enc", "enc-retired") // crash between the renames
    val report = Graft.storeFsck(spark, idx)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("compact-inflight") == "forward-completed", s"$report")
    assert(serve(idx) == expected,
      "the repaired ANN store must serve its pre-crash top-k")
    for (d <- Seq("compact-inflight", "enc-compact", "enc-retired",
        "tombstones"))
      assert(!exists(idx, d), s"$d must be reclaimed after fsck")
  }

  test("storeFsck refuses a directory that is not a graft store") {
    val e = intercept[IllegalArgumentException](
      Graft.storeFsck(spark, tmp()))
    assert(e.getMessage.contains("not a graft store"), e.getMessage)
  }
}
