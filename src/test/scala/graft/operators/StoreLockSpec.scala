package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{Graft, SparkTestBase}

/** Pins the advisory single-writer mutation lock (r17): every physical
  * store mutation (write/append/delete/compact, all three families)
  * runs under an exclusive `mutation-lock` sidecar, a concurrent
  * mutator fails LOUDLY naming the holder and the recovery, a crashed
  * mutation's lock blocks further mutations until fsck clears it, and
  * clean or failed mutations never leave a lock behind. */
class StoreLockSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-storelock").toString

  private val docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "gamma delta epsilon zeta"),
    (2L, "alpha alpha beta zeta")).toDF("doc_id", "text")

  private def lockPath(dir: String) = new Path(s"$dir/mutation-lock")
  private def fs(dir: String) = lockPath(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a mutation under a held lock is refused loudly, naming the " +
      "holder op and the fsck recovery; the holder's own release " +
      "re-admits mutations") {
    val idx = tmp()
    Search.searchIndexWrite(docs, idx)
    Stores.withStoreLock(spark, idx, "simulated-long-compact") {
      val e = intercept[IllegalStateException](
        Search.searchIndexAppend(
          Seq((7L, "eta theta iota")).toDF("doc_id", "text"), idx))
      assert(e.getMessage.contains("simulated-long-compact")
          && e.getMessage.contains("storeFsck"),
        s"the refusal must name the holder and the recovery: $e")
    }
    // lock released with the holder's block — the mutation now lands
    Search.searchIndexAppend(
      Seq((7L, "eta theta iota")).toDF("doc_id", "text"), idx)
    assert(!fs(idx).exists(lockPath(idx)),
      "a completed mutation must leave no lock behind")
  }

  test("every mutation family takes and releases the lock (no lock " +
      "survives a clean write/append/delete/compact on any store)") {
    val search = tmp(); val dedup = tmp(); val ann = tmp()
    Search.searchIndexWrite(docs, search)
    Search.searchIndexAppend(
      Seq((7L, "eta theta iota")).toDF("doc_id", "text"), search)
    Search.searchIndexDelete(spark, search, Seq(7L))
    Search.searchIndexCompact(spark, search)
    TextDedup.dedupIndexWrite(docs, dedup)
    TextDedup.dedupIndexAppend(
      Seq((7L, "eta theta iota kappa")).toDF("doc_id", "text"), dedup)
    TextDedup.dedupIndexDelete(spark, dedup, Seq(7L))
    TextDedup.dedupIndexCompact(spark, dedup)
    val vecs = Seq((0L, Seq(1.0, 0.0, 0.0, 1.0)),
        (1L, Seq(-9.0, -9.0, -9.0, -8.0)))
      .toDF("vec_id", "embedding")
    val coded = Similarity.int8CodedVectors(vecs, "vec_id", "embedding")
    Similarity.ivfPqIndexWrite(coded, ann, kIvf = 2, m = 2, subDim = 2,
      k = 2)
    Similarity.ivfPqIndexDelete(spark, ann, Seq(1L))
    Similarity.ivfPqIndexCompact(spark, ann)
    for (d <- Seq(search, dedup, ann))
      assert(!fs(d).exists(lockPath(d)), s"stale lock under $d")
  }

  test("a crashed mutation's lock blocks mutations until fsck clears " +
      "it; classify-only reports without clearing") {
    val idx = tmp()
    Search.searchIndexWrite(docs, idx)
    // simulate the crash: a lock left behind with no live holder
    fs(idx).create(lockPath(idx), false).close()
    intercept[IllegalStateException](
      Search.searchIndexDelete(spark, idx, Seq(0L)))
    val report = Graft.storeFsck(spark, idx, execute = false).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(report("mutation-lock") == "would clear",
      s"classify-only must not clear: $report")
    assert(fs(idx).exists(lockPath(idx)),
      "classify-only must leave the lock in place")
    val repaired = Graft.storeFsck(spark, idx).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(repaired("mutation-lock") == "cleared", s"$repaired")
    assert(!fs(idx).exists(lockPath(idx)), "execute must clear the lock")
    // the blocked mutation now proceeds
    Search.searchIndexDelete(spark, idx, Seq(0L))
  }

  test("a mutation that FAILS (exception, not crash) releases the " +
      "lock — the re-run the repair needs is never self-blocked") {
    val idx = tmp()
    Search.searchIndexWrite(docs, idx)
    // append against a store whose manifest the op rejects: corrupt
    // the tokenizer field so checkSearchManifest throws INSIDE the lock
    Stores.writeMetaSidecar(spark, s"$idx/manifest",
      Seq("n_buckets" -> "8", "tokenizer" -> "not-ws-split"))
    intercept[IllegalArgumentException](
      Search.searchIndexAppend(
        Seq((7L, "eta theta iota")).toDF("doc_id", "text"), idx))
    assert(!fs(idx).exists(lockPath(idx)),
      "a failed mutation must release the lock")
    // restore the manifest; the store mutates normally again
    Stores.writeMetaSidecar(spark, s"$idx/manifest",
      Seq("n_buckets" -> "8", "tokenizer" -> Search.SearchTokenizer))
    Search.searchIndexAppend(
      Seq((7L, "eta theta iota")).toDF("doc_id", "text"), idx)
  }
}
