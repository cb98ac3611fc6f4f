package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Search

/** Pins the streaming half of the on-disk search index
  * (`searchIndexIngest`) — the lexical twin of DedupIngestSpec /
  * IndexIngestSpec, with the one extra obligation this store carries:
  * every committed batch must leave the corpus-global stats sidecar
  * reconciled (stats ≡ agg(docs/)), because BM25 weights every later
  * serve by it. Streamed batches append postings + doc lengths under
  * the frozen bucket geometry, the ingested index serves identically
  * to a one-shot rebuild, a checkpointed restart never double-appends,
  * and the batch-id ledger (not the offset log) skips an
  * already-marked batch id. */
class SearchIngestSpec extends SparkTestBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val resident = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "beta gamma delta epsilon zeta"))
  private val wave1 = Seq(
    (2L, "alpha alpha beta zeta eta"))
  private val wave2 = Seq(
    (3L, "gamma delta epsilon eta theta"),
    (4L, "alpha beta beta theta iota"))

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-search-ingest").toString

  private def docs(rows: Seq[(Long, String)]): Seq[DocRow] =
    rows.map { case (id, t) => DocRow(id, t) }

  private def serveAll(idx: String): Seq[String] =
    Search.searchIndexServe(spark, idx, Seq("alpha", "beta"), topK = 100)
      .collect().map(_.toString).toSeq

  test("streamed batches serve like a rebuild with reconciled stats; " +
      "a checkpointed restart does not re-append") {
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    Search.searchIndexWrite(docsDf(resident), idx, nBuckets = 4)
    val in = MemoryStream[DocRow]
    val q1 = Search.searchIndexIngest(in.toDF(), idx, ckpt)
    try {
      in.addData(docs(wave1): _*)
      q1.processAllAvailable()
      in.addData(docs(wave2): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val markers = new java.io.File(s"$idx/ingested").listFiles()
      .map(_.getName).toSet
    assert(markers == Set("batch-0", "batch-1"),
      s"each committed batch leaves its ledger marker: $markers")
    // restart from the SAME checkpoint: no re-append
    val q2 = Search.searchIndexIngest(in.toDF(), idx, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val all = resident ++ wave1 ++ wave2
    // the stats sidecar is reconciled after every committed batch —
    // the corpus-global invariant appends force on this store
    val st = graft.operators.Search.readSearchStats(spark, idx,
      graft.operators.Stores.currentGen(spark, idx))
    assert(st == ((all.size.toLong,
      all.map(_._2.split(" ").length.toLong).sum)),
      s"stats must equal the ingested docs aggregate: $st")
    // one dl row per doc — base + waves + restart, never doubled
    val perDoc = spark.read.schema("doc_id BIGINT, dl INT")
      .parquet(s"$idx/docs")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc.keySet == all.map(_._1).toSet &&
      perDoc.values.forall(_ == 1L),
      s"each doc must carry exactly one length row: $perDoc")
    // one-file-per-touched-bucket append discipline (r16 verdict #4):
    // the write lands one file per bucket and each committed batch adds
    // at most one more per bucket it touches — never shuffle.partitions
    // many — so ingest fragmentation grows ≤ batches, not × partitions
    val bktFiles = new java.io.File(s"$idx/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(bktFiles.nonEmpty &&
      bktFiles.values.forall(n => n >= 1 && n <= 3),
      s"per-bucket file count must grow <= 1 per committed batch " +
        s"(write + 2 batches => <= 3): $bktFiles")
    // the ingested index serves exactly like a one-shot rebuild
    val rebuilt = tmp()
    Search.searchIndexWrite(docsDf(all), rebuilt, nBuckets = 4)
    val got = serveAll(idx)
    assert(got.nonEmpty && got == serveAll(rebuilt),
      s"ingested index must serve like the rebuild:\n$got")
  }

  test("the batch-id ledger skips an already-marked batch id") {
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    Search.searchIndexWrite(docsDf(resident), idx, nBuckets = 4)
    val in = MemoryStream[DocRow]
    val q = Search.searchIndexIngest(in.toDF(), idx, ckpt)
    try {
      in.addData(docs(wave1): _*)
      q.processAllAvailable() // batch 0: applied
      assert(new java.io.File(s"$idx/ingested/batch-0").exists)
      new java.io.File(s"$idx/ingested/batch-1").mkdirs()
      in.addData(docs(wave2): _*)
      q.processAllAvailable() // batch 1: marker present → skipped
    } finally q.stop()
    val ids = spark.read.schema("doc_id BIGINT, dl INT")
      .parquet(s"$idx/docs")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(wave1.map(_._1).toSet.subsetOf(ids), s"batch 0 applied: $ids")
    assert(wave2.map(_._1).toSet.intersect(ids).isEmpty,
      s"the pre-marked batch must be skipped: $ids")
  }
}
