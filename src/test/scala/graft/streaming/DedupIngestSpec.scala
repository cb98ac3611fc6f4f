package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextDedup

/** Rows fed to the dedup ingest stream: id + text. */
case class DocRow(doc_id: Long, text: String)

/** Pins the streaming half of the on-disk LSH signature store
  * (`dedupIndexIngest`) — the text twin of IndexIngestSpec: streamed
  * batches append band rows under the frozen geometry, the ingested
  * store serves identically to a rebuild, a checkpointed restart never
  * double-appends, and the batch-id ledger (not the offset log) skips
  * an already-marked batch id. */
class DedupIngestSpec extends SparkTestBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val resident = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "pack my box with five dozen liquor jugs right now"))
  private val wave1 = Seq(
    (2L, "sphinx of black quartz judge my vow said the king"))
  private val wave2 = Seq(
    (3L, "pack my box with five dozen liquor jugs right now"),
    (4L, "how vexingly quick daft zebras jump over a fence"))
  private val batch = Seq(
    (9L, "sphinx of black quartz judge my vow said the king"),
    (10L, "a wholly novel sentence matching no resident doc at all"))

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-ingest").toString

  private def docs(rows: Seq[(Long, String)]): Seq[DocRow] =
    rows.map { case (id, t) => DocRow(id, t) }

  test("streamed batches serve like a rebuild; a checkpointed restart " +
      "does not re-append") {
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    TextDedup.dedupIndexWrite(docsDf(resident), idx)
    val in = MemoryStream[DocRow]
    val q1 = TextDedup.dedupIndexIngest(in.toDF(), idx, ckpt)
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
    val q2 = TextDedup.dedupIndexIngest(in.toDF(), idx, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    // every doc carries exactly 4 band rows — base + waves + restart
    val perDoc = spark.read
      .schema("doc_id BIGINT, bv STRING, band INT")
      .parquet(s"$idx/bands")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val all = resident ++ wave1 ++ wave2
    assert(perDoc.keySet == all.map(_._1).toSet &&
      perDoc.values.forall(_ == 4L),
      s"each doc must carry exactly 4 band rows: $perDoc")
    // the ingested store serves exactly like a one-shot rebuild
    val rebuilt = tmp()
    TextDedup.dedupIndexWrite(docsDf(all), rebuilt)
    def serveFrom(d: String): Seq[(Long, Int, String)] =
      TextDedup.dedupIndexServe(docsDf(batch), d)
        .as[(Long, Int, String)].collect().toSeq
    val got = serveFrom(idx)
    assert(got.nonEmpty && got == serveFrom(rebuilt),
      s"ingested store must serve like the rebuild: $got")
    // the streamed twin of doc 2 must reject against it, the novel
    // doc must admit — both verdict kinds ride the streamed state
    assert(got.contains((9L, 1, "reject")) &&
      got.contains((10L, 0, "admit")), s"verdicts: $got")
  }

  test("the batch-id ledger skips an already-marked batch id") {
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    TextDedup.dedupIndexWrite(docsDf(resident), idx)
    val in = MemoryStream[DocRow]
    val q = TextDedup.dedupIndexIngest(in.toDF(), idx, ckpt)
    try {
      in.addData(docs(wave1): _*)
      q.processAllAvailable() // batch 0: applied
      assert(new java.io.File(s"$idx/ingested/batch-0").exists)
      new java.io.File(s"$idx/ingested/batch-1").mkdirs()
      in.addData(docs(wave2): _*)
      q.processAllAvailable() // batch 1: marker present → skipped
    } finally q.stop()
    val ids = spark.read
      .schema("doc_id BIGINT, bv STRING, band INT")
      .parquet(s"$idx/bands")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(wave1.map(_._1).toSet.subsetOf(ids), s"batch 0 applied: $ids")
    assert(wave2.map(_._1).toSet.intersect(ids).isEmpty,
      s"the pre-marked batch must be skipped: $ids")
  }
}
