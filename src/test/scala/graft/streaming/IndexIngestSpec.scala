package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Rows fed to the ingest stream: id + integer vector (the
  * DiskIndexSpec corpus shape). */
case class VecRow(vec_id: Long, codes: Seq[Long])

/** Pins the streaming half of the on-disk ANN index lifecycle
  * (`ivfPqIndexIngest`): micro-batches append under the frozen-model
  * contract, ingested content serves identically to a frozen-model
  * rebuild, a checkpointed restart never double-appends a committed
  * batch, and the batch-id ledger — not Spark's offset log — is what
  * skips an already-applied batch id (the replay guard the at-least-
  * once crash-window note on the operator rests on). */
class IndexIngestSpec extends SparkTestBase {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  // the DiskIndexSpec haloes: resident corpus 2..12, streamed deltas
  // are the near-origin rows plus a third halo row wave
  private val resident = ((2L to 6L).map(i =>
      (i, Seq(-90L, -90L, -90L, -90L - i % 3))) ++
    (7L to 10L).map(i => (i, Seq(80L, 80L, 80L, 80L + i % 4)))).toSeq
  private val wave1 = Seq((0L, Seq(0L, 0L, 0L, 1L)),
    (1L, Seq(0L, 0L, 0L, 2L)))
  private val wave2 = (11L to 12L).map(i =>
    (i, Seq(80L, 80L, 80L, 80L + i % 4))).toSeq

  private def codesDf(rows: Seq[(Long, Seq[Long])]): DataFrame =
    rows.toDF("vec_id", "codes")
      .withColumn("v", transform(col("codes"), _.cast("double")))
      .withColumn("nrm", norm(col("v")))

  /** The same (vec_id, codes) → (…, v, nrm) prep as a STREAMING
    * transform — narrow column ops only, so it rides the micro-batch
    * plan untouched. */
  private def codesStream(df: DataFrame): DataFrame =
    df.withColumn("v", transform(col("codes"), _.cast("double")))
      .withColumn("nrm", norm(col("v")))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ingest").toString

  private def vecs(rows: Seq[(Long, Seq[Long])]): Seq[VecRow] =
    rows.map { case (id, cs) => VecRow(id, cs) }

  test("streamed batches serve like a frozen-model rebuild, and a " +
      "checkpointed restart does not re-append committed batches") {
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    Similarity.ivfPqIndexWrite(codesDf(resident), idx, kIvf = 2,
      m = 2, subDim = 2, k = 3)
    val in = MemoryStream[VecRow]
    val q1 = Similarity.ivfPqIndexIngest(codesStream(in.toDF()), idx,
      m = 2, subDim = 2, ckpt)
    try {
      in.addData(vecs(wave1): _*)
      q1.processAllAvailable()
      in.addData(vecs(wave2): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val markers = new java.io.File(s"$idx/ingested").listFiles()
      .map(_.getName).toSet
    assert(markers == Set("batch-0", "batch-1"),
      s"each committed batch leaves its ledger marker: $markers")
    // restart from the SAME checkpoint: committed offsets replay-skip,
    // so the restarted query must not re-append waves 1/2
    val q2 = Similarity.ivfPqIndexIngest(codesStream(in.toDF()), idx,
      m = 2, subDim = 2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    // every vector appears EXACTLY m times in the encodings — the
    // no-duplicates proof that covers base write + both waves + restart
    val all = resident ++ wave1 ++ wave2
    val perVec = spark.read
      .schema("vec_id BIGINT, s INT, code BIGINT, cell BIGINT")
      .parquet(s"$idx/enc")
      .groupBy("vec_id").count().as[(Long, Long)].collect().toMap
    assert(perVec.keySet == all.map(_._1).toSet &&
      perVec.values.forall(_ == 2L),
      s"each vector must carry exactly m=2 encoding rows: $perVec")
    // and the ingested index serves exactly like a frozen-model
    // rebuild over resident ∪ wave1 ∪ wave2
    val dfAll = codesDf(all)
    val rebuilt = tmp()
    Similarity.ivfPqIndexWrite(dfAll, rebuilt, kIvf = 2, m = 2,
      subDim = 2, k = 3,
      codebooks = Some(spark.read.parquet(s"$idx/books")),
      centroids = Some(spark.read.parquet(s"$idx/cents")))
    def serveFrom(dir: String): Seq[(Long, Long, Long, Double)] =
      Similarity.ivfPqIndexServe(dfAll, dir, queryId = 1L, nprobe = 2,
          m = 2, subDim = 2, coarseK = 10, topK = 6)
        .as[(Long, Long, Long, Double)].collect().toSeq
    val got = serveFrom(idx); val ref = serveFrom(rebuilt)
    assert(got.nonEmpty && got == ref,
      s"ingested index must serve like the rebuild:\n$got\nvs\n$ref")
    assert(got.map(_._1).contains(0L),
      "the streamed near-origin row must surface for query 1")
  }

  test("the batch-id ledger — not the offset log — skips an " +
      "already-marked batch id") {
    // pre-mark the NEXT batch id as applied, then stream data into it:
    // the rows must be dropped by the ledger even though Spark fires
    // the batch — this is the replay path a crash-recovery re-fire
    // takes, exercised without killing a JVM
    val idx = tmp(); val ckpt = s"${tmp()}/ckpt"
    Similarity.ivfPqIndexWrite(codesDf(resident), idx, kIvf = 2,
      m = 2, subDim = 2, k = 3)
    val in = MemoryStream[VecRow]
    val q = Similarity.ivfPqIndexIngest(codesStream(in.toDF()), idx,
      m = 2, subDim = 2, ckpt)
    try {
      in.addData(vecs(wave1): _*)
      q.processAllAvailable() // batch 0: applied
      assert(new java.io.File(s"$idx/ingested/batch-0").exists)
      new java.io.File(s"$idx/ingested/batch-1").mkdirs()
      in.addData(vecs(wave2): _*)
      q.processAllAvailable() // batch 1: marker present → skipped
    } finally q.stop()
    val ids = spark.read
      .schema("vec_id BIGINT, s INT, code BIGINT, cell BIGINT")
      .parquet(s"$idx/enc")
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(wave1.map(_._1).toSet.subsetOf(ids),
      s"batch 0 must be applied: $ids")
    assert(wave2.map(_._1).toSet.intersect(ids).isEmpty,
      s"the pre-marked batch must be skipped: $ids")
  }
}
