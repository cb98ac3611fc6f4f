package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.functions.VectorFunctions._

/** ANN operating-curve probe (round 14): sweeps the two knobs a
  * production deployment tunes — the IVF probe width (`nprobe`) and
  * seed-vs-trained PQ codebooks — and reports measured recall@10
  * against the exact scan for each setting, on the real sf fixtures.
  *
  * q181 meters ONE point of this curve (nprobe=2, seed codebooks) with
  * a full DuckDB oracle; this tool walks the rest so the documented
  * recall/cost tradeoff in BASELINE.md is a measured curve, not two
  * samples. Deterministic end-to-end (seed rules + integer ADC), so
  * reruns reproduce exactly.
  *
  *   sbt "runMain graft.tools.AnnProbe /root/testdata/sf0.1 0"
  *
  * args: [sfDir] [queryId]. Output: one `[annprobe]` line per setting.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queryId = args.lift(1).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (m, subDim, k, kIvf) = (4, 16, 8, 4)
    val codes = Similarity.vectors(spark, dir)
      .filter(col("codes").isNotNull)
    val vs = Similarity.vectors(spark, dir)
    val q = vs.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val exact = vs.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineFast(col("v"), col("qv")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    def recall(ids: Set[Long]): Int = (ids & exact).size * 1000

    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet

    // index halves, built once — the serving setup every row shares
    val enc = Some(Similarity.pqEncodings(spark, dir))
    val cells = Some(Similarity.ivfCells(spark, dir))
    enc.get.count(); cells.get.count()

    // nprobe sweep (seed codebooks): recall climbs toward the pq
    // (nprobe = kIvf ≡ unrestricted) ceiling as more cells are read
    for (np <- 1 to kIvf) {
      val (got, secs) = t(ids(Similarity.ivfPqAnn(codes, queryId, kIvf,
        np, m, subDim, k, coarseK = 20, topK = 10, enc, cells)))
      println(f"[annprobe] path=ivfpq nprobe=$np recall_bp=${recall(got)} secs=$secs%.2f")
    }
    // pq coarseK sweep: the rerank budget is the other recall lever
    for (ck <- Seq(10, 20, 50, 100)) {
      val (got, secs) = t(ids(Similarity.pqAnn(codes, queryId, m, subDim,
        k, coarseK = ck, topK = 10, enc)))
      println(f"[annprobe] path=pq coarseK=$ck recall_bp=${recall(got)} secs=$secs%.2f")
    }
    // trained codebooks (iters sweep): encodings must be rebuilt in the
    // trained space — the full-reindex cost the freeze contract defers
    // to retraining windows
    for (it <- Seq(1, 2, 3)) {
      val cb = Similarity.pqTrainCodebooks(codes, m, subDim, k, iters = it)
      val encT = Similarity.pqEncode(codes, m, subDim, k, Some(cb))
      val (got, secs) = t(ids(Similarity.pqAnn(codes, queryId, m, subDim,
        k, coarseK = 50, topK = 10, enc = Some(encT),
        codebooks = Some(cb))))
      println(f"[annprobe] path=pq_trained iters=$it recall_bp=${recall(got)} secs=$secs%.2f")
    }
    // FILTERED search (q183's shape), measured against the allowed
    // subset's OWN exact top-10 across selectivities: `pre` is the
    // shipped pre-filter serve (allow-list semi-joined before the ADC
    // top-k); `post` is the naive alternative — take the UNRESTRICTED
    // top-10 and keep the allowed survivors — whose recall collapse at
    // low selectivity is the hole the pre-filter semantics close.
    // labels are uniform 0..9, so `label < s` is ~s·10% selectivity.
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-annprobe-idx").toString
    Similarity.ivfPqIndexWrite(codes, idxDir, kIvf, m, subDim, k)
    val unrestricted = ids(Similarity.ivfPqIndexServe(codes, idxDir,
      queryId, nprobe = 2, m, subDim, coarseK = 20, topK = 10))
    for (sel <- Seq(1, 2, 5)) {
      val allow = vs.filter(col("label") < sel).select("vec_id")
      val exactF = vs.filter(col("vec_id") =!= queryId)
        .join(allow, Seq("vec_id"), "leftsemi")
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(cosineFast(col("v"), col("qv")), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
        .select("vec_id").as[Long](spark.implicits.newLongEncoder)
        .collect().toSet
      val allowSet = ids(allow)
      val (pre, secs) = t(ids(Similarity.ivfPqIndexServe(codes, idxDir,
        queryId, nprobe = 2, m, subDim, coarseK = 20, topK = 10,
        allowed = Some(allow))))
      val post = unrestricted & allowSet
      println(f"[annprobe] path=filtered sel=${sel * 10}%% " +
        f"pre_bp=${(pre & exactF).size * 1000} " +
        f"post_bp=${(post & exactF).size * 1000} " +
        f"post_survivors=${post.size} secs=$secs%.2f")
    }
    spark.stop()
  }
}
