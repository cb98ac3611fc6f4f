package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{CacheRegistry, Tables}
import graft.operators.{Search, Similarity, Stores, TextDedup}

/** Measures the GROWTH LAW of the cross-store coordination surface
  * (r17's `Stores.takedownAll` / `Stores.appendAll`) the way
  * [[ScaleProbe]] measures the per-store lifecycle: a FIXED mutation
  * batch against the three-store layout built from 1×/3×/10× the
  * sf0.1 corpus. The scale claims under test, each a specific
  * mechanism that would show up as a linear row if it broke:
  *
  *  - '''coord_takedown''' (fixed 20-doc batch across a chunk-level
  *    search store + dedup store + ANN store): per store the cost is
  *    one tombstone write + one stamp FS op; the only corpus-shaped
  *    reads are the docs sidecars (two-long rows, a fraction of the
  *    postings/encodings the delete never touches) and the chunk
  *    store's id-resolution scan, whose RAW-column packed-id range
  *    conjunct is a pushed parquet filter (row-group pruning,
  *    spec-pinned in StoreCoordinationSpec) — so the whole leg should
  *    grow FAR slower than the corpus (α well under 1), and a lost
  *    pushdown or an accidental postings scan would read as α→1 with
  *    10× absolute cells.
  *
  *  - '''coord_append''' (fixed 200-doc delta, batch-ledgered, across
  *    the same three stores): each store's append is O(|delta|) by the
  *    per-store rows ScaleProbe already pins (search_disk_append,
  *    ivfpq_disk_append6); the coordination layer adds only FS ops
  *    (ledger marker, stamp) and the chunk packing of the delta — the
  *    leg should be FLAT across multipliers (a corpus-shaped
  *    re-derive anywhere in the coordinated path would grow it).
  *
  *  - '''coord_verify''' (alignment read over the three stores): pure
  *    driver-side sidecar reads — sub-millisecond, recorded so a
  *    future "stamp as a Spark job" regression is visible (the r17
  *    sidecar-vs-parquet decision, measured).
  *
  * Fixtures and methodology are ScaleProbe's (deterministic scaled
  * corpus, one discarded 1× warm-up round, registry cleared per
  * round, store builds UNTIMED — they are the per-store build rows'
  * business). Absolute cells bounce ±50% with box phase; compare
  * exponents.
  *
  *   sbt "runMain graft.tools.CoordProbe"                        # 1,3,10
  *   sbt "runMain graft.tools.CoordProbe /root/testdata/sf0.1 1,3"
  */
object CoordProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  final private case class Point(path: String, m: Int, inRows: Long,
    secs: Double)

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val scratch = args.lift(2).getOrElse("target/coordprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val points = scala.collection.mutable.ArrayBuffer.empty[Point]
    for ((m, idx) <- (1 +: mults).zipWithIndex) {
      val warm = idx == 0
      val dir = s"$scratch/m$m"
      ScaleProbe.scaledDocuments(spark, baseDir, m)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      ScaleProbe.scaledEmbeddings(spark, baseDir, m)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      Tables.invalidate(spark)
      CacheRegistry.clear(spark)
      val docsAll = Tables(spark, dir, "documents")
      val nDocs = docsAll.count()

      // store builds: UNTIMED setup (ScaleProbe's *_build rows own
      // these laws); the chunk store is q186's exact layout
      val chunkDir = s"$dir/chunkidx"
      val dedupDir = s"$dir/dedupidx"
      val annDir = s"$dir/annidx"
      Search.searchIndexWrite(Search.chunkCorpus(
          docsAll.select("doc_id", "text")), chunkDir,
        idCol = "chunk_id", textCol = "chunk_text")
      TextDedup.dedupIndexWrite(docsAll, dedupDir)
      val vecs0 = Similarity.vectors(spark, dir)
        .filter(col("codes").isNotNull)
      Similarity.ivfPqIndexWrite(vecs0, annDir, kIvf = 4, m = 4,
        subDim = 16, k = 8)
      val stores = Seq(graft.Graft.ChunkSearchStore(chunkDir),
        graft.Graft.DedupStore(dedupDir), graft.Graft.AnnStore(annDir))

      def rec(path: String)(body: => Unit): Unit = {
        val (_, secs) = time(body)
        if (!warm) {
          points += Point(path, m, nDocs, secs)
          println(f"[coordprobe] path=$path m=$m in=$nDocs secs=$secs%.2f")
        }
      }

      // fixed 20-doc takedown batch of RESIDENT ids (0..19 exist in
      // every replica-0 store slice)
      rec("coord_takedown") {
        Stores.takedownAll(spark, (0L until 20L).toSeq, stores)
      }
      // the FRAME-shaped form (r18): the same batch SIZE arrives as a
      // DataFrame filtered from the corpus — the no-collect path whose
      // per-store work is the pinned-ids checkpoint, the two-long
      // bounds aggregate, and semi-join tombstone writes. The corpus
      // filter itself scans the docs table, so a mild positive step is
      // the SCAN's, not the takedown's; the claim under test is that
      // the exponent stays far below 1 (no corpus-shaped join blowup).
      rec("coord_takedown_frame") {
        Stores.takedownAll(spark,
          docsAll.filter(col("doc_id") >= 20 && col("doc_id") < 40)
            .select("doc_id"), stores)
      }
      // fixed 200-doc delta under fresh ids (strictly above every
      // replica id at any m — ScaleProbe's wave-offset rule), with the
      // matching embeddings for the ANN store; MATERIALIZED before the
      // timing so the corpus-sized fixture cut is not charged to the
      // append (the search_disk_append lesson)
      val off = 1000000000L * (m + 60L)
      val delta = docsAll.filter(col("doc_id") < 200)
        .join(Tables(spark, dir, "embeddings"),
          col("doc_id") === col("vec_id"))
        .select((col("doc_id") + off).as("doc_id"), col("text"),
          col("embedding").as("emb"))
        .localCheckpoint()
      rec("coord_append") {
        Stores.appendAll(delta, s"probe-m$m", stores)
      }
      // alignment read: three sidecar FS reads, no Spark job
      rec("coord_verify") {
        val v = Stores.requireAlignedVersions(spark, stores.map(_.dir))
        require(v == 3L, s"expected all three mutations stamped, got v$v")
      }
    }

    println("[coordprobe] --- growth exponents a = ln(t2/t1)/ln(n2/n1) ---")
    for ((path, ps) <- points.groupBy(_.path).toSeq.sortBy(_._1)) {
      val sorted = ps.sortBy(_.m)
      val steps = sorted.iterator.zip(sorted.iterator.drop(1)).map {
        case (a, b) =>
          val alpha = math.log(b.secs / a.secs) /
            math.log(b.inRows.toDouble / a.inRows)
          f"${a.m}->${b.m}:$alpha%.2f"
      }.mkString(" ")
      val overall = if (sorted.size >= 2) {
        val (a, b) = (sorted.head, sorted.last)
        f"${math.log(b.secs / a.secs) /
          math.log(b.inRows.toDouble / a.inRows)}%.2f"
      } else "n/a"
      println(s"[coordprobe] $path steps[$steps] overall=$overall")
    }
    spark.stop()
  }
}
