package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions._

/** Per-operator unit assertions on tiny in-memory frames, plus the
  * algebraic properties SURVEY.md §5 calls for. */
class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val nums = (1 to 100).map(i => (i.toLong, i % 7, i * 1.5))
    .toDF("id", "grp", "x")

  test("filter composition ≡ conjunction") {
    val a = nums.filter($"id" > 10).filter($"grp" === 3)
    val b = nums.filter($"id" > 10 && $"grp" === 3)
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("distinct is idempotent") {
    val d1 = nums.select($"grp").distinct()
    assert(d1.distinct().collect().toSet == d1.collect().toSet)
    assert(d1.count() == 7)
  }

  test("groupBy sum matches manual partition") {
    val got = nums.groupBy($"grp").agg(sum($"id").as("s"))
      .as[(Int, Long)].collect().toMap
    val want = (1 to 100).groupBy(_ % 7).map { case (g, xs) =>
      g -> xs.map(_.toLong).sum }
    assert(got == want)
  }

  test("broadcast equi-join ≡ local join") {
    val dim = Seq((0, "zero"), (3, "three")).toDF("grp", "name")
    val got = nums.join(broadcast(dim), "grp").count()
    val want = (1 to 100).count(i => i % 7 == 0 || i % 7 == 3)
    assert(got == want)
  }

  test("semi ∪ anti partitions the left side") {
    val dim = Seq(0, 1, 2).toDF("grp")
    val semi = nums.join(dim, Seq("grp"), "leftsemi").count()
    val anti = nums.join(dim, Seq("grp"), "leftanti").count()
    assert(semi + anti == 100)
  }

  test("cosine: bounds, self-similarity, symmetry") {
    val vs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 0.5f, 1.0f)),
      (3L, Array(2.0f, 4.0f, 6.0f))).toDF("id", "e")
      .select($"id", toDouble($"e").as("v"))
    val a = vs.select($"id".as("i"), $"v".as("va"))
    val b = vs.select($"id".as("j"), $"v".as("vb"))
    val sims = a.join(b, $"i" <= $"j")
      .select($"i", $"j", (dot($"va", $"vb") / (norm($"va") * norm($"vb")))
        .as("s"))
      .as[(Long, Long, Double)].collect()
    sims.foreach { case (_, _, s) => assert(s >= -1.0001 && s <= 1.0001) }
    assert(math.abs(sims.find(t => t._1 == 1 && t._2 == 1).get._3 - 1.0) < 1e-12)
    // colinear vectors (1,2,3) and (2,4,6)
    assert(math.abs(sims.find(t => t._1 == 1 && t._2 == 3).get._3 - 1.0) < 1e-12)
  }

  test("LSH bucket is deterministic and within range") {
    val vs = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(-0.5f)))
      .toDF("id", "e").select($"id", toDouble($"e").as("v"))
    val b1 = vs.select(lshBucket($"v", 4).as("b")).as[Long].collect()
    val b2 = vs.select(lshBucket($"v", 4).as("b")).as[Long].collect()
    assert(b1.sameElements(b2))
    b1.foreach(b => assert(b >= 0 && b < 16))
  }

  test("window top-k per group has exactly k rows per group") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"grp").orderBy($"id".desc)
    val top2 = nums.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
    assert(top2.count() == 14)
    assert(top2.groupBy($"grp").count().select(max($"count")).as[Long].head() == 2)
  }

  test("min(struct) argmin ≡ window rank-1 on a tie-heavy random frame") {
    // the invariant behind the q40/q73/q78/q90/q102/q135 conversions:
    // keep-first/argmin as a map-side-combinable aggregate must select
    // exactly the row a row_number()-over-window rank-1 would. Seeded
    // ties in BOTH the key and the ordering value stress the tiebreak.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(5).toDouble, i.toLong)
    }
    val df = rows.toDF("key", "ord", "uniq")
    val viaAgg = df.groupBy("key")
      .agg(min(struct($"ord", $"uniq")).as("m"))
      .select($"key", $"m.ord".as("ord"), $"m.uniq".as("uniq"))
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("ord", "uniq")
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"key", $"ord", $"uniq")
      .collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("HexWindowToLong ≡ conv(substr(hex,k,15),16,10) on real digests") {
    val digests = (1 to 500).map(i => Tuple1(s"seed$i")).toDF("s")
      .select(md5(encode($"s", "UTF-8")).as("d"))
    (0 until 8).foreach { k =>
      val diff = digests.select(
        graft.plans.HexWindowToLong.hexWindow($"d", k + 1).as("fast"),
        conv(substring($"d", k + 1, 15), 16, 10).cast("long").as("ref"))
        .filter($"fast" =!= $"ref").count()
      assert(diff == 0, s"window $k diverges from conv")
    }
  }

  test("typed mapGroups / cogroup agree with untyped aggregation") {
    val left = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDS()
    val right = Seq((1, 2.0), (3, 7.0)).toDS()
    val mg = left.groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).sum))
      .collect().toMap
    assert(mg == Map(1 -> 30.0, 2 -> 5.0))
    val cg = left.groupByKey(_._1)
      .cogroup(right.groupByKey(_._1)) { (k, l, r) =>
        Iterator((k, l.map(_._2).sum, r.map(_._2).sum))
      }.collect().toSet
    assert(cg == Set((1, 30.0, 2.0), (2, 5.0, 0.0), (3, 0.0, 7.0)))
  }

  test("connectedComponents: chains, multiple components, min-label canonical") {
    // component {1..5} as a chain (diameter 4 → needs >1 round),
    // component {10,11}, component {20,21,22} as a triangle
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("src", "dst")
    val got = TextDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: long chain crosses the checkpoint rounds") {
    // path 0-1-…-14: min label 0 propagates one hop per round, so the
    // loop runs ~13 rounds — past the every-5th-round localCheckpoint
    // lineage cuts (twice) — and must still converge to all-zeros
    val edges = (0 until 14).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val got = TextDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 to 14).map(_.toLong -> 0L).toMap)
  }

  test("rollup row count = groups + subtotals + grand total") {
    val r = nums.rollup($"grp").agg(count(lit(1))).count()
    assert(r == 7 + 1)
  }

  test("unpivot ∘ pivot reconstructs the long form (present cells)") {
    val keyed = nums.select($"grp", ($"id" % 3).cast("int").as("k"))
    val long = keyed.groupBy("grp", "k").agg(count(lit(1)).as("n"))
    val wide = keyed.groupBy("grp").pivot("k", Seq(0, 1, 2))
      .agg(count(lit(1)))
    val melted = wide
      .unpivot(Array(col("grp")),
        Array(col("0"), col("1"), col("2")), "k", "n")
      .filter($"n".isNotNull) // absent cells: pivot NULL ≠ a long row
      .select($"grp", $"k".cast("int").as("k"), $"n")
    assert(melted.collect().toSet == long.collect().toSet)
  }

  private def codesDf(rows: Seq[(Long, Seq[Long])]) =
    rows.toDF("vec_id", "codes")
      .withColumn("v", transform(col("codes"), _.cast("double")))
      .withColumn("nrm", norm(col("v")))

  test("pqAnn: seeds-only corpus makes ADC the exact integer code L2") {
    // m=2 subspaces of 3 dims; every vector is a codebook seed (k=n),
    // so each subvector encodes to ITSELF at distance 0 and the
    // asymmetric distance degenerates to the exact integer L2 between
    // the query's and the vector's codes — the strongest exactness pin
    // a lossy quantizer admits
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 7L)),
      (2L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (3L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (4L, Seq(2L, 2L, 2L, 2L, 2L, 2L)),
      (5L, Seq(7L, 7L, 0L, 0L, 1L, 1L)))
    val got = Similarity.pqAnn(codesDf(rows), queryId = 0L, m = 2,
        subDim = 3, k = 6, coarseK = 10, topK = 10)
      .select("vec_id", "adc").as[(Long, Long)].collect().toMap
    val qc = rows.head._2
    rows.tail.foreach { case (id, cs) =>
      val l2 = cs.zip(qc).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(got(id) == l2, s"vec $id: adc ${got(id)} != exact L2 $l2")
    }
  }

  test("pqAnn: offset id spaces seed from the k smallest ids PRESENT") {
    // same fixture as the seeds-only test with every id shifted +1000:
    // a vec_id < k seed filter would return an empty codebook and a
    // silent empty result (the semDedup r12 bug class); the k-smallest
    // rule must reproduce the unshifted ADC values exactly
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 7L)),
      (2L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (3L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (4L, Seq(2L, 2L, 2L, 2L, 2L, 2L)),
      (5L, Seq(7L, 7L, 0L, 0L, 1L, 1L)))
    val shifted = rows.map { case (id, cs) => (id + 1000L, cs) }
    val got = Similarity.pqAnn(codesDf(shifted), queryId = 1000L, m = 2,
        subDim = 3, k = 6, coarseK = 10, topK = 10)
      .select("vec_id", "adc").as[(Long, Long)].collect().toMap
    val want = Similarity.pqAnn(codesDf(rows), queryId = 0L, m = 2,
        subDim = 3, k = 6, coarseK = 10, topK = 10)
      .select("vec_id", "adc").as[(Long, Long)].collect().toMap
    assert(got.nonEmpty, "offset ids must not empty the codebook")
    assert(got == want.map { case (id, d) => (id + 1000L, d) },
      "seeding is id-RANK-based, so a pure id shift changes nothing")
  }

  test("pqAnn: a codes/m·subDim length mismatch fails the job loudly") {
    val rows = Seq((0L, Seq(1L, 2L, 3L, 4L)), (1L, Seq(4L, 3L, 2L, 1L)))
    val ex = intercept[Exception] {
      // vectors are 4 long but m*subDim = 6 — must raise, never rank
      // on truncated/empty subvectors
      Similarity.pqAnn(codesDf(rows), queryId = 0L, m = 2, subDim = 3,
        k = 2, coarseK = 5, topK = 5).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t => t.getMessage != null
      && t.getMessage.contains("codes length must be m*subDim")),
      s"expected the in-plan length assertion, got: $ex")
  }

  test("pqTrainCodebooks: training rescues ADC recall from degenerate seeds") {
    // constructed corpus where the seed rule is deliberately WORTHLESS:
    // the two lowest ids (the seeds) are the SAME near-origin vector,
    // so both seed codebook entries coincide, every vector encodes to
    // entry 0, ADC is one constant, and the coarse cut degenerates to
    // lowest-vec_id order. Two Lloyd rounds split the model onto the
    // two REAL clusters (+100⁴ / −100⁴), after which ADC recovers the
    // query's true neighborhood — the measured gain the trained-
    // codebook option exists for. The metered q178/q179 keep the
    // oracle-pinned seed default.
    val h2 = (2L to 5L).map(i => (i, Seq(-100L, -100L, -100L, -100L - i % 2)))
    val h1 = (6L to 10L).map(i => (i, Seq(100L, 100L, 100L, 100L + i % 2)))
    val rows = Seq((0L, Seq(0L, 0L, 0L, 1L)), (1L, Seq(0L, 0L, 0L, 1L))) ++
      h2 ++ h1
    val df = codesDf(rows)
    // exact cosine top-5 for query 6, replayed driver-side
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum)
        * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val qv = rows.find(_._1 == 6L).get._2
    val exact = rows.filter(_._1 != 6L)
      .map { case (id, v) =>
        (id, BigDecimal(cos(v, qv))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    def topIds(cb: Option[org.apache.spark.sql.DataFrame]): Set[Long] =
      Similarity.pqAnn(df, queryId = 6L, m = 1, subDim = 4, k = 2,
          coarseK = 5, topK = 5, codebooks = cb)
        .select("vec_id").as[Long].collect().toSet
    val seedRecall = (topIds(None) & exact).size
    val trained = Similarity.pqTrainCodebooks(df, m = 1, subDim = 4,
      k = 2, iters = 2)
    // the model really did split: the two entries must differ now
    assert(trained.select("cbv").as[Seq[Long]].collect().toSet.size == 2,
      "two Lloyd rounds must separate the coincident seed entries")
    val trainedRecall = (topIds(Some(trained)) & exact).size
    assert(seedRecall <= 2,
      s"fixture must make seed codebooks bad (got recall $seedRecall/5)")
    assert(trainedRecall >= 4,
      s"trained codebooks must recover the neighborhood " +
        s"(got $trainedRecall/5)")
    assert(trainedRecall > seedRecall)
  }

  test("ivfTrainCentroids: training splits the mega-cell the seed rule " +
      "creates") {
    // constructed corpus where BOTH coarse seeds (the two lowest ids)
    // sit in the +100 halo, so the seed model crams the entire -100
    // halo into seed 0's cell — the mega-cell that at scale is a
    // straggler partition nprobe cannot prune. Two Lloyd rounds must
    // (1) move the model, (2) strictly shrink the biggest cell's
    // share, and (3) end with the haloes in separate cells — the
    // partition-balance property the trained-centroids option exists
    // for. The metered q179/q182/q183 keep the oracle-pinned seeds.
    val rows = Seq((0L, Seq(100L, 100L, 100L, 100L)),
      (1L, Seq(100L, 100L, 100L, 101L))) ++
      (2L to 7L).map(i => (i, Seq(-100L, -100L, -100L, -100L - i % 2))) ++
      (8L to 11L).map(i => (i, Seq(100L, 100L, 100L, 100L + i % 3)))
    val df = codesDf(rows)
    def cellSizes(cents: Option[org.apache.spark.sql.DataFrame]) =
      Similarity.ivfAssign(df, kIvf = 2, cents)
        .groupBy("cell").count().as[(Long, Long)].collect().toMap
    val seedSizes = cellSizes(None)
    // seed 1 catches the plus-halo rows whose last dim lands nearer
    // 101 — the mega-cell is 8/12, a 2:1 skew
    assert(seedSizes.values.max >= 8,
      s"fixture must make the seed model lopsided: $seedSizes")
    val trained = Similarity.ivfTrainCentroids(df, kIvf = 2, iters = 2)
    assert(trained.count() == 2, "the model must stay kIvf rows")
    assert(trained.select("c").as[Seq[Double]].collect().toSet !=
      Similarity.ivfCentroids(df, kIvf = 2).select("c").as[Seq[Double]]
        .collect().toSet, "training must move the centroids")
    val trainedSizes = cellSizes(Some(trained))
    assert(trainedSizes.values.max < seedSizes.values.max,
      s"training must shrink the mega-cell: $seedSizes -> $trainedSizes")
    // the haloes end in separate cells
    val byId = Similarity.ivfAssign(df, kIvf = 2, Some(trained))
      .as[(Long, Long)].collect().toMap
    val minus = (2L to 7L).map(byId).toSet
    val plus = (Seq(0L, 1L) ++ (8L to 11L)).map(byId).toSet
    assert(minus.size == 1 && plus.size == 1 && minus != plus,
      s"trained cells must separate the haloes: $byId")
    // determinism: retraining reproduces the exact model (fixed-point
    // integer re-estimation — no partition-order double drift)
    val again = Similarity.ivfTrainCentroids(df, kIvf = 2, iters = 2)
    assert(again.orderBy("cl").as[(Long, Seq[Double])].collect().toSeq ==
      trained.orderBy("cl").as[(Long, Seq[Double])].collect().toSeq,
      "retraining the same corpus must be bit-identical")
  }

  test("pqAnn: a precomputed encodings frame is plan sugar, not semantics") {
    // the r14 index materialization contract: serving from pqEncode's
    // output (what the pq-enc registry cache holds) must reproduce the
    // inline-encoding result row-for-row — the cache changes WHERE the
    // encode cost is paid, never what is computed
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 7L)),
      (2L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (3L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (4L, Seq(2L, 2L, 2L, 2L, 2L, 2L)),
      (5L, Seq(7L, 7L, 0L, 0L, 1L, 1L)))
    val df = codesDf(rows)
    val enc = Similarity.pqEncode(df, m = 2, subDim = 3, k = 3)
    val direct = Similarity.pqAnn(df, queryId = 0L, m = 2, subDim = 3,
      k = 3, coarseK = 10, topK = 10).as[(Long, Long, Double)].collect()
    val served = Similarity.pqAnn(df, queryId = 0L, m = 2, subDim = 3,
        k = 3, coarseK = 10, topK = 10, enc = Some(enc))
      .as[(Long, Long, Double)].collect()
    assert(direct.nonEmpty && served.toSeq == direct.toSeq,
      "served-from-index must equal inline encoding exactly")
  }

  test("pqEncode: frozen codebooks make encoding incremental (append-only index)") {
    // the 100 TB index-MAINTENANCE story: daily ingest encodes ONLY
    // the new vectors against the FROZEN codebooks and appends to the
    // pq-enc index — valid iff encode(old ∪ new) == encode(old) ∪
    // encode(new) under a FIXED codebook frame. Prove it on a delta
    // whose ids (< the old minimum) would CHANGE the seed set if the
    // codebooks were re-derived — i.e. exactly the case where skipping
    // the freeze silently re-codes the whole corpus differently.
    val old = Seq(
      (10L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (11L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (12L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (13L, Seq(2L, 2L, 2L, 2L, 2L, 2L)))
    val fresh = Seq(
      (0L, Seq(7L, 7L, 0L, 0L, 1L, 1L)),
      (1L, Seq(4L, 4L, 4L, 1L, 1L, 1L)))
    val cb = Similarity.pqSeedCodebooks(codesDf(old), m = 2, subDim = 3,
      k = 3)
    def enc(rows: Seq[(Long, Seq[Long])]) =
      Similarity.pqEncode(codesDf(rows), m = 2, subDim = 3, k = 3,
        codebooks = Some(cb)).as[(Long, Int, Long)].collect().toSet
    assert(enc(old ++ fresh) == enc(old) ++ enc(fresh),
      "delta encoding under frozen codebooks must equal re-encoding all")
    // and the guard the freeze exists for: re-deriving seeds over the
    // grown corpus picks a DIFFERENT codebook (the new ids are now the
    // smallest), so unfrozen incremental encoding would be inconsistent
    val reDerived = Similarity.pqEncode(codesDf(old ++ fresh), m = 2,
      subDim = 3, k = 3).as[(Long, Int, Long)].collect().toSet
    assert(reDerived != enc(old ++ fresh),
      "fixture must exercise the seed-shift case the freeze guards")
  }

  test("ivfAssign: frozen centroids make assignment incremental too") {
    // the other half of the index: cell assignment under a FROZEN
    // centroid frame appends exactly like pqEncode under frozen
    // codebooks — and the same seed-shift delta shows why the freeze
    // is mandatory
    val old = Seq(
      (10L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (11L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (12L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (13L, Seq(2L, 2L, 2L, 2L, 2L, 2L)))
    val fresh = Seq(
      (0L, Seq(7L, 7L, 0L, 0L, 1L, 1L)),
      (1L, Seq(4L, 4L, 4L, 1L, 1L, 1L)))
    val cents = Similarity.ivfCentroids(codesDf(old), kIvf = 2)
    def asg(rows: Seq[(Long, Seq[Long])]) =
      Similarity.ivfAssign(codesDf(rows), kIvf = 2,
        centroids = Some(cents)).as[(Long, Long)].collect().toSet
    assert(asg(old ++ fresh) == asg(old) ++ asg(fresh),
      "delta assignment under frozen centroids must equal assigning all")
    val reDerived = Similarity.ivfAssign(codesDf(old ++ fresh), kIvf = 2)
      .as[(Long, Long)].collect().toSet
    assert(reDerived != asg(old ++ fresh),
      "fixture must exercise the seed-shift case the freeze guards")
  }

  test("ivfPqAnnBatch: an empty query set returns empty, schema intact") {
    // ids all >= qMax → zero quantizable queries: the batch must come
    // back EMPTY with its declared six columns, never throw or emit a
    // cross-join of nothing — the degenerate input a scheduled serving
    // job hits when a shard's id range misses the query band
    val rows = Seq(
      (1000L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (1001L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (1002L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)))
    val df = codesDf(rows)
    val got = Similarity.ivfPqAnnBatch(df,
      Similarity.pqEncode(df, m = 2, subDim = 3, k = 2),
      Similarity.ivfAssign(df, kIvf = 2), qMax = 5L, kIvf = 2,
      nprobe = 1, m = 2, subDim = 3, k = 2, coarseK = 5, topK = 3)
    assert(got.columns.toSeq ==
      Seq("q_id", "vec_id", "cell", "adc", "cos_sim", "rn"))
    assert(got.count() == 0)
  }

  test("ivfPqAnnBatch: trained codebooks thread to encode AND LUTs") {
    // the serving contract the r14 review fixed: an index encoded with
    // TRAINED codebooks must be probed with LUTs in the SAME code
    // space — a batch that silently rebuilt seed codebooks for its
    // LUTs would sum seed-space distances against trained-space ids
    // and return plausible-looking wrong neighbors with no error.
    // Reuses the degenerate-seed corpus (training provably changes the
    // encodings, so this equality is discriminating): batch rows over
    // a trained index must equal the single-query trained search.
    val h2 = (2L to 5L).map(i => (i, Seq(-100L, -100L, -100L, -100L - i % 2)))
    val h1 = (6L to 10L).map(i => (i, Seq(100L, 100L, 100L, 100L + i % 2)))
    val rows = Seq((0L, Seq(0L, 0L, 0L, 1L)), (1L, Seq(0L, 0L, 0L, 1L))) ++
      h2 ++ h1
    val df = codesDf(rows)
    val cb = Similarity.pqTrainCodebooks(df, m = 1, subDim = 4, k = 2,
      iters = 2)
    val encT = Similarity.pqEncode(df, m = 1, subDim = 4, k = 2, Some(cb))
    val encS = Similarity.pqEncode(df, m = 1, subDim = 4, k = 2)
    assert(encT.collect().toSet != encS.collect().toSet,
      "fixture must make trained and seed encodings differ")
    val cells = Similarity.ivfAssign(df, kIvf = 2)
    val batch = Similarity.ivfPqAnnBatch(df, encT, cells, qMax = 1L,
        kIvf = 2, nprobe = 2, m = 1, subDim = 4, k = 2, coarseK = 8,
        topK = 5, codebooks = Some(cb))
      .select("vec_id", "cell", "adc", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val single = Similarity.ivfPqAnn(df, queryId = 0L, kIvf = 2,
        nprobe = 2, m = 1, subDim = 4, k = 2, coarseK = 8, topK = 5,
        codebooks = Some(cb))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(batch == single,
      s"trained batch and trained single-query must agree:\n$batch" +
        s"\nvs\n$single")
  }

  test("ivfPqAnnBatch: PQ shape validation matches the per-query path") {
    // m=0 would otherwise explode an empty subvector array — zero rows,
    // the in-plan length assert never evaluates, and the batch returns
    // EMPTY, which a serving job reads as "no neighbors"; the require
    // fails construction instead, same as pqAnnSearch's
    val rows = Seq((0L, Seq(1L, 2L, 3L, 4L)), (1L, Seq(5L, 6L, 7L, 8L)))
    val df = codesDf(rows)
    val enc = Similarity.pqEncode(df, m = 1, subDim = 4, k = 2)
    val cells = Similarity.ivfAssign(df, kIvf = 2)
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqAnnBatch(df, enc, cells, qMax = 1L, kIvf = 2,
        nprobe = 1, m = 0, subDim = 4, k = 2, coarseK = 5, topK = 3)
    }
    assert(ex.getMessage.contains("m, subDim, k"))
  }

  test("pqAnnSearch: the IVF restriction selects cells without " +
      "changing ADC values") {
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L, 6L)),
      (1L, Seq(1L, 2L, 3L, 4L, 5L, 7L)),
      (2L, Seq(9L, 0L, 1L, 2L, 3L, 4L)),
      (3L, Seq(-3L, 5L, 2L, 8L, 0L, 1L)),
      (4L, Seq(2L, 2L, 2L, 2L, 2L, 2L)),
      (5L, Seq(7L, 7L, 0L, 0L, 1L, 1L)))
    val df = codesDf(rows)
    val all = Similarity.pqAnn(df, queryId = 0L, m = 2, subDim = 3,
        k = 6, coarseK = 10, topK = 10)
      .select("vec_id", "adc").as[(Long, Long)].collect().toMap
    // restrict the search to three vectors across two "cells": only
    // they may return, each tagged with its cell, and every surviving
    // ADC must equal the unrestricted run's value (codebooks/LUT are
    // global — the restriction prunes the scan, never the code space)
    val restrict = Seq((1L, 7L), (3L, 7L), (5L, 9L)).toDF("vec_id", "cell")
    val got = Similarity.pqAnnSearch(df, Some(restrict), queryId = 0L,
        m = 2, subDim = 3, k = 6, coarseK = 10, topK = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == Set(1L, 3L, 5L))
    got.foreach { case (id, cell, adc, _) =>
      assert(adc == all(id), s"vec $id: restriction changed its ADC")
      assert(cell == (if (id == 5L) 9L else 7L), s"vec $id cell")
    }
  }

  test("pqAnn ≡ a driver-side replay of the full PQ definition") {
    // k < n, every stage lossy: a Scala replay of the SAME definition
    // (seed codebooks, argmin encode with lowest-id ties, LUT-summed
    // asymmetric distance, coarse cut, exact-cosine rerank) must
    // reproduce the operator's output row-for-row — encoding, ADC
    // values, tie-breaks, and rounding included
    val (m, subDim, k, coarseK, topK) = (2, 4, 3, 10, 5)
    val rows = (0 until 40).map { i =>
      (i.toLong,
        Seq.tabulate(m * subDim)(j => ((i * 37 + j * 11) % 17 - 8).toLong))
    }
    val got = Similarity.pqAnn(codesDf(rows), queryId = 0L, m = m,
        subDim = subDim, k = k, coarseK = coarseK, topK = topK)
      .as[(Long, Long, Double)].collect().toSeq

    def sub(cs: Seq[Long], s: Int) = cs.slice(s * subDim, (s + 1) * subDim)
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qcs = rows.head._2
    val lut = Array.tabulate(m, k)((s, c) => d2(sub(qcs, s),
      sub(rows(c)._2, s)))
    val enc = rows.map { case (id, cs) =>
      id -> (0 until m).map(s =>
        (0 until k).minBy(c => (d2(sub(cs, s), sub(rows(c)._2, s)), c)))
    }.toMap
    val adc = rows.tail.map { case (id, _) =>
      id -> (0 until m).map(s => lut(s)(enc(id)(s))).sum
    }
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val raw = dot(ad, bd) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd)))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = adc.sortBy { case (id, d) => (d, id) }.take(coarseK)
      .map { case (id, d) => (id, d, cos(rows(id.toInt)._2, qcs)) }
      .sortBy { case (id, _, c) => (-c, id) }.take(topK)
    assert(got == want, s"got $got\nwant $want")
  }
}
