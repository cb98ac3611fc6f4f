package graft.operators

import org.apache.spark.sql.functions._

import graft.{CacheRegistry, SparkEntry, SparkTestBase}

/** Properties of the round-11 capability additions: q170 RAG fusion
  * (composition consistency with its component retrievers), q171
  * perceptual-hash dedup (banded candidates vs the brute-force truth,
  * plus the pigeonhole recall guarantee), q172 drift timeline (proper-
  * KL non-negativity and batch-partition completeness). */
class CapstoneSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q170: fused chunks rank by rrf and fuse real component ranks") {
    val rows = SparkEntry.queries("q170_rag_fuse")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
      "fused list must be rrf-descending")
    rows.foreach { r =>
      val lex = r.getAs[Int]("lex_rank")
      val sem = r.getAs[Int]("sem_rank")
      assert(lex >= 1 && lex <= 100 && sem >= 1 && sem <= 100,
        "fusion must only ever see the two top-100 lists")
      val expect = BigDecimal(1.0 / (60 + lex) + 1.0 / (60 + sem))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9,
        s"rrf must be the declared function of the two ranks (row $r)")
    }
  }

  test("q171: banded pairs equal brute force over the same sketches; hamming<=7 recall is total") {
    CacheRegistry.clear(spark)
    val banded = SparkEntry.queries("q171_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force truth from the SAME cached sketch frame: all pairs,
    // no band gate — banding must lose nothing at hamming <= 7 (12
    // errors can blind all 8 bands only above the pigeonhole bound 7)
    // and everything it keeps must be a true hamming <= 12 pair
    val h = CacheRegistry.cached(spark, s"phash:$dir")(
      sys.error("spec must reuse the query's cached sketches"))
    val a = h.select(col("doc_id").as("doc_i") +:
      (0 until 8).map(b => col(s"h$b").as(s"ha$b")): _*)
    val b = h.select(col("doc_id").as("doc_j") +:
      (0 until 8).map(b => col(s"h$b").as(s"hb$b")): _*)
    val ham = (0 until 8).map(k =>
      bit_count(col(s"ha$k").bitwiseXOR(col(s"hb$k")))).reduce(_ + _)
    val bandHit = (0 until 8).map(k =>
      col(s"ha$k") === col(s"hb$k")).reduce(_ || _)
    val brute = a.join(b, col("doc_i") < col("doc_j"))
      .select(col("doc_i"), col("doc_j"), ham.cast("int").as("hamming"),
        bandHit.as("hit"))
      .filter(col("hamming") <= 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val bruteGated = brute.filter(_._4).map(t => (t._1, t._2, t._3)).toSet
    assert(banded == bruteGated,
      "banded candidate join must equal the band-gated brute force")
    val within7 = brute.filter(_._3 <= 7)
    assert(within7.forall(_._4),
      "pigeonhole: a hamming<=7 pair always shares one of 8 bands")
    CacheRegistry.clear(spark)
  }

  test("q172: drift KL is a proper non-negative KL over complete batches") {
    val rows = SparkEntry.queries("q172_kl_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getAs[Double]("kl")
      // Gibbs: KL(cell || corpus) >= 0; 4dp rounding can touch -0.0000
      assert(kl >= -0.00005, s"negative KL in $r")
      val batch = r.getAs[Int]("batch")
      assert(batch >= 0 && batch < 5)
    }
    // every document lands in exactly one (source, batch) cell: cell
    // token totals must sum to the corpus token total
    val docs = graft.Tables(spark, dir, "documents")
    val total = docs
      .select(explode(split(col("text"), " ")).as("w")).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total,
      "batch cells must partition the corpus tokens")
  }
}
