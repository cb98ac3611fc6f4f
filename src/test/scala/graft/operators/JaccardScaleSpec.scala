package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q42's df-adaptive jaccard: on a hot-shingle corpus the prefix-filter
  * path must (a) produce exactly the brute-force answer and (b) keep the
  * candidate intermediate small — the count-join would materialize
  * C(df,2) rows for the hot shingle alone. */
class JaccardScaleSpec extends SparkTestBase {
  import spark.implicits._

  // 210 docs, every one containing the stopword shingle "hot hot hot":
  // 200 filler docs with 3 unique shingles each, plus 5 near-dup pairs
  // (J = 4/5) whose overlap lives in rare shingles.
  private lazy val hotCorpus = {
    val filler = (0 until 200).map { i =>
      (i.toLong, Seq("hot hot hot", s"u$i a", s"u$i b", s"u$i c"))
    }
    val nearDups = (0 until 5).flatMap { k =>
      Seq(
        ((1000 + 2 * k).toLong,
          Seq("hot hot hot", s"k$k a", s"k$k b", s"k$k c")),
        ((1001 + 2 * k).toLong,
          Seq("hot hot hot", s"k$k a", s"k$k b", s"k$k c", s"k$k x")))
    }
    (filler ++ nearDups).toDF("doc_id", "sh")
  }

  /** Local brute force over the same arrays. */
  private def bruteForce(docs: Seq[(Long, Seq[String])]): Set[(Long, Long, Long, Int, Int)] =
    (for {
      (i, si) <- docs; (j, sj) <- docs if i < j
      c = si.toSet.intersect(sj.toSet).size
      if 3 * c >= si.size + sj.size
    } yield (i, j, c.toLong, si.size, sj.size)).toSet

  test("hot corpus trips the amplification cap") {
    val postings = hotCorpus.select($"doc_id", size($"sh").as("n"),
      explode($"sh").as("s"))
    val (sum2, sum1) = TextDedup.shingleDfStats(postings)
    assert(sum2 > 32L * sum1, s"sum2=$sum2 sum1=$sum1 should take prefix path")
  }

  test("prefix path ≡ brute force on the hot corpus") {
    val got = TextDedup.jaccardPairsPlan(hotCorpus)
      .select($"doc_i", $"doc_j", $"n_common", $"n_i", $"n_j")
      .as[(Long, Long, Long, Int, Int)].collect().toSet
    val docs = hotCorpus.as[(Long, Seq[String])].collect().toSeq
    assert(got == bruteForce(docs))
    assert(got.size == 5)
  }

  test("prefix candidates exclude the hot shingle's C(df,2) blowup") {
    val cand = TextDedup.prefixCandidates(hotCorpus).count()
    // the count-join intermediate from the hot shingle alone is C(210,2)
    assert(cand < 50, s"candidates=$cand — hot shingle leaked into prefixes")
    assert(cand >= 5) // recall: every true pair must be a candidate
  }

  test("count-join ≡ prefix+verify row-for-row on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 12).map(v => s"w$v t")
    for (trial <- 0 until 4) {
      val docs = (0 until 25).map { i =>
        (i.toLong, rnd.shuffle(vocab).take(2 + rnd.nextInt(8)).toSeq)
      }.toDF("doc_id", "sh")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4), r.getDouble(5))).toSet
      val cj = rows(TextDedup.countJoinPairs(docs))
      val pv = rows(TextDedup.prefixVerifyPairs(docs))
      assert(cj == pv, s"trial $trial: branches disagree")
      assert(cj.nonEmpty, s"trial $trial: degenerate corpus")
    }
  }

  test("count-join path ≡ brute force on a benign corpus") {
    val benign = (0 until 40).map { i =>
      (i.toLong, (0 until 6).map(g => s"d${(i + g) % 45} t"))
    }
    val df = benign.toDF("doc_id", "sh")
    val postings = df.select($"doc_id", size($"sh").as("n"),
      explode($"sh").as("s"))
    val (sum2, sum1) = TextDedup.shingleDfStats(postings)
    assert(sum2 <= 32L * sum1, "benign corpus should stay on the count-join")
    val got = TextDedup.jaccardPairsPlan(df)
      .select($"doc_i", $"doc_j", $"n_common", $"n_i", $"n_j")
      .as[(Long, Long, Long, Int, Int)].collect().toSet
    assert(got == bruteForce(benign))
    assert(got.nonEmpty) // overlapping windows guarantee qualifying pairs
  }
}
