package graft.plans

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The round-4 native expressions (SimHash64, L2DistanceSq, WordShingles)
  * must be value-identical to the compositional higher-order-function
  * forms they replaced, on realistic data shapes, including edge cases
  * (empty arrays, repeated spaces, short texts). */
class NativeExprSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val texts = {
    val rnd = new Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val gen = (1 to 300).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val edge = Seq(
      (1001L, ""), (1002L, "one"), (1003L, "one two"),
      (1004L, "a b c"), (1005L, "a  b  c d"), (1006L, " lead and trail "),
      (1007L, "x y z x y z x y z"))
    (gen ++ edge).toDF("id", "text")
  }

  test("WordShingles ≡ array_distinct(transform(sequence…, concat_ws…))") {
    val ws = split(col("text"), " ")
    val composed = array_distinct(transform(
      sequence(lit(1), size(ws) - 2),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
        element_at(ws, i + 2))))
    val diffs = texts
      .filter(size(split(col("text"), " ")) >= 3)
      .select(
        WordShingles.wordShingles(col("text"), 3).as("native"),
        composed.as("composed"))
      .filter(not(col("native") === col("composed")))
      .count()
    assert(diffs == 0, "native and compositional shingles disagree")
  }

  test("WordShingles: <n words → empty array; width-1 = distinct words") {
    val r = Seq((1L, "one two")).toDF("id", "text")
      .select(WordShingles.wordShingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(r.isEmpty)
    val r1 = Seq((1L, "b a b a c")).toDF("id", "text")
      .select(WordShingles.wordShingles(col("text"), 1).as("sh"))
      .as[Seq[String]].head()
    assert(r1 == Seq("b", "a", "c"), "first-seen dedup order")
  }

  test("SimHash64 ≡ compositional bit-vote fold") {
    val hashes = transform(WordShingles.wordShingles(col("text"), 3),
      x => xxhash64(x))
    val composedCounts = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(b =>
          when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*),
        _ + _))
    val composed = (0 until 64).map(b =>
      when(element_at(composedCounts, b + 1) > 0, lit(1L << b))
        .otherwise(lit(0L))).reduce(_ bitwiseOR _)
    val diffs = texts
      .filter(size(split(col("text"), " ")) >= 3)
      .select(
        SimHash64.simhash64(hashes).as("native"),
        composed.as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(diffs == 0, "native and compositional simhash disagree")
  }

  test("SimHash64 on empty hash array = 0 (all counters at -0 → bits 0)") {
    val r = Seq(Tuple1(Array.empty[Long])).toDF("hs")
      .select(SimHash64.simhash64(col("hs")).as("s")).as[Long].head()
    assert(r == 0L)
  }

  test("MinHashSig ≡ 8× array_min(HexWindowToLong(md5-hex, k+1))") {
    val sh = WordShingles.wordShingles(col("text"), 3)
    val dg = transform(sh, x => md5(encode(x, "UTF-8")))
    def composedWindow(k: Int) =
      array_min(transform(dg, d => HexWindowToLong.hexWindow(d, k + 1)))
    val native = MinHashSig.minhashSig(sh)
    val diffs = texts
      .filter(size(split(col("text"), " ")) >= 3)
      .select(
        array((0 until 8).map(k => native.getItem(k)): _*).as("native"),
        array((0 until 8).map(composedWindow): _*).as("composed"))
      .filter(not(col("native") === col("composed")))
      .count()
    assert(diffs == 0, "native and compositional minhash windows disagree")
  }

  test("L2DistanceSq ≡ aggregate(zip_with(…)) fold, bit-exact") {
    val rnd = new Random(23)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))).toDF("id", "a", "b")
    val composed = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
    val diffs = vecs.select(
        L2DistanceSq.l2DistSq(col("a"), col("b")).as("native"),
        composed.as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(diffs == 0, "native and compositional L2² disagree (not bit-equal)")
  }

  test("BlockHash64 ≡ the oracle's slice-boundary formulation, byte-exact") {
    // reference computed INDEPENDENTLY of the expression's position→block
    // mapping: block j is the slice (j·n div 64, (j+1)·n div 64] — the
    // oracle's hi_j boundaries — summed in plain Scala over the raw bytes
    def reference(bytes: Array[Byte]): Seq[Long] = {
      val n = bytes.length
      val tot = bytes.map(b => (b & 0xFF).toLong).sum
      val bands = new Array[Long](8)
      (0 until 64).foreach { j =>
        val lo = j * n / 64      // exclusive, 0-based
        val hi = (j + 1) * n / 64 // inclusive, 0-based end
        val len = hi - lo
        val s = bytes.slice(lo, hi).map(b => (b & 0xFF).toLong).sum
        if (len > 0 && s * n >= tot * len) bands(j >> 3) |= 1L << (j & 7)
      }
      bands.toSeq
    }
    val rnd = new Random(17)
    // real corpus payloads + synthetic ones incl. bytes >127 (the
    // expression is byte-defined, not char-defined) and boundary lengths
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .filter(length(col("payload")) >= 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
    val synth = Seq(64, 65, 127, 128, 1000).zipWithIndex.map { case (n, i) =>
      (10000L + i) -> Array.fill(n)(rnd.nextInt(256).toByte)
    }
    val all = (corpus.toSeq ++ synth).toDF("doc_id", "payload")
    val got = all
      .select(col("doc_id"), BlockHash64.blockhash64(col("payload")).as("hb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (corpus.toSeq ++ synth).foreach { case (id, bytes) =>
      assert(got(id) == reference(bytes), s"band values diverge for doc $id")
    }
  }

  test("interpreted eval paths match literal expectations") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 → window k is the
    // 15-hex-char slice at offset k, as a 60-bit integer
    val mh = MinHashSig(
      Literal.create(Array("abc"), ArrayType(StringType)))
    val got = mh.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val hex = "900150983cd24fb0d6963f7d28e17f72"
    (0 until 8).foreach { k =>
      assert(got.getLong(k) == java.lang.Long.parseLong(hex.substring(k, k + 15), 16),
        s"window $k mismatch")
    }
    val l2 = L2DistanceSq(
      Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Array(4.0, 6.0), ArrayType(DoubleType)))
    assert(l2.eval(null).asInstanceOf[Double] == 25.0)
    // one hash with bit 0 and bit 63 set → majority of one vote sets both
    val sh = SimHash64(
      Literal.create(Array((1L << 63) | 1L), ArrayType(LongType)))
    assert(sh.eval(null).asInstanceOf[Long] == ((1L << 63) | 1L))
  }
}
