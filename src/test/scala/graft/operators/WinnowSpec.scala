package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Invariants of the winnowing fingerprint sketch (q146) beyond the hash
  * oracle: the MOSS guarantee on crafted inputs, no false sharing, the
  * reported pairs re-derived from raw text, and sketch compression. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("guarantee: a shared >=6-token (k+w-1) run yields a shared fingerprint") {
    val run = "alpha beta gamma delta epsilon zeta" // the copied run
    val a = s"one two three $run four five six"
    val b = s"seven eight nine ten $run eleven twelve"
    val fps = TextDedup.winnowFingerprints(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "winnowing must surface a 6-token copied run")
  }

  test("disjoint-vocabulary docs share no fingerprint") {
    val fps = TextDedup.winnowFingerprints(
        Seq((1L, "a1 a2 a3 a4 a5 a6 a7 a8"),
            (2L, "b1 b2 b3 b4 b5 b6 b7 b8")).toDF("doc_id", "text"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(fps(1L).intersect(fps(2L)).isEmpty)
  }

  test("native WinnowFP equals the compositional transform/md5/min form") {
    import org.apache.spark.sql.Column
    val ws = col("ws")
    val gram = (i: Column) => concat_ws(" ",
      element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))
    val comp = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(ws) >= 6)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(ws) - 2),
          i => graft.plans.HexWindowToLong.hexWindow(
            md5(encode(gram(i), "UTF-8")), 1)).as("hs"))
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("hs")) - 3),
          j => array_min(slice(col("hs"), j, lit(4))))).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .as[(Long, Long)].collect().toSet
    val native = TextDedup.winnowFingerprints(
        Tables(spark, sf, "documents").select(col("doc_id"), col("text")))
      .as[(Long, Long)].collect().toSet
    assert(native == comp,
      s"native/compositional fingerprint sets differ: ${native.size} vs ${comp.size}")
  }

  test("q146 pairs really share >=2 distinct 3-grams (recomputed from text)") {
    val pairs = SparkEntry.queries("q146_winnow_pairs")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus near-dups must surface winnow pairs")
    val texts = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    pairs.foreach { case (i, j, n) =>
      val shared = grams(texts(i)).intersect(grams(texts(j))).size
      // each distinct shared fingerprint is a distinct shared 3-gram
      // (60-bit md5 windows - collisions negligible), so the raw texts
      // must share at least as many grams as reported fingerprints
      assert(shared >= 2,
        s"pair ($i,$j) reports n_shared=$n but texts share only $shared grams")
    }
  }

  test("the sketch compresses the gram stream (density ~2/(w+1))") {
    val fpCount = TextDedup.winnowFingerprints(
      Tables(spark, sf, "documents").select(col("doc_id"), col("text"))).count()
    val gramCount = Tables(spark, sf, "documents")
      .select(size(split(col("text"), " ")).as("n")).filter(col("n") >= 6)
      .agg(sum(col("n") - 2)).as[Long].head()
    assert(fpCount * 2 < gramCount,
      s"winnowing must keep well under half the grams ($fpCount of $gramCount)")
  }
}
