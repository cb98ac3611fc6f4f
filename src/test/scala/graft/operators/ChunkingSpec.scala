package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Invariants of the two chunking strategies that the hash oracle cannot
  * see (it only pins equality with DuckDB on one corpus). */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q96 fixed-stride chunks cover every token and overlap by C-S") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n"))
    val chunks = SparkEntry.queries("q96_chunk_fixed")(spark, sf)
    // coverage: per doc, chunk k starts at 24k+1 and carries
    // min(32, n-24k) tokens; the union of [start, start+len) is [1, n].
    // Sufficient check with clamped slices: last chunk must reach token n,
    // and every non-final chunk must be full-width (32) — together with
    // stride 24 < width 32 that leaves no gap.
    val byDoc = chunks.groupBy("doc_id")
      .agg(max($"chunk_idx" * 24 + $"n_tokens").as("reach"))
    val joined = byDoc.join(docs, "doc_id")
    assert(joined.filter($"reach" =!= $"n").count() == 0)
    // non-final chunks are always full-width
    val nonFinalPartial = chunks.as("c")
      .join(chunks.groupBy("doc_id").agg(max("chunk_idx").as("km")), "doc_id")
      .filter($"chunk_idx" < $"km" && $"n_tokens" =!= 32)
    assert(nonFinalPartial.count() == 0)
  }

  test("q97 chunk word-counts and hashes reassemble the document") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n"))
    val chunks = SparkEntry.queries("q97_chunk_cdc")(spark, sf)
    val byDoc = chunks.groupBy("doc_id").agg(sum("n_words").as("nw"))
    assert(byDoc.join(docs, "doc_id").filter($"nw" =!= $"n").count() == 0)
  }

  test("q97 content-defined boundaries are shift-local") {
    // Append a prefix word to a document: fixed-stride re-chunks the whole
    // doc; CDC must leave every chunk AFTER the first boundary identical.
    // Reproduce the operator's hash/boundary rule on two word sequences
    // differing by one prepended word and compare chunk-hash multisets.
    def cdcChunks(words: Seq[String]): Seq[Long] = {
      val hw = words.map(w => (w.head.toInt * 131 + w.length).toLong)
      val out = Seq.newBuilder[Long]
      var acc = 0L
      hw.foreach { h =>
        acc += h
        if (h % 8 == 0) { out += acc; acc = 0L }
      }
      if (acc != 0L) out += acc
      out.result()
    }
    // vary first char AND length so h = ascii·131 + len sweeps residues
    // mod 8 (a fixed first char makes every word a non-boundary)
    val base = (0 until 200).map(i =>
      ('a' + i % 26).toChar.toString + "x" * (i % 5))
    val shifted = "zz" +: base
    val a = cdcChunks(base)
    val b = cdcChunks(shifted)
    assert(a.size > 5, "corpus must produce several chunks")
    // everything from the first boundary on is untouched: the two chunk
    // sequences share a common suffix of all but at most one chunk of `a`
    val suffix = a.reverse.zip(b.reverse).takeWhile(p => p._1 == p._2).size
    assert(suffix >= a.size - 1)
  }
}
