package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Document chunking for training-data preparation (SURVEY.md §2C):
  * splitting long documents into model-context-sized pieces is the step
  * between curation (dedup/quality) and packing (q91), and the chunk
  * boundary rule decides whether downstream dedup can ever line up.
  *
  * Two standard strategies:
  *  - fixed-stride windows (q96): chunk k covers tokens [k·S+1, k·S+C] —
  *    the overlap C−S preserves cross-boundary context for training;
  *  - content-defined chunks (q97): a boundary fires where a per-word
  *    rolling fingerprint hits 0 mod 8, so an insertion early in a
  *    document shifts ONE chunk, not every chunk after it — the property
  *    fixed-stride lacks and chunk-level dedup needs (same trick as
  *    rsync/LBFS content-defined chunking).
  *
  * Scale notes (100 TB posture): both are per-document — a narrow
  * explode, and (q97) a window partitioned by doc_id — so the work is
  * embarrassingly parallel over documents; no cross-document shuffle
  * except the driver-contract ORDER BY. Chunk counts per doc are bounded
  * (≤ n/S + 1), so the explode fan-out is linear in corpus tokens.
  */
object Chunking {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Chunk size / stride (overlap = 8 tokens) for q96. */
  private val C = 32
  private val S = 24

  val defs: Seq[QueryDef] = Seq(

    // ── fixed-stride overlapping chunks: the "context window prep" shape.
    //    Chunk starts are 1, S+1, 2S+1, … up to kmax = ceil((n−C)/S) so
    //    the tail is always covered; slice clamps the last chunk.
    QueryDef(
      "q96_chunk_fixed",
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |p AS (SELECT doc_id, ws, len(ws) AS n,
         |  CAST(ceil(greatest(n - $C, 0) / $S.0) AS INTEGER) AS kmax FROM t),
         |x AS (SELECT doc_id, ws, n, unnest(range(0, kmax + 1)) AS k FROM p),
         |c AS (SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
         |       ws[k*$S+1 : k*$S+$C] AS chunk FROM x)
         |SELECT doc_id, chunk_idx, CAST(len(chunk) AS INTEGER) AS n_tokens,
         |  array_to_string(chunk, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("kmax",
          ceil(greatest(size(col("ws")) - C, lit(0)) / S.toDouble).cast("int"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(0), col("kmax"))).as("k"))
        .select(col("doc_id"), col("k").cast("int").as("chunk_idx"),
          slice(col("ws"), col("k") * S + 1, lit(C)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_tokens"),
          concat_ws(" ", col("chunk")).as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ── content-defined chunks: boundary where the word fingerprint
    //    (ascii(first char)·131 + length — the q53 polynomial term,
    //    engine-reproducible with no hash library) ≡ 0 mod 8, giving
    //    ~8-word expected chunks. The boundary word CLOSES its chunk
    //    (cid = running boundary count minus own flag). Emitting an
    //    additive chunk_hash keeps the oracle integer-exact.
    QueryDef(
      "q97_chunk_cdc",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |x AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS pos,
        |        unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, pos,
        |        CAST(ascii(w)*131 + length(w) AS BIGINT) AS hw,
        |        CASE WHEN (ascii(w)*131 + length(w)) % 8 = 0
        |             THEN 1 ELSE 0 END AS b FROM x),
        |c AS (SELECT doc_id, pos, hw,
        |        sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b AS cid
        |      FROM h)
        |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        |  CAST(count(*) AS INTEGER) AS n_words,
        |  CAST(sum(hw) AS BIGINT) AS chunk_hash
        |FROM c GROUP BY doc_id, cid
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val hw = (ascii(col("w")) * 131 + length(col("w"))).cast("long")
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), hw.as("hw"),
          when(hw % 8 === 0, 1).otherwise(0).as("b"))
        .withColumn("cid", sum("b").over(w) - col("b"))
        .groupBy(col("doc_id"), col("cid"))
        .agg(count(lit(1)).cast("int").as("n_words"),
          sum("hw").as("chunk_hash"))
        .select(col("doc_id"), col("cid").cast("int").as("chunk_id"),
          col("n_words"), col("chunk_hash"))
        .orderBy("doc_id", "chunk_id")
    }
  )
}
