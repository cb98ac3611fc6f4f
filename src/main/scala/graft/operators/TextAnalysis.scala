package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis operators for training-data curation (SURVEY.md §2C):
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting, and word-frequency / TF-IDF-lite analytics.
  *
  * Scale notes (100 TB posture):
  *  - every per-document metric is a narrow map over the text column —
  *    no shuffle at all until the final ORDER BY (which the driver's
  *    parquet sink needs; a production pipeline would drop it);
  *  - the word-frequency query is the canonical explode→groupBy shape:
  *    partial aggregation combines per-partition counts before the single
  *    shuffle, so network traffic is O(vocabulary), not O(tokens);
  *  - fingerprints use integer polynomial arithmetic (no hash library),
  *    so they are engine-reproducible and cheap enough for codegen.
  */
object TextAnalysis {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private[graft] val stopwords = Seq("the", "a", "of", "and", "in", "to")

  /** UDTF-style doc expansion: one row per (`idCol`, token) with its
    * position and exact [char_start, char_end) character span in the
    * original `textCol` (single-space tokenization — char_start is the
    * exact prefix length Σ(len+1) of the tokens before it). The
    * span-alignment primitive for PII span redaction and annotation
    * projection; backs q169_tokenize_offsets. Narrow posexplode + one
    * id-keyed window — zero cross-document shuffle.
    *
    * OFFSET SEMANTICS: spans are UNICODE CODE POINT offsets (what Spark
    * `length` and DuckDB `len`/`substr` count), NOT UTF-16 code units —
    * on any astral character (emoji, surrogate pair) a Java
    * `String.substring(charStart, charEnd)` drifts; reindex with
    * `String#offsetByCodePoints` (or operate on code-point arrays)
    * when consuming spans JVM-side. TextAnalysisSpec pins this with an
    * astral fixture. */
  def tokenizeWithOffsets(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("char_start",
        coalesce(sum(length(col("tok")).cast("long") + 1L).over(w), lit(0L)))
      .select(col(idCol), col("pos").cast("int").as("pos"), col("tok"),
        col("char_start"),
        (col("char_start") + length(col("tok"))).cast("long").as("char_end"))
  }

  /** Table-agnostic stopword-density language vote over any (`idCol`,
    * `textCol`) frame: returns (`idCol`, carry…, stop_ratio 4 dp,
    * predicted) with predicted = "en" when the whitespace-token
    * stopword ratio reaches `threshold`, else "other". `carry` columns
    * pass through untouched (q50 carries the labeled `lang`). A real
    * multi-language classifier swaps `stops`+label per language and
    * takes the argmax — the plan shape (ONE narrow map, no shuffle, no
    * tokenize explosion) is the one it keeps at any corpus size.
    * Backs q50_langid. */
  private[graft] def langId(docs: DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil,
      stops: Seq[String] = stopwords, threshold: Double = 0.08): DataFrame = {
    // same reserved-name discipline as bm25Score/clusterVerdict: a
    // colliding idCol/carry would silently shadow or duplicate the
    // working/output columns instead of failing with a clear message
    val reserved = Seq("__ws", "stop_ratio", "predicted")
    val bad = ((idCol +: carry)).filter(reserved.contains)
    require(bad.isEmpty,
      s"langId: column(s) ${bad.mkString(", ")} collide with a working/" +
        s"output column (${reserved.mkString(", ")}) — rename first")
    val stopArr = array(stops.map(lit): _*)
    docs
      .select(col(idCol) +: carry.map(col) :+
        split(col(textCol), " ").as("__ws"): _*)
      .withColumn("stop_ratio",
        size(filter(col("__ws"), w => array_contains(stopArr, w)))
          * lit(1.0) / size(col("__ws")))
      .select(col(idCol) +: carry.map(col) :+
        round(col("stop_ratio"), 4).as("stop_ratio") :+
        when(col("stop_ratio") >= threshold, "en").otherwise("other")
          .as("predicted"): _*)
  }

  /** Table-agnostic heuristic quality scorecard over any (`idCol`,
    * `textCol`) frame: char/word/distinct-word counts, type-token
    * ratio, stopword ratio, average word length (assumes single-space
    * separation: chars = Σ len + n_words − 1), and the q51 keep/drop
    * verdict (20–1000 words AND ≥50% distinct). ONE narrow map over the
    * text column — scan-shaped at any corpus size. Backs
    * q51_quality_score. */
  private[graft] def qualityScore(docs: DataFrame, idCol: String,
      textCol: String, stops: Seq[String] = stopwords): DataFrame = {
    val reserved = Seq("__ws", "n_chars", "n_words", "n_distinct",
      "n_stop", "type_token_ratio", "stop_ratio", "avg_word_len", "verdict")
    require(!reserved.contains(idCol),
      s"qualityScore: idCol '$idCol' collides with a working/output " +
        s"column (${reserved.mkString(", ")}) — rename first")
    val stopArr = array(stops.map(lit): _*)
    docs
      .select(col(idCol), split(col(textCol), " ").as("__ws"),
        length(col(textCol)).as("n_chars"))
      .select(col(idCol), col("n_chars"),
        size(col("__ws")).as("n_words"),
        size(array_distinct(col("__ws"))).as("n_distinct"),
        size(filter(col("__ws"), w => array_contains(stopArr, w)))
          .as("n_stop"))
      .select(col(idCol), col("n_chars"), col("n_words"), col("n_distinct"),
        round(col("n_distinct") * lit(1.0) / col("n_words"), 4)
          .as("type_token_ratio"),
        round(col("n_stop") * lit(1.0) / col("n_words"), 4).as("stop_ratio"),
        // words are single-space separated: chars = Σlen + (n_words-1)
        round((col("n_chars") - col("n_words") + 1) * lit(1.0)
          / col("n_words"), 4).as("avg_word_len"),
        when(col("n_words").between(20, 1000)
          && col("n_distinct") * 2 >= col("n_words"), "keep")
          .otherwise("drop").as("verdict"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ── language-ID heuristic: stopword-density vote. (The synthetic
    //    corpus is same-vocabulary word soup, so the interesting part is
    //    the plumbing: per-doc token scan + ratio + threshold CASE.)
    QueryDef(
      "q50_langid",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |r AS (SELECT doc_id, lang,
        |  len(list_filter(ws, w -> w IN ('the','a','of','and','in','to'))) * 1.0
        |    / len(ws) AS stop_ratio FROM t)
        |SELECT doc_id, lang,
        |  round(stop_ratio, 4) AS stop_ratio,
        |  CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      langId(T(s, dir, "documents"), "doc_id", "text", carry = Seq("lang"))
        .orderBy("doc_id")
    },

    // ── quality scoring: length, lexical diversity, stopword density
    QueryDef(
      "q51_quality_score",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS nc
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(nc AS INTEGER) AS n_chars,
        |  CAST(len(ws) AS INTEGER) AS n_words,
        |  CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct,
        |  len(list_filter(ws, w -> w IN ('the','a','of','and','in','to'))) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_chars, n_words, n_distinct,
        |  round(n_distinct * 1.0 / n_words, 4) AS type_token_ratio,
        |  round(n_stop * 1.0 / n_words, 4) AS stop_ratio,
        |  round((n_chars - n_words + 1) * 1.0 / n_words, 4) AS avg_word_len,
        |  CASE WHEN n_words BETWEEN 20 AND 1000
        |        AND n_distinct * 2 >= n_words THEN 'keep' ELSE 'drop' END AS verdict
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      qualityScore(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // ── token counting: whitespace tokens, regex word-ish tokens, and the
    //    chars/4 LLM-token estimate — all integer outputs
    QueryDef(
      "q52_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS re_tokens,
        |  CAST(ceil(length(text) / 4.0) AS INTEGER) AS est_llm_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
            .as("re_tokens"),
          ceil(length(col("text")) / 4.0).cast("int").as("est_llm_tokens"))
        .orderBy("doc_id")
    },

    // ── document fingerprint: position-weighted integer polynomial over
    //    words, mod 1e9+7 — order-sensitive, engine-reproducible, no hash
    //    library needed on either side
    QueryDef(
      "q53_fingerprint",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum([i * (ascii(ws[i]) * 131 + length(ws[i]))
        |            for i in range(1, len(ws)+1)]) % 1000000007 AS BIGINT) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          (aggregate(
            transform(col("ws"),
              (w, i) => (i + 1).cast("long")
                * (ascii(w) * 131 + length(w)).cast("long")),
            lit(0L), _ + _) % 1000000007L).as("fingerprint"))
        .orderBy("doc_id")
    },

    // ── word frequency + TF-IDF-lite: top-20 corpus words
    QueryDef(
      "q54_wordcount_tfidf",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |f AS (SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df FROM w
        |  GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  round(ln(n_docs * 1.0 / df), 4) AS idf
        |FROM f, n ORDER BY tf DESC, word LIMIT 20""".stripMargin) { (s, dir) =>
      val docs = T(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .crossJoin(broadcast(nDocs))
        .select(col("word"), col("tf"), col("df"),
          round(log(col("n_docs") * lit(1.0) / col("df")), 4).as("idf"))
        .orderBy(col("tf").desc, col("word"))
        .limit(20)
    },

    // ── n-gram repetition (Gopher-style quality rule): the share of a
    //    doc's word bigrams taken by its single most frequent bigram —
    //    the standard boilerplate/template detector that type-token
    //    ratio (q51) misses when repetition happens in phrases, not
    //    words. Integers + an integer threshold test only (a ratio of
    //    two small ints rounds onto half-boundaries the engines break
    //    differently). Shape: narrow bigram explode → two-phase
    //    (doc, bigram) count → per-doc max; both shuffles are keyed by
    //    doc_id-prefixed keys, so 100 TB scales by documents.
    QueryDef(
      "q94_bigram_repetition",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |  [array_to_string(ws[i:i+1], ' ') for i in range(1, len(ws))] AS bg
        |  FROM w WHERE len(ws) >= 2),
        |x AS (SELECT doc_id, len(bg) AS n_bigrams, unnest(bg) AS b FROM g),
        |c AS (SELECT doc_id, n_bigrams, b, count(*) AS cnt FROM x
        |      GROUP BY doc_id, n_bigrams, b)
        |SELECT doc_id, CAST(n_bigrams AS INTEGER) AS n_bigrams,
        |  CAST(max(cnt) AS BIGINT) AS top_bigram_count,
        |  (max(cnt) * 20 > n_bigrams) AS repetitive
        |FROM c GROUP BY doc_id, n_bigrams ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"), (size(col("ws")) - 1).as("n_bigrams"),
            explode(transform(sequence(lit(1), size(col("ws")) - 1),
              i => concat_ws(" ", element_at(col("ws"), i),
                element_at(col("ws"), i + 1)))).as("b"))
          .groupBy("doc_id", "n_bigrams", "b")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id", "n_bigrams")
          .agg(max(col("cnt")).as("top_bigram_count"),
            // repetitive iff the top bigram exceeds 5% of all bigrams
            (max(col("cnt")) * 20 > col("n_bigrams")).as("repetitive"))
          .orderBy("doc_id")
    },

    // ── duplicate-shingle fraction: how much of a doc's 3-gram stream is
    //    repeats — total 3-grams is positional (n_words − 2) while the
    //    native WordShingles expression already returns the DISTINCT set,
    //    so the dup count is a subtraction on two narrow per-doc scalars;
    //    no shuffle at all before the contract ORDER BY. Complements q94
    //    (which finds one dominant bigram; this finds diffuse repetition)
    //    and reuses the exact shingle definition q41-q44 dedup on, so a
    //    "dup_heavy" doc here is one the MinHash path will also flag.
    //    Integer outputs + an integer-threshold boolean only (dup_heavy
    //    iff dup 3-grams exceed 2% of the stream).
    QueryDef(
      "q98_dup_ngrams",
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |g AS (SELECT doc_id, len(ws) - 2 AS n_total,
        |  len(list_distinct([array_to_string(ws[i:i+2],' ')
        |    for i in range(1, len(ws)-1)])) AS n_distinct
        |  FROM w WHERE len(ws) >= 3)
        |SELECT doc_id, CAST(n_total AS INTEGER) AS n_total,
        |  CAST(n_distinct AS INTEGER) AS n_distinct,
        |  CAST(n_total - n_distinct AS INTEGER) AS n_dup,
        |  ((n_total - n_distinct) * 50 > n_total) AS dup_heavy
        |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      T(s, dir, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 2).as("n_total"),
          size(graft.plans.WordShingles.wordShingles(col("text"), 3))
            .as("n_distinct"))
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          (col("n_total") - col("n_distinct")).as("n_dup"),
          ((col("n_total") - col("n_distinct")) * 50 > col("n_total"))
            .as("dup_heavy"))
        .orderBy("doc_id")
    },

    // ── n-gram novelty: for each doc, the fraction of its DISTINCT
    //    3-grams that occur NOWHERE else in the corpus (gram df = 1) —
    //    the data-diversity/memorization-risk metric dual to q98's
    //    within-doc repetition: low novelty = the doc is assembled from
    //    corpus-common phrasing, high = it contributes unique text.
    //    Rides the shared shingle cache; one gram-keyed df shuffle +
    //    one gram-keyed membership join + one doc-keyed count — the
    //    exact q92/q98 posture, all integer outputs.
    QueryDef(
      "q162_ngram_novelty",
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(ws[i:i+2],' ')
        |    for i in range(1, len(ws)-1)]) AS s
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
        |d AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
        |nv AS (SELECT g.doc_id, count(*) AS n_novel
        |       FROM g JOIN d USING (gram) WHERE d.df = 1 GROUP BY g.doc_id)
        |SELECT sh.doc_id, CAST(len(sh.s) AS INTEGER) AS n_grams,
        |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(coalesce(nv.n_novel, 0) * 10000 // len(sh.s) AS BIGINT)
        |    AS novelty_bp
        |FROM sh LEFT JOIN nv USING (doc_id)
        |ORDER BY sh.doc_id""".stripMargin) { (s, dir) =>
      val sh = TextDedup.docShingles(s, dir)
      val g = sh.select(col("doc_id"), explode(col("sh")).as("gram"))
      val nv = g
        .join(g.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") === 1).select("gram"), "gram")
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      sh.select(col("doc_id"), size(col("sh")).as("n_grams"))
        .join(nv, Seq("doc_id"), "left")
        .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
        .withColumn("novelty_bp", expr("n_novel * 10000 div n_grams"))
        .orderBy("doc_id")
    },

    // ── octave-binned Zipf slope per source: the corpus-health
    //    diagnostic that catches a broken tokenizer or a template-spam
    //    source (token frequencies should decay roughly power-law; a
    //    flat or cliff-shaped curve is a red flag). Exact-integer
    //    construction end to end: top-100 tokens per source by
    //    (count desc, token), x = bitlen(rank), y = bitlen(count)
    //    (integer log2 octaves via length(bin(n)) — identical on both
    //    engines, no float log anywhere), then the q143 closed-form OLS
    //    from exact-integer sufficient statistics; only the final slope
    //    division is floating and it divides bit-equal integers. One
    //    vocab-sized aggregate + a per-source top-100 window over the
    //    20-row-keyed vocab frame — the corpus is scanned once.
    QueryDef(
      "q163_zipf_octave",
      """WITH t AS (SELECT source, unnest(string_split(text,' ')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
        |r AS (SELECT source, c, row_number() OVER (PARTITION BY source
        |        ORDER BY c DESC, tok) AS rn FROM c
        |      QUALIFY rn <= 100),
        |p AS (SELECT source, CAST(length(bin(rn)) AS BIGINT) AS x,
        |             CAST(length(bin(c)) AS BIGINT) AS y FROM r),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x*y) AS BIGINT) AS sxy,
        |        CAST(sum(x*x) AS BIGINT) AS sxx
        |      FROM p GROUP BY source)
        |SELECT source, CAST(n AS INTEGER) AS n,
        |  round((n*sxy - sx*sy) * 1.0 / (n*sxx - sx*sx), 6) AS slope_octaves
        |FROM s WHERE n*sxx - sx*sx <> 0 ORDER BY source""".stripMargin) {
      (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = T(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val ranked = counts
        .withColumn("rn", row_number().over(Window.partitionBy("source")
          .orderBy(col("c").desc, col("tok"))))
        .filter(col("rn") <= 100)
      val stats = ranked
        .select(col("source"),
          length(bin(col("rn").cast("long"))).cast("long").as("x"),
          length(bin(col("c"))).cast("long").as("y"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      // a degenerate source (a single token in the top list) has no
      // x variance and no defined slope — excluded on BOTH sides
      stats.filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
        .select(col("source"), col("n").cast("int").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) * lit(1.0)
            / (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope_octaves"))
        .orderBy("source")
    },

    // ── UDTF-style doc expansion: tokenize WITH CHARACTER OFFSETS —
    //    one row per (doc, token) with its position and [char_start,
    //    char_end) span in the original text. This is the alignment
    //    primitive span-level pipelines need (PII span redaction,
    //    annotation projection, span-label training data): downstream
    //    spans refer to the ORIGINAL text by character, and without the
    //    offset table every consumer re-derives them with its own
    //    off-by-one rules. In Spark-first terms the generator expression
    //    (posexplode) IS the UDTF: a narrow per-doc explode plus a
    //    doc-keyed window for the running character sum — zero
    //    cross-document shuffle except the contract ORDER BY, so the
    //    shape is embarrassingly parallel at any corpus size (same
    //    class as q97's per-doc CDC window). char_start is the exact
    //    prefix length Σ(len+1) of the space-joined tokens before it —
    //    integer arithmetic, engine-exact.
    QueryDef(
      "q169_tokenize_offsets",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |x AS (SELECT doc_id, CAST(generate_subscripts(ws,1) - 1 AS INTEGER)
        |        AS pos, unnest(ws) AS tok FROM t),
        |o AS (SELECT doc_id, pos, tok,
        |  CAST(coalesce(sum(len(tok) + 1) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS char_start
        |  FROM x)
        |SELECT doc_id, pos, tok, char_start,
        |  CAST(char_start + len(tok) AS BIGINT) AS char_end
        |FROM o ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      tokenizeWithOffsets(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "pos")
    }
  )
}
