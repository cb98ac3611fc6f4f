package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CacheRegistry, QueryDef, Tables}

/** Multimodal-column operators (SURVEY.md §2C): opaque binary payloads
  * with typed metadata, decode / feature-extract / frame-sample plumbing.
  *
  * The decode step sniffs the payload's magic bytes: a real PNG decodes
  * through a REAL image codec (the JDK's ImageIO — [[decodePayload]],
  * r18; spec-driven end to end over a rendered image) and a real
  * RIFF/WAVE payload through a REAL audio codec (the JDK's
  * `javax.sound.sampled` — r19; spec-driven over a synthesized PCM
  * wave), while the synthetic corpus's text-byte payloads take the
  * DETERMINISTIC STUB path (byte histogram instead of pixels/samples —
  * the testdata carries no real media, so the stub keeps q56–q59
  * oracled). Everything around the codec —
  * binary column handling, schema, partition-preserving batch
  * iteration, frame chunking, metadata structs — is shared by both
  * paths and is exactly what a production pipeline keeps when swapping
  * in an FFI codec for formats the JDK lacks.
  *
  * Scale notes (100 TB posture):
  *  - binary payloads stay opaque to the shuffle: every query here either
  *    never shuffles payload bytes (metadata is projected out first) or
  *    joins on keys with the payload carried through a single narrow map;
  *  - q58 is the Scala analogue of a mapInPandas batch UDF: a typed
  *    Dataset#mapPartitions that decodes a whole partition per task —
  *    codec initialization amortizes per-partition, not per-row (the
  *    pattern that matters when the codec is an FFI library);
  *  - frame sampling (q59) emits fixed-size frames via transform +
  *    posexplode — frames inherit the parent's partitioning, no skew.
  */
object Multimodal {
  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** documents with a synthesized binary payload column, as a real
    * multimodal table would carry (doc_id, metadata..., payload BINARY). */
  private def withPayload(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        encode(col("text"), "UTF-8").as("payload"))

  /** q58's decode pipeline over ANY (doc_id, payload BINARY) frame —
    * the mapInPandas-shaped batch decode: typed Dataset#mapPartitions
    * (codec init amortizes per partition), [[decodePayload]] per row
    * (PNG sniff → real ImageIO decode; text bytes → the stub), typed
    * output schema with the histogram serialized to a scalar
    * (array-valued result columns don't survive the driver's pandas
    * row compare — the TopKAggregate contract). Factored off q58 so
    * the real-codec spec drives the SAME query path over a rendered
    * PNG payload. */
  private[operators] def decodeFeatures(payloads: DataFrame): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would happen once per partition here
        it.map { case (id, bytes) => decodePayload(id, bytes) }
      }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("sum_bytes"),
        array_join(col("histogram").cast("array<string>"), ",")
          .as("histogram"),
        col("resized_bytes"), col("resized_md5"))
  }

  /** Decoded "features" for one payload — THE STUB: a real pipeline would
    * decode pixels/samples here; we compute a 16-bin byte histogram and
    * byte stats, deterministically, so tests stay meaningful. */
  final case class PayloadFeatures(
      doc_id: Long,
      n_bytes: Int,
      sum_bytes: Long,
      histogram: Array[Long],
      resized_bytes: Int,
      resized_md5: String)

  /** The payload decoder the multimodal queries run: a MAGIC-BYTE
    * SNIFF routes a real PNG payload through a real JDK image codec
    * ([[decodePng]] — ImageIO decode, features over the raster's luma
    * signal), a real RIFF/WAVE payload through a real JDK audio codec
    * ([[decodeWav]] — javax.sound.sampled PCM decode, features over an
    * 8-bit reduction of channel 0's samples), and everything else
    * through the deterministic text-bytes fallback ([[decodeStub]] —
    * the synthetic corpus carries utf-8 text in the payload column, so
    * its oracle is byte math over characters). All paths produce the
    * SAME feature shape from the same [[featuresOf]] math; only the
    * SIGNAL differs (decoded luma vs PCM samples vs raw bytes) —
    * exactly the boundary a production pipeline keeps when it swaps
    * codecs. Spec-gated: MultimodalSpec renders a real PNG with
    * ImageIO and synthesizes a real WAV, pushes both through the same
    * mapPartitions query path as q58, and checks the decoded features
    * against independently computed references. */
  private[operators] def decodePayload(docId: Long,
      payload: Array[Byte]): PayloadFeatures =
    if (isPng(payload)) decodePng(docId, payload)
    else if (isWav(payload)) decodeWav(docId, payload)
    else decodeStub(docId, payload)

  /** The 8-byte PNG signature (public PNG spec, ISO/IEC 15948 §5.2). */
  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private[operators] def isPng(payload: Array[Byte]): Boolean =
    payload.length >= PngMagic.length &&
      java.util.Arrays.equals(payload, 0, PngMagic.length,
        PngMagic, 0, PngMagic.length)

  /** RIFF/WAVE container sniff (public RIFF spec): bytes 0–3 "RIFF",
    * bytes 8–11 "WAVE" (4–7 are the chunk size — payload-dependent). */
  private val RiffMagic = "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val WaveTag = "WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private[operators] def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      java.util.Arrays.equals(payload, 0, 4, RiffMagic, 0, 4) &&
      java.util.Arrays.equals(payload, 8, 12, WaveTag, 0, 4)

  /** REAL codec path: decode the PNG with the JDK's ImageIO and run
    * the shared feature math over the raster's integer luma signal
    * (BT.601 in exact integer thousandths — no float, so the features
    * are deterministic across JVMs). n_bytes counts luma SAMPLES
    * (w·h) and "resize" is the same 4× stride decimation the stub
    * applies, now over pixels — the downstream schema and batch shape
    * are identical to the fallback's, which is the point. */
  private def decodePng(docId: Long, payload: Array[Byte]): PayloadFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"decodePayload: PNG-tagged payload of doc $docId failed to decode")
    val w = img.getWidth
    val h = img.getHeight
    val luma = new Array[Byte](w * h)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        luma(i) = ((((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587
          + (rgb & 0xFF) * 114) / 1000).toByte
        i += 1
        x += 1
      }
      y += 1
    }
    featuresOf(docId, luma)
  }

  /** REAL audio codec path (r18 verdict #5 — the PNG closure recipe on
    * the RIFF family): decode the WAV with the JDK's
    * `javax.sound.sampled` and run the shared feature math over an
    * 8-bit-per-sample reduction of channel 0's PCM signal — the audio
    * analogue of the PNG path's luma plane. The reduction is exact
    * integer arithmetic (no float), so features are deterministic
    * across JVMs: 8-bit unsigned PCM uses the stored byte as-is
    * (already the 0–255 signal domain); 16-bit signed PCM takes the
    * sample's high byte re-biased to unsigned ((v >> 8) + 128 ∈
    * [0, 255]), honoring the container's declared endianness. n_bytes
    * counts SAMPLES (frames), like the PNG path counts pixels, and
    * the 4× stride "resize" is audio decimation over samples — schema
    * and batch shape identical to both other paths, which is the
    * point. Formats the JDK codec cannot parse (or non-PCM encodings)
    * fail loudly — a tagged-but-undecodable payload is feed
    * corruption, not a stub case. */
  private def decodeWav(docId: Long, payload: Array[Byte]): PayloadFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // IOException too, not just UnsupportedAudioFileException: a
    // payload truncated mid-header passes the 12-byte sniff but makes
    // the JDK reader throw EOF/IO — without the wrap it escapes as a
    // bare executor exception with no doc identification, and the
    // operator bisects the batch to find the corrupt row
    val in =
      try AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e @ (_: javax.sound.sampled.UnsupportedAudioFileException
            | _: java.io.IOException) =>
          throw new IllegalArgumentException(
            s"decodePayload: WAV-tagged payload of doc $docId failed to " +
              "decode", e)
      }
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      require(enc == AudioFormat.Encoding.PCM_SIGNED
          || enc == AudioFormat.Encoding.PCM_UNSIGNED,
        s"decodePayload: doc $docId WAV encoding $enc — this codec " +
          "decodes PCM only")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16,
        s"decodePayload: doc $docId WAV has $bits-bit samples — " +
          "8/16-bit PCM only")
      val frameSize = fmt.getFrameSize
      val bytes = in.readAllBytes()
      val nFrames = bytes.length / frameSize
      val signal = new Array[Byte](nFrames)
      var f = 0
      while (f < nFrames) {
        val off = f * frameSize
        signal(f) =
          if (bits == 8) {
            // 8-bit WAV PCM is stored unsigned — already 0–255
            if (enc == AudioFormat.Encoding.PCM_UNSIGNED) bytes(off)
            else (bytes(off) + 128).toByte
          } else {
            val (lo, hi) =
              if (fmt.isBigEndian) (bytes(off + 1), bytes(off))
              else (bytes(off), bytes(off + 1))
            val v = ((hi.toInt << 8) | (lo & 0xFF)).toShort.toInt
            val u = if (enc == AudioFormat.Encoding.PCM_UNSIGNED)
              ((hi & 0xFF) << 8 | (lo & 0xFF)) >> 8
            else (v >> 8) + 128
            u.toByte
          }
        f += 1
      }
      featuresOf(docId, signal)
    } catch { case e: java.io.IOException =>
      // readAllBytes on a truncated stream — same doc-tagged wrap
      throw new IllegalArgumentException(
        s"decodePayload: WAV-tagged payload of doc $docId failed to " +
          "decode", e)
    } finally in.close()
  }

  private def decodeStub(docId: Long, payload: Array[Byte]): PayloadFeatures =
    // the non-PNG fallback: the synthetic corpus carries TEXT bytes in
    // the payload column (no real image/audio payloads exist in the
    // testdata), so there is nothing to decode; the features run over
    // the raw bytes instead, deterministically and oracled.
    featuresOf(docId, payload)

  /** The shared feature math over a byte SIGNAL (decoded luma for a
    * real image, raw bytes for the text fallback): 16-bin histogram,
    * byte sum, 4× stride "resize" + md5. sum (not mean) keeps the
    * output integer-exact for the oracle — AVG of ints lands on
    * round-half boundaries (oracle discipline). */
  private def featuresOf(docId: Long, signal: Array[Byte]): PayloadFeatures = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < signal.length) {
      val b = signal(i) & 0xFF
      hist(b % 16) += 1
      sum += b
      i += 1
    }
    // "resize": 4× stride downsample — image resize / audio decimation
    // shape; deterministic, keeps the batch shape real
    val resized = new Array[Byte]((signal.length + 3) / 4)
    var j = 0
    while (j < resized.length) { resized(j) = signal(j * 4); j += 1 }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(resized).map("%02x".format(_)).mkString
    PayloadFeatures(docId, signal.length, sum, hist, resized.length, md5)
  }

  val defs: Seq[QueryDef] = Seq(

    // ── multimodal relation: text metadata ⋈ vector modality by key
    QueryDef(
      "q56_multimodal_join",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
        |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, label,
        |  round(sqrt(list_sum([x*x for x in v])), 4) AS vec_norm
        |FROM documents JOIN e ON doc_id = vec_id ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        import graft.functions.VectorFunctions._
        val d = T(s, dir, "documents").select("doc_id", "lang", "n_chars")
        val e = T(s, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("v"), col("label"))
        d.join(e, d("doc_id") === e("vec_id"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
            round(norm(col("v")), 4).as("vec_norm"))
          .orderBy("doc_id")
    },

    // ── binary payload + typed metadata (schema-first multimodal column)
    QueryDef(
      "q57_binary_metadata",
      """SELECT doc_id, lang,
        |  CAST(length(text) AS INTEGER) AS byte_len,
        |  md5(text) AS content_md5,
        |  lower(hex(substr(text, 1, 8)::BLOB)) AS header_hex
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      withPayload(s, dir)
        .select(col("doc_id"), col("lang"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_md5"),
          lower(hex(substring(col("payload"), 1, 8))).as("header_hex"))
        .orderBy("doc_id")
    },

    // ── batch decode via typed Dataset#mapPartitions (mapInPandas shape):
    //    per-partition iteration, stubbed codec, typed output schema.
    //    The STUB stays the point — but its byte math IS checkable: the
    //    payloads are the docs' utf-8 bytes and the corpus is ASCII, so
    //    the oracle reproduces byte ops with character ops (the same
    //    text↔payload equivalence q57's oracle already relies on).
    QueryDef(
      "q58_decode_features",
      """WITH x AS (SELECT doc_id, text,
        |        unnest(range(1, length(text) + 1)) AS i FROM documents),
        |b AS (SELECT doc_id, ascii(substr(text, i, 1)) AS byte FROM x),
        |h AS (SELECT doc_id, byte % 16 AS bin, count(*) AS c
        |      FROM b GROUP BY 1, 2),
        |g AS (SELECT d.doc_id, r.bin
        |      FROM (SELECT doc_id FROM documents) d
        |      CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) r),
        |hs AS (SELECT g.doc_id,
        |         string_agg(CAST(coalesce(h.c, 0) AS VARCHAR), ','
        |                    ORDER BY g.bin) AS histogram
        |       FROM g LEFT JOIN h ON g.doc_id = h.doc_id AND g.bin = h.bin
        |       GROUP BY g.doc_id),
        |s AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS n_bytes,
        |        (SELECT CAST(coalesce(sum(byte), 0) AS BIGINT) FROM b
        |         WHERE b.doc_id = documents.doc_id) AS sum_bytes,
        |        CAST((length(text) + 3) // 4 AS INTEGER) AS resized_bytes,
        |        CASE WHEN length(text) = 0 THEN md5('')
        |             ELSE md5(array_to_string(
        |          [substr(text, i, 1)
        |           for i in range(1, length(text) + 1) if (i - 1) % 4 = 0],
        |          '')) END AS resized_md5
        |      FROM documents)
        |SELECT s.doc_id, s.n_bytes, s.sum_bytes, hs.histogram,
        |  s.resized_bytes, s.resized_md5
        |FROM s JOIN hs ON s.doc_id = hs.doc_id
        |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      decodeFeatures(withPayload(s, dir).select("doc_id", "payload"))
        .orderBy("doc_id")
    },

    // ── perceptual-hash near-dup over the BINARY payload: the
    //    multimodal twin of q43's simhash (global bit-sketch) and q53's
    //    text fingerprint — the dedup modality an image/audio corpus
    //    needs. Classic blockhash construction on the payload's byte
    //    signal: 64 contiguous blocks, bit b = "block-b mean ≥ global
    //    mean", compared as s_b·n ≥ total·len_b so the whole sketch is
    //    INTEGER-exact (no float mean, no rounding divergence). The
    //    64-bit hash is carried as eight 8-bit band values — the bands
    //    double as the LSH bucketing for the pair join (equality on any
    //    band, the q43/q44 shape: keyed shuffle, per-key cost C(df,2),
    //    never all-pairs). 8×8 banding is the recall knob: near-dup
    //    payloads here land at hamming 9–12 (too far for 4×16 bands to
    //    catch — measured 0 recall at sf0.01), while 8-bit bands give
    //    full recall of every hamming ≤ 12 pair at sf0.01 and a ~5%
    //    candidate rate at sf0.1. Pairs report hamming ≤ 12 of 64.
    //    A real image pipeline swaps the byte signal for decoded luma
    //    (the q58 stub boundary); every plan shape here — narrow
    //    per-doc sketch, banded candidate join, exact verify on the
    //    carried hash — is the one it keeps. ASCII corpus ⇒ byte ops =
    //    char ops, the same text↔payload equivalence q57/q58 pin.
    QueryDef(
      "q171_phash_pairs",
      """WITH b AS (SELECT doc_id,
        |    [ascii(substr(text, i, 1)) for i in range(1, length(text)+1)] AS bs
        |  FROM documents WHERE length(text) >= 64),
        |t AS (SELECT doc_id, bs, len(bs) AS n,
        |      CAST(list_sum(bs) AS BIGINT) AS tot FROM b),
        |blk AS (SELECT doc_id, n, tot,
        |  [CAST(coalesce(list_sum(bs[(j*n)//64 + 1 : ((j+1)*n)//64]), 0)
        |        AS BIGINT) for j in range(0, 64)] AS ss,
        |  [((j+1)*n)//64 - (j*n)//64 for j in range(0, 64)] AS ls FROM t),
        |bits AS (SELECT doc_id,
        |  [CASE WHEN ss[j+1] * n >= tot * ls[j+1] THEN 1 ELSE 0 END
        |   for j in range(0, 64)] AS bv FROM blk),
        |h AS (SELECT doc_id,
        |  [CAST(list_sum([bv[8*b+k+1] * (1 << k) for k in range(0, 8)])
        |        AS BIGINT) for b in range(0, 8)] AS hb FROM bits)
        |SELECT a.doc_id AS doc_i, b2.doc_id AS doc_j,
        |  CAST(list_sum([bit_count(xor(a.hb[x+1], b2.hb[x+1]))
        |                 for x in range(0, 8)]) AS INTEGER) AS hamming
        |FROM h a JOIN h b2 ON a.doc_id < b2.doc_id
        |  AND len(list_filter(range(0, 8), x -> a.hb[x+1] = b2.hb[x+1])) >= 1
        |WHERE list_sum([bit_count(xor(a.hb[x+1], b2.hb[x+1]))
        |                for x in range(0, 8)]) <= 12
        |ORDER BY doc_i, doc_j""".stripMargin) { (s, dir) =>
      // The sketch is ONE narrow codegen'd pass per row — the native
      // plans.BlockHash64 expression computes all 64 block means and the
      // 8 band values straight off the payload bytes, zero shuffles.
      // Earlier forms, kept as the measurement record: per-index
      // substr(i,1) is O(n²) per doc (UTF8String recounts code points
      // from the head — 5.9 s at sf0.1); a 64×(slice+aggregate)
      // expression tree pays seconds of codegen/eval overhead (7.4 s
      // cold); the explode → (doc, block) partial-agg pipeline was
      // correct and map-side-combined but paid two exchanges + three
      // aggregates (~0.9 s build). The native pass is equivalence-
      // pinned against the aggregation form in NativeExprSpec.
      val hashes = CacheRegistry.cached(s, s"phash:$dir") {
        withPayload(s, dir)
          .filter(length(col("payload")) >= 64)
          .select(col("doc_id"),
            graft.plans.BlockHash64.blockhash64(col("payload")).as("hb"))
          .select(col("doc_id") +:
            (0 until 8).map(b => element_at(col("hb"), b + 1).as(s"h$b")): _*)
      }
      val hCols = (0 until 8).map(b => col(s"h$b"))
      val bands = hashes.select(col("doc_id") +: hCols :+
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"), col(s"h$b").as("bv"))): _*)).as("bd"): _*)
        .select(col("doc_id") +: hCols :+ col("bd.band") :+ col("bd.bv"): _*)
      val ham = (0 until 8).map(b =>
        bit_count(col(s"a.h$b").bitwiseXOR(col(s"b.h$b"))))
        .reduce(_ + _)
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
          ham.cast("int").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 12)
        .orderBy("doc_i", "doc_j")
    },

    // ── frame sampling: fixed 256-byte frames, per-frame digest
    QueryDef(
      "q59_frame_sample",
      """WITH f AS (SELECT doc_id,
        |  [md5(substr(text, (i-1)*256 + 1, 256))
        |   for i in range(1, CAST(ceil(length(text)/256.0) AS INTEGER) + 1)] AS frames
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(generate_subscripts(frames, 1) - 1 AS INTEGER) AS frame_no,
        |  unnest(frames) AS frame_md5
        |FROM f ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
      val nFrames = ceil(length(col("text")) / 256.0).cast("int")
      T(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), nFrames),
            i => md5(encode(col("text").substr((i - 1) * lit(256) + 1, lit(256)),
              "UTF-8")))).as(Seq("frame_no", "frame_md5")))
        .select(col("doc_id"), col("frame_no"), col("frame_md5"))
        .orderBy("doc_id", "frame_no")
    }
  )
}
