package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the REAL-codec path of the multimodal decode (r17 verdict ask
  * #5): a deterministic PNG is rendered with the JDK's own ImageIO,
  * pushed through the SAME mapPartitions query path as q58
  * ([[Multimodal.decodeFeatures]]), and its features are checked
  * against a reference computed in this spec from the painted pixel
  * values — so the magic-byte sniff, the ImageIO decode, and the
  * integer-luma feature math are all exercised end to end. The text
  * fallback rides the same batch, proving one partition can mix
  * modalities. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  /** A 8×4 PNG painted with a deterministic per-pixel gradient —
    * lossless format + explicit pixel values = a bit-stable fixture
    * with no file on disk. */
  private def renderPng(w: Int, h: Int): (Array[Byte], Array[Int]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgbs = new Array[Int](w * h)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31) % 256
      val g = (y * 73 + 5) % 256
      val b = (x * 7 + y * 11) % 256
      rgbs(i) = (r << 16) | (g << 8) | b
      img.setRGB(x, y, rgbs(i))
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos),
      "the JDK must carry a PNG writer")
    (bos.toByteArray, rgbs)
  }

  /** The reference features, derived in-spec from the painted RGB
    * values (integer BT.601 luma — the public formula, restated here
    * rather than called from production code). */
  private def expected(rgbs: Array[Int]): (Long, Seq[Long], Int, String) = {
    val luma = rgbs.map { rgb =>
      (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587
        + (rgb & 0xFF) * 114) / 1000
    }
    val hist = new Array[Long](16)
    luma.foreach(l => hist(l % 16) += 1)
    val resized = luma.indices.collect {
      case i if i % 4 == 0 => luma(i).toByte
    }.toArray
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(resized).map("%02x".format(_)).mkString
    (luma.map(_.toLong).sum, hist.toSeq, resized.length, md5)
  }

  test("a real PNG decodes through ImageIO on the q58 query path; a " +
      "text payload in the same batch takes the stub — sniff-routed") {
    val (png, rgbs) = renderPng(8, 4)
    assert(Multimodal.isPng(png), "ImageIO's PNG must carry the magic")
    assert(!Multimodal.isPng("plain text bytes".getBytes("UTF-8")))
    val (sumL, histL, nResized, md5L) = expected(rgbs)
    val rows = Multimodal.decodeFeatures(
        Seq((7L, png), (8L, "alpha beta gamma".getBytes("UTF-8")))
          .toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    val img = rows(0)
    assert(img.getAs[Long]("doc_id") == 7L)
    assert(img.getAs[Int]("n_bytes") == 32,
      "n_bytes on the codec path counts luma SAMPLES (w*h)")
    assert(img.getAs[Long]("sum_bytes") == sumL,
      s"luma sum: got ${img.getAs[Long]("sum_bytes")}, want $sumL")
    assert(img.getAs[String]("histogram")
        == histL.mkString(","),
      s"luma histogram mismatch: ${img.getAs[String]("histogram")}")
    assert(img.getAs[Int]("resized_bytes") == nResized)
    assert(img.getAs[String]("resized_md5") == md5L,
      "the 4x-stride resize must run over decoded luma, not raw bytes")
    // the text row decodes via the stub: features over raw utf-8 bytes
    val txt = rows(1)
    val bytes = "alpha beta gamma".getBytes("UTF-8")
    assert(txt.getAs[Int]("n_bytes") == bytes.length)
    assert(txt.getAs[Long]("sum_bytes") == bytes.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("PNG decode is deterministic across encode round-trips (the " +
      "fixture can be regenerated, not stored)") {
    val (png1, _) = renderPng(8, 4)
    val (png2, _) = renderPng(8, 4)
    val f = Multimodal.decodeFeatures(
        Seq((1L, png1), (2L, png2)).toDF("doc_id", "payload"))
      .select("sum_bytes", "histogram", "resized_md5")
      .collect().map(_.toString).toSet
    assert(f.size == 1,
      s"two renders of the same pixels must decode identically: $f")
  }

  /** A WAV synthesized with the JDK's own writer from explicit PCM
    * samples — the audio twin of [[renderPng]]: lossless container +
    * known samples = a bit-stable fixture with no file on disk. */
  private def renderWav16(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("a real WAV decodes through javax.sound.sampled on the q58 " +
      "query path — sniff-routed beside PNG and text in one batch") {
    // deterministic 16-bit signed samples spanning the range
    val samples = Array.tabulate[Short](40)(i =>
      ((i * 3001 - 20000) % 32768).toShort)
    val wav = renderWav16(samples)
    assert(Multimodal.isWav(wav), "the JDK's WAV must carry RIFF/WAVE")
    assert(!Multimodal.isWav("RIFFonly text not wave".getBytes("UTF-8")),
      "RIFF without the WAVE tag must not route to the audio codec")
    assert(!Multimodal.isPng(wav) && !Multimodal.isWav(renderPng(8, 4)._1),
      "the two codecs' sniffs must not overlap")
    // reference: the documented exact-integer 8-bit reduction of the
    // signed samples ((v >> 8) + 128), then the shared feature math
    val signal = samples.map(v => (((v >> 8) + 128) & 0xFF))
    val hist = new Array[Long](16)
    signal.foreach(b => hist(b % 16) += 1)
    val resized = signal.indices.collect {
      case i if i % 4 == 0 => signal(i).toByte
    }.toArray
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(resized).map("%02x".format(_)).mkString
    val rows = Multimodal.decodeFeatures(
        Seq((3L, wav), (4L, "alpha beta".getBytes("UTF-8")),
          (5L, renderPng(8, 4)._1))
          .toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    val aud = rows(0)
    assert(aud.getAs[Int]("n_bytes") == samples.length,
      "n_bytes on the audio path counts SAMPLES (frames)")
    assert(aud.getAs[Long]("sum_bytes") == signal.map(_.toLong).sum,
      s"sample sum: got ${aud.getAs[Long]("sum_bytes")}")
    assert(aud.getAs[String]("histogram") == hist.mkString(","),
      s"sample histogram mismatch: ${aud.getAs[String]("histogram")}")
    assert(aud.getAs[Int]("resized_bytes") == resized.length)
    assert(aud.getAs[String]("resized_md5") == md5,
      "the 4x-stride decimation must run over decoded samples")
    // the text row still stubs; the PNG row still decodes as an image
    val bytes = "alpha beta".getBytes("UTF-8")
    assert(rows(1).getAs[Long]("sum_bytes")
      == bytes.map(_ & 0xFF).map(_.toLong).sum)
    assert(rows(2).getAs[Int]("n_bytes") == 32)
  }
}
