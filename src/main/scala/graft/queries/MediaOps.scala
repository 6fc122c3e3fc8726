package graft.queries

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Multimodal decode as a DECLARED, hash-gated query family (r8 verdict:
  * image/audio decode was the one LLM-pipeline family the driver never
  * certified — only `q_binary_meta`'s byte plumbing was gated).
  *
  * The fixture pattern is `q_parse_accesslog`'s: deterministic payloads are
  * synthesized in-process (PNG via ImageIO, WAV via javax.sound — both
  * LOSSLESS containers, so decode is bit-exact by spec, unlike JPEG whose
  * IDCT rounding is implementation-defined), the REAL production decode
  * paths ([[Media.featurize]], [[Media.featurizeAudio]]) run over them as a
  * distributed Dataset, and the oracle is the VALUES-inlined expected rows
  * — every constant below is derivable by hand from the fixture definition
  * (dims, half-black/half-white luma mass, 8 kHz rate, exact 0.25 DC RMS).
  *
  * Reference anchor: the `blob` escape-hatch column
  * (/root/reference/README.md:90,242) — raw bytes opaque in transit, typed
  * views derived on read.
  */
object MediaOps extends QueryModule {

  /** Deterministic PNG: `pix(x, y)` gives the RGB of each pixel. */
  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pix(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono little-endian WAV from integer samples. */
  private def wav(samples: Array[Int], rate: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The five fixtures. StrictMath.sin (bit-exact by spec, unlike
    * Math.sin's platform intrinsics) keeps the sine payload — and with it
    * the oracle's RMS/zero-crossing constants — identical on every JVM.
    */
  private def fixtures(s: SparkSession): Dataset[Media.MediaRow] = {
    import s.implicits._
    val sine = Array.tabulate(4000)(i =>
      (0.5 * StrictMath.sin(2 * StrictMath.PI * 440 * i / 8000.0) * 32767).toInt)
    val dc = Array.fill(2000)(8192) // 8192/32768 = 0.25 exactly
    val rows = Seq(
      Media.MediaRow(1L, png(64, 32)((x, _) =>
        if (x < 32) 0x000000 else 0xFFFFFF), "image/png", 0, 0),
      Media.MediaRow(2L, png(16, 16)((_, _) => 0x808080), "image/png", 0, 0),
      Media.MediaRow(3L, wav(sine, 8000f), "audio/wav", 0, 0),
      Media.MediaRow(4L, wav(dc, 8000f), "audio/wav", 0, 0),
      Media.MediaRow(5L, "definitely not a media container".getBytes("UTF-8"),
        "application/octet-stream", 0, 0))
    s.createDataset(rows)
  }

  def queries: Seq[(String, QFn)] = Seq(
    // Both real decoders run over every payload (the operator is total —
    // a corrupt/foreign blob falls back, never fails the task); each field
    // is gated on ITS decoder having succeeded so the fallback byte
    // histogram can't leak into the image columns of an audio row.
    "q_media_meta" -> ((s, _) => {
      val media = fixtures(s)
      val img = Media.featurize(media).toDF()
        .select(col("media_id"), col("decoded").as("img_ok"),
          col("width").as("w"), col("height").as("h"),
          element_at(col("features"), 1).as("f_lo"),
          element_at(col("features"), 9).as("f_mid"),
          element_at(col("features"), 16).as("f_hi"))
      val aud = Media.featurizeAudio(media).toDF()
        .select(col("media_id"), col("decoded").as("aud_ok"),
          col("sample_rate").as("sr"), col("n_samples").as("ns"),
          col("duration_s").as("dur"), col("rms").as("r"),
          col("zero_crossings").as("zx"))
      img.join(aud, Seq("media_id"))
        .select(col("media_id"),
          when(col("img_ok"), "image").when(col("aud_ok"), "audio")
            .otherwise("blob").as("kind"),
          when(col("img_ok"), col("w")).otherwise(0).as("width"),
          when(col("img_ok"), col("h")).otherwise(0).as("height"),
          when(col("img_ok"), round(col("f_lo"), 4)).otherwise(0.0).as("lum_lo"),
          when(col("img_ok"), round(col("f_mid"), 4)).otherwise(0.0).as("lum_mid"),
          when(col("img_ok"), round(col("f_hi"), 4)).otherwise(0.0).as("lum_hi"),
          when(col("aud_ok"), col("sr")).otherwise(0.0).as("sample_rate"),
          when(col("aud_ok"), col("ns")).otherwise(0L).as("n_samples"),
          when(col("aud_ok"), round(col("dur"), 4)).otherwise(0.0).as("duration_s"),
          when(col("aud_ok"), round(col("r"), 4)).otherwise(0.0).as("rms"),
          when(col("aud_ok"), col("zx")).otherwise(0L).as("zero_x"))
        .orderBy(col("media_id"))
    }),

    // The REAL pixel resize path ([[Media.thumbnail]]: decode → aspect-fit
    // bilinear redraw → PNG re-encode) gated end-to-end: resized dims come
    // from re-DECODING the output bytes (not the metadata fields), so the
    // gate certifies the full encode round-trip. Uniform-color fixtures make
    // bilinear interpolation bit-deterministic (any weighted average of a
    // constant is that constant), so the luma-histogram shares survive the
    // resize exactly and the oracle stays hand-derivable. Small images pass
    // through byte-identical; corrupt blobs pass through undecoded.
    "q_media_resize" -> ((s, _) => {
      import s.implicits._
      val gray = 0x808080      // luma 128 → bin 8
      val blue = 0x4060A0      // luma (299·64+587·96+114·160)/1000 = 93 → bin 5
      val rows = Seq(
        Media.MediaRow(1L, png(64, 32)((_, _) => gray), "image/png", 0, 0),
        Media.MediaRow(2L, png(20, 100)((_, _) => blue), "image/png", 0, 0),
        Media.MediaRow(3L, png(8, 8)((_, _) => gray), "image/png", 0, 0),
        Media.MediaRow(4L, "not an image at all".getBytes("UTF-8"),
          "application/octet-stream", 0, 0))
      val original = s.createDataset(rows)
      val thumbs = Media.thumbnail(original, maxDim = 16)
      val redecoded = Media.featurize(thumbs).toDF()
        .select(col("media_id"), col("decoded"),
          col("width").as("w"), col("height").as("h"),
          round(element_at(col("features"), 9), 4).as("bin8"),
          round(element_at(col("features"), 6), 4).as("bin5"))
      val origBytes = original.toDF()
        .select(col("media_id"), col("bytes").as("orig_bytes"))
      thumbs.toDF().select(col("media_id"), col("bytes"))
        .join(origBytes, Seq("media_id"))
        .join(redecoded, Seq("media_id"))
        .select(col("media_id"),
          when(col("decoded"), "image").otherwise("blob").as("kind"),
          when(col("decoded"), col("w")).otherwise(0).as("width"),
          when(col("decoded"), col("h")).otherwise(0).as("height"),
          when(col("decoded"), col("bin8")).otherwise(0.0).as("lum_bin8"),
          when(col("decoded"), col("bin5")).otherwise(0.0).as("lum_bin5"),
          (col("bytes") === col("orig_bytes")).as("unchanged"))
        .orderBy(col("media_id"))
    }))

  def oracle: Seq[(String, String)] = Seq(
    // Expected rows, derivable by hand from the fixture definitions:
    //   1: 64×32 half black/half white → luma bins 0 and 15 get 0.5 each
    //   2: 16×16 uniform 0x808080 → luma (299+587+114)·128/1000 = 128 → bin 8
    //   3: 0.5 s 440 Hz sine @8 kHz amp 0.5 → 4000 samples, RMS ≈ 0.5/√2
    //      (0.3535 after int16 truncation-toward-zero), 2 crossings ×
    //      220 cycles minus the one lost at sample 0 (sin(0) = 0 exactly,
    //      and a leading zero sample starts no sign change) = 439
    //   4: 2000 samples of constant 8192/32768 → RMS exactly 0.25, 0 crossings
    //   5: text bytes → neither decoder claims it
    "q_media_meta" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, kind,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(lum_lo AS DOUBLE) AS lum_lo, CAST(lum_mid AS DOUBLE) AS lum_mid,
        |  CAST(lum_hi AS DOUBLE) AS lum_hi,
        |  CAST(sample_rate AS DOUBLE) AS sample_rate,
        |  CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(duration_s AS DOUBLE) AS duration_s, CAST(rms AS DOUBLE) AS rms,
        |  CAST(zero_x AS BIGINT) AS zero_x
        |FROM (VALUES
        |  (1, 'image', 64, 32, 0.5, 0.0, 0.5, 0.0, 0, 0.0, 0.0, 0),
        |  (2, 'image', 16, 16, 0.0, 1.0, 0.0, 0.0, 0, 0.0, 0.0, 0),
        |  (3, 'audio', 0, 0, 0.0, 0.0, 0.0, 8000.0, 4000, 0.5, 0.3535, 439),
        |  (4, 'audio', 0, 0, 0.0, 0.0, 0.0, 8000.0, 2000, 0.25, 0.25, 0),
        |  (5, 'blob', 0, 0, 0.0, 0.0, 0.0, 0.0, 0, 0.0, 0.0, 0)
        |) AS t(media_id, kind, width, height, lum_lo, lum_mid, lum_hi,
        |       sample_rate, n_samples, duration_s, rms, zero_x)
        |ORDER BY media_id""".stripMargin,

    // Hand-derived from the fixtures + aspect-fit math:
    //   1: 64×32 → scale 16/64 = 0.25 → 16×8; uniform gray keeps bin 8 = 1.0;
    //      bytes re-encoded → changed
    //   2: 20×100 → scale 16/100 = 0.16 → round(3.2)×16 = 3×16; uniform blue
    //      keeps bin 5 = 1.0; changed
    //   3: 8×8 ≤ 16 → untouched, byte-identical; gray bin 8 = 1.0
    //   4: undecodable blob → passes through byte-identical
    "q_media_resize" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, kind,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(lum_bin8 AS DOUBLE) AS lum_bin8,
        |  CAST(lum_bin5 AS DOUBLE) AS lum_bin5, unchanged
        |FROM (VALUES
        |  (1, 'image', 16, 8, 1.0, 0.0, false),
        |  (2, 'image', 3, 16, 0.0, 1.0, false),
        |  (3, 'image', 8, 8, 1.0, 0.0, true),
        |  (4, 'blob', 0, 0, 0.0, 0.0, true)
        |) AS t(media_id, kind, width, height, lum_bin8, lum_bin5, unchanged)
        |ORDER BY media_id""".stripMargin)
}
