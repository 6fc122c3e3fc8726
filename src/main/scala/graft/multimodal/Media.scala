package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star: image/audio/video at 100 TB).
  *
  * Media travels as an opaque `binary` column plus typed metadata — the same
  * philosophy as the reference's `blob` escape-hatch column
  * (`/root/reference/README.md:90,242`): raw bytes are never shredded, typed
  * views are derived.
  *
  * Decode paths: [[decodeImage]] is a REAL decoder (JDK `javax.imageio` —
  * PNG/JPEG/GIF/BMP, no external deps) producing width/height + a 16-bin
  * luminance histogram; payloads ImageIO can't read (non-image blobs, exotic
  * codecs this JRE lacks) fall back to [[decodeStub]]'s byte histogram so
  * the operator is total. Audio/video decode would slot in the same way
  * (a codec lib call inside the per-partition loop).
  *
  * Scale shape: decode/featurize run in `mapPartitions` so per-partition
  * setup (codec init, model load) is amortized across rows — the Scala analog
  * of a Pandas-UDF `mapInPandas` batch loop — and the operator stays a narrow
  * transform: no shuffle, linear scaling with executors.
  */
object Media {

  /** One media row: id, raw bytes, declared format + dimensions metadata. */
  case class MediaRow(media_id: Long, bytes: Array[Byte], format: String,
                      width: Int, height: Int)

  /** Decoded/featurized output: per-row feature vector + sampled frames.
    * `decoded` is true when a real codec handled the payload; then
    * width/height are the pixel dimensions and `features` is the luminance
    * histogram (byte histogram + 0×0 otherwise).
    */
  case class MediaFeatures(media_id: Long, n_bytes: Int, format: String,
                           decoded: Boolean, width: Int, height: Int,
                           features: Array[Double], frames: Array[Array[Byte]])

  /** Real image decode via the JDK's ImageIO: returns (width, height,
    * normalized 16-bin luminance histogram), or None if no registered codec
    * recognizes the bytes. Deterministic: integer Rec.601 luma per pixel.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val hist = new Array[Double](16)
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            hist(luma / 16) += 1.0
            x += 1
          }
          y += 1
        }
        val n = math.max(w.toLong * h, 1L)
        Some((w, h, hist.map(_ / n)))
      }
    } catch {
      // ImageIO plugins throw RuntimeExceptions (CMMException, IOOBE) on
      // malformed headers, not just IOException — a corrupt blob must fall
      // back to the stub, never fail the task; fatal errors still propagate
      case scala.util.control.NonFatal(_) => None
    }

  /** Fallback featurizer for payloads no JRE codec reads (opaque blobs,
    * exotic formats). Deterministic: a 16-bin byte histogram normalized to
    * [0,1]. A real deployment swaps a JNI codec in along the same seam.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    hist.map(_ / n)
  }

  /** STUB frame sampler: every `stride`-th 8-byte slice stands in for a video
    * frame grab; real implementation would seek keyframes.
    */
  def frameSampleStub(bytes: Array[Byte], stride: Int): Array[Array[Byte]] =
    bytes.grouped(8).zipWithIndex.collect {
      case (g, i) if i % stride == 0 => g
    }.toArray

  /** The featurize operator: mapPartitions so codec setup happens once per
    * partition, not per row. Tries the real ImageIO decode first, falls back
    * to the byte-histogram stub — the operator is total over arbitrary blobs.
    */
  def featurize(media: Dataset[MediaRow], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init lives HERE (ImageIO scans its plugin
      // registry on first use; heavier codecs/models would load the same way)
      rows.map { r =>
        decodeImage(r.bytes) match {
          case Some((w, h, hist)) =>
            MediaFeatures(r.media_id, r.bytes.length, r.format,
              decoded = true, w, h, hist, frameSampleStub(r.bytes, frameStride))
          case None =>
            MediaFeatures(r.media_id, r.bytes.length, r.format,
              decoded = false, 0, 0,
              decodeStub(r.bytes), frameSampleStub(r.bytes, frameStride))
        }
      }
    }
  }

  /** Resize stub as a pure column op: truncate bytes to a target size bound
    * (a byte-budget cap, not a pixel op — see [[thumbnail]] for the real
    * scale-down) while keeping metadata consistent.
    */
  def resize(df: DataFrame, maxBytes: Int): DataFrame =
    df.withColumn("bytes",
        expr(s"CASE WHEN length(bytes) > $maxBytes THEN substring(bytes, 1, $maxBytes) ELSE bytes END"))
      .withColumn("truncated", length(col("bytes")) === maxBytes)

  /** REAL pixel scale-down: decode, fit into `maxDim`×`maxDim` preserving
    * aspect ratio (never upscale), redraw through `Graphics2D` with bilinear
    * interpolation, re-encode as PNG, and refresh the width/height metadata.
    * Payloads no codec reads pass through byte-identical (width/height 0) —
    * the operator is total, like [[featurize]]. `mapPartitions` keeps codec
    * init per-partition; the transform is narrow (no shuffle), so thumbnail
    * generation scales linearly with executors at 100 TB.
    */
  def thumbnail(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
            val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(bytes = bos.toByteArray, format = "image/png",
              width = w, height = h)
          case Some(img) => // already small enough: just refresh metadata
            r.copy(width = img.getWidth, height = img.getHeight)
          case None => r // opaque blob: pass through untouched
        }
      }
    }
  }

  /** Decoded audio output: real PCM stats when a JDK codec (WAV/AIFF/AU)
    * reads the payload; byte-histogram fallback otherwise, like images.
    * `windows` = per-window RMS over `windowSamples`-sample windows — the
    * audio analog of frame sampling (feeds VAD/segmentation downstream).
    */
  case class AudioFeatures(media_id: Long, decoded: Boolean,
                           sample_rate: Double, channels: Int, n_samples: Long,
                           duration_s: Double, rms: Double,
                           zero_crossings: Long, windows: Array[Double])

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
    * the PCM container formats; compressed codecs would slot in along the
    * same seam). Returns None when no installed reader recognizes the
    * bytes. Samples normalize to [-1,1] doubles from the container's
    * sample size/endianness; deterministic integer→double conversion.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Double])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      import AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
      val base = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // Non-PCM containers (ULAW/ALAW .au, …) go through the JDK's format
      // conversion to 16-bit signed PCM; unsupported conversions throw and
      // fall to the byte-histogram path. Raw PCM passes through untouched —
      // the sample math below keys on the ACTUAL encoding, since "8-bit"
      // alone is ambiguous (WAV is unsigned, AIFF/AU are signed).
      val enc0 = base.getFormat.getEncoding
      val in =
        if (enc0 == PCM_SIGNED || enc0 == PCM_UNSIGNED) base
        else {
          val f = base.getFormat
          AudioSystem.getAudioInputStream(
            new AudioFormat(PCM_SIGNED, f.getSampleRate, 16, f.getChannels,
              2 * f.getChannels, f.getSampleRate, false), base)
        }
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val signed = fmt.getEncoding == PCM_SIGNED
      if (bits != 8 && bits != 16) None
      else {
        val raw = in.readAllBytes()
        val bytesPer = bits / 8
        val n = raw.length / bytesPer
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v =
            if (bits == 8) {
              if (signed) raw(i).toInt else (raw(i) & 0xFF) - 128
            } else {
              val (b0, b1) = (raw(2 * i) & 0xFF, raw(2 * i + 1) & 0xFF)
              val u = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
              if (signed) (u << 16) >> 16 else u - 32768 // center/sign-extend
            }
          out(i) = v / (if (bits == 8) 128.0 else 32768.0)
          i += 1
        }
        Some((fmt, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio featurize: real decode → duration / RMS / zero-crossings /
    * per-window RMS envelope; opaque payloads degrade to the byte
    * histogram as 'windows' with decoded=false. Narrow `mapPartitions`
    * like [[featurize]] — codec init per partition, linear scaling.
    */
  def featurizeAudio(media: Dataset[MediaRow],
                     windowSamples: Int = 1024): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    require(windowSamples > 0)
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeAudio(r.bytes) match {
          case Some((fmt, pcm)) =>
            val ch = math.max(fmt.getChannels, 1)
            val frames = pcm.length / ch
            var sumSq = 0.0; var zc = 0L
            var i = 0
            while (i < pcm.length) {
              sumSq += pcm(i) * pcm(i)
              if (i >= ch && (pcm(i) >= 0) != (pcm(i - ch) >= 0)) zc += 1
              i += 1
            }
            val windows = pcm.grouped(windowSamples).map { w =>
              math.sqrt(w.map(x => x * x).sum / w.length)
            }.toArray
            AudioFeatures(r.media_id, decoded = true,
              fmt.getSampleRate.toDouble, ch, frames,
              frames / fmt.getSampleRate.toDouble,
              math.sqrt(sumSq / math.max(pcm.length, 1)), zc, windows)
          case None =>
            AudioFeatures(r.media_id, decoded = false, 0.0, 0, 0L, 0.0, 0.0,
              0L, decodeStub(r.bytes))
        }
      }
    }
  }

  /** Synthesize a MediaRow dataset from the documents table (text bytes as
    * the opaque payload) — lets every test and demo run on driver testdata.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"),
        lit("text/plain").as("format"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
  }
}
