package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** Multimodal plumbing: schema, batch shape, and determinism of the stubbed
  * decode/featurize/resize operators (north star surface).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Media.fromDocuments(spark, sf())

  test("binary payload survives the typed boundary with correct byte length") {
    val doc = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = media.collect()
    assert(rows.length == doc.size)
    rows.foreach(r => assert(r.bytes.length == doc(r.media_id)))
  }

  test("featurize emits normalized 16-bin histograms deterministically") {
    val out = Media.featurize(media).collect()
    out.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, "histogram not normalized")
      assert(f.frames.nonEmpty)
    }
    // determinism: same input → identical features
    val again = Media.featurize(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    out.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("real PNG payloads decode via ImageIO with true dimensions + luma histogram") {
    import spark.implicits._
    // render a deterministic two-tone PNG in-process: left half black,
    // right half white → luma histogram concentrated in bins 0 and 15
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Media.MediaRow(1L, png(64, 32), "image/png", 0, 0),
      Media.MediaRow(2L, Array[Byte](1, 2, 3, 4), "application/octet-stream", 0, 0))
    val got = Media.featurize(spark.createDataset(rows)).collect()
      .map(f => f.media_id -> f).toMap
    val img = got(1L)
    assert(img.decoded, "PNG payload must take the real ImageIO path")
    assert(img.width == 64 && img.height == 32)
    assert(math.abs(img.features(0) - 0.5) < 1e-9, "black half → bin 0")
    assert(math.abs(img.features(15) - 0.5) < 1e-9, "white half → bin 15")
    assert(math.abs(img.features.sum - 1.0) < 1e-9)
    val blob = got(2L)
    assert(!blob.decoded && blob.width == 0, "opaque blob must fall back to stub")
  }

  test("featurize plan is a narrow map (no shuffle)") {
    val plan = Media.featurize(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize truncates oversized payloads and flags them") {
    val out = Media.resize(media.toDF(), 64)
    assert(out.filter(col("truncated") && length(col("bytes")) =!= 64).count() == 0)
    assert(out.filter(length(col("bytes")) > 64).count() == 0)
  }

  test("thumbnail scales pixels down preserving aspect ratio") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xFFFFFF)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Media.MediaRow(1L, png(128, 64), "image/png", 0, 0),   // downscale 2:1
      Media.MediaRow(2L, png(16, 12), "image/png", 0, 0),    // under limit
      Media.MediaRow(3L, Array[Byte](9, 9, 9), "application/octet-stream", 0, 0))
    val got = Media.thumbnail(spark.createDataset(rows), 32).collect()
      .map(r => r.media_id -> r).toMap
    // oversized: longest edge pinned to 32, aspect preserved, bytes re-encoded
    assert(got(1L).width == 32 && got(1L).height == 16)
    val re = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).bytes))
    assert(re.getWidth == 32 && re.getHeight == 16,
      "re-encoded payload must carry the scaled pixel dimensions")
    // small image: untouched bytes, metadata refreshed from the codec
    assert(got(2L).width == 16 && got(2L).height == 12)
    assert(got(2L).bytes.sameElements(rows(1).bytes))
    // opaque blob: byte-identical pass-through
    assert(got(3L).bytes.sameElements(rows(2).bytes) && got(3L).width == 0)
    // narrow plan: no shuffle
    val plan = Media.thumbnail(spark.createDataset(rows), 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("real WAV payloads decode via javax.sound with true rate/duration/RMS") {
    import spark.implicits._
    // 0.5 s of a 440 Hz sine at 8 kHz, 16-bit mono PCM, amplitude 0.5
    val rate = 8000f; val n = 4000; val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = Seq(
      Media.MediaRow(1L, bos.toByteArray, "audio/wav", 0, 0),
      Media.MediaRow(2L, "definitely not audio".getBytes, "text/plain", 0, 0))
    val out = Media.featurizeAudio(spark.createDataset(rows), windowSamples = 1024)
      .collect().map(f => f.media_id -> f).toMap
    val a = out(1L)
    assert(a.decoded && a.sample_rate == 8000.0 && a.channels == 1)
    assert(a.n_samples == n)
    assert(math.abs(a.duration_s - 0.5) < 1e-9)
    // RMS of a sine = amp/√2; finite-length windowing keeps it within 1%
    assert(math.abs(a.rms - amp / math.sqrt(2)) < 0.01, s"rms ${a.rms}")
    // a 440 Hz tone crosses zero ~2·440·0.5 = 440 times
    assert(math.abs(a.zero_crossings - 440L) <= 2, s"zc ${a.zero_crossings}")
    assert(a.windows.length == (n + 1023) / 1024)
    val b = out(2L)
    assert(!b.decoded && b.windows.length == 16)
  }

  test("8-bit AIFF (PCM_SIGNED) decodes with signed math: silence → rms 0") {
    // AIFF stores 8-bit samples SIGNED — digital silence is 0x00 bytes.
    // Unsigned math would read every sample as -1.0 (rms ≈ 1); signed math
    // reads true silence. Guards the encoding branch in decodeAudio.
    val rate = 8000f; val n = 800
    val fmt = new javax.sound.sampled.AudioFormat(rate, 8, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](n)), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val Some((f, pcm)) = Media.decodeAudio(bos.toByteArray)
    assert(f.getSampleSizeInBits == 8 && pcm.length == n)
    assert(pcm.forall(_ == 0.0), s"8-bit signed silence decoded nonzero")

    // and a full-scale-negative byte is -1.0, not re-centered unsigned
    val loud = Array.fill[Byte](n)(-128)
    val ais2 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(loud), fmt, n.toLong)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais2,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos2)
    val Some((_, pcm2)) = Media.decodeAudio(bos2.toByteArray)
    assert(pcm2.forall(_ == -1.0))
  }

  test("ULAW .au payloads convert through the JDK codec instead of garbage") {
    // Encode a known sine to ULAW via the JDK's own converter, then decode:
    // the PCM round-trip must recover the tone (ULAW is lossy, so compare
    // RMS coarsely), exercising the non-PCM conversion branch.
    val rate = 8000f; val n = 4000; val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = ((v >> 8) & 0xFF).toByte; pcm(2 * i + 1) = (v & 0xFF).toByte
    }
    val lin = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, true)
    val src = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), lin, n.toLong)
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, rate, 8, 1, 1, rate, true)
    val ulaw = javax.sound.sampled.AudioSystem.getAudioInputStream(ulawFmt, src)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ulaw,
      javax.sound.sampled.AudioFileFormat.Type.AU, bos)
    val Some((f, out)) = Media.decodeAudio(bos.toByteArray)
    assert(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(out.length == n)
    val rms = math.sqrt(out.map(x => x * x).sum / out.length)
    assert(math.abs(rms - amp / math.sqrt(2)) < 0.02,
      s"ULAW round-trip rms $rms, expected ~${amp / math.sqrt(2)}")
  }
}
