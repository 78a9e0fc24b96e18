package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** The REAL codec binding driven over REAL payloads: in-memory PNG
  * rasters and WAV containers generated with the same JDK APIs the
  * codec decodes with, pushed through the batched Spark pipeline
  * operators (decodeMeta/featurize/resize) — value-level assertions
  * against the generated ground truth, not stub arithmetic. This is
  * the closure of the "real media codec" carry for the modalities
  * Java SE can decode (images, PCM audio); video honestly remains
  * byte-window sampling until an FFI decoder exists.
  */
class JdkCodecSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(nFrames: Int, rateHz: Float): Array[Byte] = {
    val pcm = Array.tabulate[Byte](nFrames)(i => (i % 251).toByte)
    val fmt = new AudioFormat(rateHz, 8, 1, false, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeMeta on real PNGs and WAVs returns the generated ground truth") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(40, 24, 1)),
      Multimodal.MediaRow(2L, "image", png(17, 9, 2)),
      Multimodal.MediaRow(3L, "audio", wav(8000, 8000f)),
      Multimodal.MediaRow(4L, "audio", wav(4410, 44100f)),
      // a video payload (no JDK decoder) falls back, tagged as such
      Multimodal.MediaRow(5L, "video", Array.tabulate[Byte](100)(_.toByte)))
      .toDS()
    val meta = Multimodal.decodeMeta(media, codec = JdkMediaCodec)
      .collect().map(r => r.media_id -> r).toMap
    assert(meta(1L).width == 40 && meta(1L).height == 24 &&
      meta(1L).codec == "jdk-imageio")
    assert(meta(2L).width == 17 && meta(2L).height == 9)
    // duration = frames / rate: 8000 frames at 8 kHz = 1000 ms
    assert(meta(3L).duration_ms == 1000L && meta(3L).codec == "jdk-sampled")
    assert(meta(4L).duration_ms == 100L)
    assert(meta(5L).codec == "fallback-video")
  }

  test("resize really downscales the raster; scale=1 is the byte identity") {
    val orig = png(40, 24, 3)
    val half = JdkMediaCodec.resize(orig, 2)
    val back = ImageIO.read(new ByteArrayInputStream(half))
    assert(back.getWidth == 20 && back.getHeight == 12)
    // nearest-neighbor determinism: same input, same bytes
    assert(JdkMediaCodec.resize(orig, 2).toSeq == half.toSeq)
    assert(JdkMediaCodec.resize(orig, 1) eq orig)
    // the batched pipeline operator carries the real codec unchanged
    val rows = Multimodal.resize(
      Seq(Multimodal.MediaRow(1L, "image", orig)).toDS(),
      scale = 2, codec = JdkMediaCodec).collect()
    assert(rows.length == 1 && rows.head.content.toSeq == half.toSeq)
  }

  test("featurize on real rasters: unit norm, content-derived, pipeline-compatible") {
    val a = png(32, 32, 7)
    val b = png(32, 32, 8)
    val fa = JdkMediaCodec.featurize(a, 64)
    val fb = JdkMediaCodec.featurize(b, 64)
    def norm2(v: Array[Float]): Double =
      v.foldLeft(0.0)((s, x) => s + x.toDouble * x)
    assert(math.abs(norm2(fa) - 1.0) < 1e-3)
    assert(math.abs(norm2(fb) - 1.0) < 1e-3)
    // different pixel content -> different luminance histograms
    assert(fa.toSeq != fb.toSeq)
    // deterministic across calls
    assert(JdkMediaCodec.featurize(a, 64).toSeq == fa.toSeq)
    // flows through the Dataset operator with the same contract
    val feats = Multimodal.featurize(
      Seq(Multimodal.MediaRow(1L, "image", a)).toDS(),
      dim = 64, codec = JdkMediaCodec).collect()
    assert(feats.head.feature.toSeq == fa.toSeq)
  }

  test("featurize on real WAVs: decoded-sample histogram, unit norm, waveform-derived") {
    // two WAVs with the SAME byte length but different waveforms must
    // get different features — proving the feature reads decoded PCM,
    // not container bytes
    def wavOf(f: Int => Byte): Array[Byte] = {
      val pcm = Array.tabulate[Byte](800)(f)
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 800L)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val quiet = wavOf(_ => 10.toByte)           // constant low sample
    val loud = wavOf(i => (i * 37 % 256).toByte) // spread samples
    val fq = JdkMediaCodec.featurize(quiet, 16)
    val fl = JdkMediaCodec.featurize(loud, 16)
    def norm2(v: Array[Float]): Double =
      v.foldLeft(0.0)((s, x) => s + x.toDouble * x)
    assert(math.abs(norm2(fq) - 1.0) < 1e-3)
    assert(math.abs(norm2(fl) - 1.0) < 1e-3)
    assert(fq.toSeq != fl.toSeq, "audio feature ignored the waveform")
    // constant-waveform histogram concentrates in ONE bucket exactly
    assert(fq.count(_ != 0f) == 1, fq.mkString(","))
    // NOT the stub's byte-4-gram fallback — the real decode path ran
    assert(fq.toSeq != Multimodal.StubCodec.featurize(quiet, 16).toSeq)
    // deterministic across calls
    assert(JdkMediaCodec.featurize(loud, 16).toSeq == fl.toSeq)
  }

  test("featurize on 16-bit PCM buckets the sample's MSB, not the little-endian LSB") {
    // constant waveform whose LOW byte sweeps 0..255 while the HIGH
    // (most-significant) byte is fixed: the decoded-sample histogram
    // must concentrate in exactly ONE bucket. Bucketing the frame's
    // first byte (the 16-bit LE LSB — the round-10 ADVICE bug) would
    // spread it uniformly instead.
    val n = 800
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      pcm(2 * i) = (i % 256).toByte // LSB varies (little-endian first)
      pcm(2 * i + 1) = 0x20.toByte  // MSB constant: sample ≈ 0x20xx
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed, LE
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val f = JdkMediaCodec.featurize(bos.toByteArray, 16)
    assert(f.count(_ != 0f) == 1, f.mkString(","))
    // MSB 0x20 = 32, de-signed (32+128)%256 = 160 → bucket 160·16/256
    assert(f(160 * 16 / 256) == 1f, f.mkString(","))
  }

  test("corrupt image bytes fall back deterministically instead of failing the batch") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val m = JdkMediaCodec.decode("image", junk)
    assert(m.codec == "fallback-image")
    assert(m == JdkMediaCodec.decode("image", junk))
    // featurize falls back to the stub's byte features
    assert(JdkMediaCodec.featurize(junk, 16).toSeq ==
      Multimodal.StubCodec.featurize(junk, 16).toSeq)
  }
}
