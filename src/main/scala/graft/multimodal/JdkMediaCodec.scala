package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import graft.multimodal.Multimodal.{MediaCodec, MediaMeta}

/** REAL media codec binding on the JDK's own decoders — no external
  * library: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF rasters) and
  * `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU containers) ship with
  * Java SE, so the round-1..8 "the sandbox has no decode lib" carry was
  * closeable all along for images and PCM audio. This object plugs into
  * the SAME [[Multimodal.MediaCodec]] contract the batched pipeline
  * operators take (decodeMeta / featurize / resize / frameSample run
  * unchanged — the codec-agnosticism MultimodalSpec proves over the
  * stub and the toy codec is exactly what makes this swap a one-liner),
  * and JdkCodecSpec drives it end to end over REAL in-memory PNGs and
  * WAVs with value-level assertions (decoded dims == generated, resize
  * really halves the raster, WAV duration == frames/rate).
  *
  * Scope honesty: video stays byte-window frame sampling (Java SE has
  * no video decoder — THAT half of the carry genuinely needs an
  * external binding); non-decodable payloads fall back to the stub's
  * deterministic byte-level treatment instead of failing the batch, so
  * a mixed-quality 100 TB crawl keeps flowing and the `codec` tag says
  * which rows decoded for real.
  *
  * The oracle-gated queries (q30/q130/q134) stay on [[Multimodal
  * .StubCodec]]: their DuckDB oracles recompute the stub's md5-derived
  * values per payload, which an engine-external raster decode can't
  * replay — the real binding is spec-gated (the streaming-gate
  * precedent) at value level instead.
  */
object JdkMediaCodec extends MediaCodec {

  // ImageIO touches AWT; executors have no display. Setting headless
  // here (idempotent, affects only this JVM) keeps decode working under
  // local[32] and on display-less cluster workers alike.
  System.setProperty("java.awt.headless", "true")

  private def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  override def decode(kind: String, bytes: Array[Byte]): MediaMeta =
    kind match {
      case "image" =>
        readImage(bytes) match {
          case Some(img) =>
            MediaMeta(img.getWidth, img.getHeight, 0L, "jdk-imageio")
          case None => fallbackMeta(kind, bytes)
        }
      case "audio" =>
        try {
          val ff = AudioSystem.getAudioFileFormat(
            new ByteArrayInputStream(bytes))
          val frames = ff.getFrameLength.toLong
          val rate = ff.getFormat.getFrameRate.toDouble
          val durMs = if (rate > 0) (frames * 1000.0 / rate).toLong else 0L
          MediaMeta(0, 0, durMs, "jdk-sampled")
        } catch { case _: Exception => fallbackMeta(kind, bytes) }
      case _ => fallbackMeta(kind, bytes)
    }

  /** Stub-identical deterministic treatment for payloads the JDK cannot
    * decode (video, corrupt bytes) — tagged so consumers can tell.
    */
  private def fallbackMeta(kind: String, bytes: Array[Byte]): MediaMeta = {
    val m = Multimodal.StubCodec.decode(kind, bytes)
    m.copy(codec = s"fallback-$kind")
  }

  /** Real image feature: the luminance histogram of the decoded raster
    * over `dim` equal-width buckets, L2-normalized — deterministic (the
    * PNG raster decodes to the same pixels everywhere) and actually
    * content-derived: two images with different pixel distributions get
    * different vectors even at identical byte length. Non-image bytes
    * try the REAL audio path next — the decoded PCM sample histogram
    * (the audio twin of the luminance histogram: container headers and
    * encoding widths stop mattering, the waveform distribution is the
    * feature) — and only then fall back to the stub's byte-4-gram
    * feature, so undecodable payloads still featurize.
    */
  override def featurize(bytes: Array[Byte], dim: Int): Array[Float] =
    readImage(bytes) match {
      case Some(img) =>
        val acc = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            // integer luma (BT.601 weights scaled by 256) — exact math
            val lum = (((rgb >> 16) & 0xff) * 77 + ((rgb >> 8) & 0xff) * 150 +
              (rgb & 0xff) * 29) >> 8
            acc(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = math.sqrt(acc.foldLeft(0.0)((s, v) => s + v * v)).toFloat
        if (n == 0f) acc else acc.map(_ / n)
      case None =>
        audioSampleHistogram(bytes, dim)
          .getOrElse(Multimodal.StubCodec.featurize(bytes, dim))
    }

  /** Decoded-PCM sample histogram: every frame's first-channel sample
    * (any supported bit width, normalized to an unsigned byte) bucketed
    * into `dim` equal-width bins, L2-normalized. None when the JDK has
    * no reader for the container — the caller falls through to the
    * byte-level stub.
    */
  private def audioSampleHistogram(bytes: Array[Byte],
      dim: Int): Option[Array[Float]] =
    try {
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val frameSize = math.max(1, fmt.getFrameSize)
        // most-significant byte of the first channel's sample: for
        // multi-byte PCM (16-bit WAV stores little-endian) the frame's
        // FIRST byte is the LSB — bucketing it histograms noise, not the
        // waveform (round-10 ADVICE). 8-bit keeps offset 0.
        val sampleBytes =
          math.max(1, (fmt.getSampleSizeInBits + 7) / 8)
        val msbOff = if (fmt.isBigEndian) 0 else sampleBytes - 1
        val acc = new Array[Float](dim)
        val buf = new Array[Byte](frameSize * 1024)
        var read = ais.read(buf)
        while (read > 0) {
          var off = 0
          while (off + frameSize <= read) {
            // de-signed per encoding: PCM_SIGNED stores two's-complement
            // (the MSB carries the sign), shift to unsigned
            val raw = buf(off + msbOff).toInt
            val u =
              if (fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                (raw + 256 + 128) % 256
              else raw & 0xff
            acc(u * dim / 256) += 1f
            off += frameSize
          }
          read = ais.read(buf)
        }
        val n = math.sqrt(acc.foldLeft(0.0)((s, v) => s + v * v)).toFloat
        Some(if (n == 0f) acc else acc.map(_ / n))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Real image resize: decode, scale the raster down by `scale` with
    * nearest-neighbor sampling (deterministic, unlike interpolating
    * filters whose rounding varies by implementation), re-encode PNG.
    * scale = 1 is the byte identity per the contract. Non-image bytes
    * fall back to the stub's byte decimation.
    */
  override def resize(bytes: Array[Byte], scale: Int): Array[Byte] = {
    if (scale == 1) return bytes
    readImage(bytes) match {
      case Some(img) =>
        val w = math.max(1, img.getWidth / scale)
        val h = math.max(1, img.getHeight / scale)
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * scale, y * scale))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      case None => Multimodal.StubCodec.resize(bytes, scale)
    }
  }

  /** Java SE has no video decoder — frame sampling keeps the stub's
    * fixed-byte-window semantics (the honest remaining half of the
    * codec carry; an FFI binding would replace only this method).
    */
  override def frames(bytes: Array[Byte], frameSize: Int,
      stride: Int): Iterator[(Int, Array[Byte])] =
    Multimodal.StubCodec.frames(bytes, frameSize, stride)
}
