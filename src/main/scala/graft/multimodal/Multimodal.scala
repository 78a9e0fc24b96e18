package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample operators.
  *
  * The Spark-side shape is real and tested — schema, batched
  * `mapPartitions` processing (the JVM twin of `mapInPandas`: decode
  * libraries amortize setup per batch, not per row), partitioning,
  * and the feature output contract that feeds graft.ops.Similarity.
  * Two codecs ship: [[JdkMediaCodec]] — a REAL binding on Java SE's
  * own decoders (ImageIO rasters, javax.sound WAV containers;
  * spec-gated over real in-memory PNGs/WAVs, see JdkCodecSpec) — and
  * [[StubCodec]], the deterministic md5-derived fake the ORACLE-gated
  * queries (q30/q130/q134) keep using because DuckDB can recompute its
  * values per payload where it cannot replay a raster decode. Video
  * decoding is the remaining genuinely-external dependency (Java SE
  * has none); swap in an FFI decoder and nothing else changes.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, width: Int, height: Int,
    duration_ms: Long, codec: String, n_bytes: Long)
  case class FeatureRow(media_id: Long, kind: String, feature: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** The codec swap contract: everything a real media binding (JNI/FFI
    * decoder, vision/audio embedding model) must provide, and the ONLY
    * thing that changes when one arrives — the Spark-side operators
    * below take a `MediaCodec` and are proven codec-agnostic by
    * MultimodalSpec, which runs the full decode/featurize/resize/frame
    * pipeline over both [[StubCodec]] and an independent toy codec.
    * Implementations must be Serializable: instances ship inside
    * mapPartitions closures to executors.
    */
  trait MediaCodec extends Serializable {
    /** Parse container metadata from the payload. */
    def decode(kind: String, bytes: Array[Byte]): MediaMeta
    /** Fixed-dim embedding of the payload. */
    def featurize(bytes: Array[Byte], dim: Int): Array[Float]
    /** Downsampled payload; scale=1 must be the identity. */
    def resize(bytes: Array[Byte], scale: Int): Array[Byte]
    /** (frame_idx, frame bytes) samples of a video payload. */
    def frames(bytes: Array[Byte], frameSize: Int, stride: Int): Iterator[(Int, Array[Byte])]
  }

  /** STUB decoder — deterministic fake in place of a real codec binding.
    * "Decodes" metadata from the payload's md5: width = 64 + first 32
    * digest bits mod 1024, height = 64 + next 32 bits mod 1024 — chosen
    * over an ad-hoc rolling hash so an independent engine can recompute
    * the exact values (DuckDB: `64 + ('0x' || substring(md5(text), 1, 8))
    * ::UBIGINT % 1024`), making q30 a value-level oracle instead of
    * pinned booleans. A real implementation would parse the container
    * header here (and is the only thing that would change).
    */
  object StubCodec extends MediaCodec {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def u32(off: Int): Long =
        ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
      val w = 64 + (u32(0) % 1024).toInt
      val ht = 64 + (u32(4) % 1024).toInt
      MediaMeta(w, ht, bytes.length.toLong * 8, s"stub-$kind")
    }

    /** Fake fixed-dim feature vector: byte 4-gram rolling hashes bucketed
      * into `dim` accumulators, L2-normalized. Deterministic; replaces a
      * real vision/audio embedding model.
      */
    def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * 257 + (bytes(i) & 0xff)) & 0xffffffffL
        if (i >= 3) acc((h % dim).toInt) += 1f
        i += 1
      }
      val n = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x * x)).toFloat
      if (n == 0f) acc else acc.map(_ / n)
    }

    /** Keep every `scale`-th payload byte — the resize stand-in. */
    def resize(bytes: Array[Byte], scale: Int): Array[Byte] = {
      val out = new Array[Byte]((bytes.length + scale - 1) / scale)
      var i = 0
      while (i < out.length) { out(i) = bytes(i * scale); i += 1 }
      out
    }

    /** Every `stride`-th fixed-size window as one frame blob. */
    def frames(bytes: Array[Byte], frameSize: Int,
        stride: Int): Iterator[(Int, Array[Byte])] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => (i, chunk) }
  }

  /** Opaque-binary media table derived deterministically from the
    * `documents` testdata (payload = utf-8 bytes, kind = round-robin
    * modality). At 100 TB this is `spark.read.format("binaryFile")` over
    * an object store — same schema, same downstream operators.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      // the corpus contract admits null text (Dedup.simhash defends
      // against it); a null payload would NPE in StubCodec.decode and
      // diverge from the oracle, whose strlen(NULL) rows null out
      .filter($"text".isNotNull)
      .select($"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        encode($"text", "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Real-file ingest: `binaryFile` source over a directory tree — the
    * production path for media at scale (the documents-derived
    * [[mediaTable]] exists so the testdata exercises the same operators
    * without binary fixtures). Kind is inferred from the extension;
    * unknown extensions pass through as "binary" rather than failing
    * the scan.
    */
  def mediaFromDirectory(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val kind = when(lower($"path").rlike("\\.(png|jpe?g|gif|bmp)$"), "image")
      .when(lower($"path").rlike("\\.(wav|mp3|flac|ogg)$"), "audio")
      .when(lower($"path").rlike("\\.(mp4|avi|mkv|webm)$"), "video")
      .otherwise("binary")
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(xxhash64($"path").as("media_id"), kind.as("kind"),
        $"content".as("content"))
      .as[MediaRow]
  }

  /** Decode metadata in batches: groups each partition's rows into
    * `batchSize` chunks so a real codec can amortize per-batch setup
    * (arena allocation, GPU transfer, FFI handle) exactly as a
    * `mapInPandas` UDF would. Output is columnar-friendly (flat struct).
    */
  def decodeMeta(media: Dataset[MediaRow], batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would go here
        batch.iterator.map { r =>
          val m = codec.decode(r.kind, r.content)
          DecodedRow(r.media_id, r.kind, m.width, m.height, m.durationMs,
            m.codec, r.content.length.toLong)
        }
      }
    }
  }

  /** Feature extraction → fixed-dim float vectors, the same
    * `array<float>` contract as the embeddings table, so
    * graft.ops.Similarity's cosine/ANN operators run unchanged on media.
    */
  def featurize(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(r =>
          FeatureRow(r.media_id, r.kind, codec.featurize(r.content, dim)))
      }
    }
  }

  case class ResizedRow(media_id: Long, kind: String, content: Array[Byte],
    orig_bytes: Long, scale: Int)

  /** Resize/downsample: keeps every `scale`-th payload byte — the STUB
    * stand-in for an image resize (a real codec would decode, scale,
    * re-encode in this same batched loop). Shape matters: output rows are
    * strictly smaller than inputs (1/scale), so a resize stage REDUCES
    * shuffle volume for everything downstream — at 100 TB you resize
    * before any shuffle, never after.
    */
  def resize(media: Dataset[MediaRow], scale: Int = 4,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): Dataset[ResizedRow] = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          ResizedRow(r.media_id, r.kind, codec.resize(r.content, scale),
            r.content.length.toLong, scale)
        }
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * window as one frame blob. One input row explodes to n_frames rows —
    * done in mapPartitions (not a SQL explode of a materialized array) so
    * only `frameSize` bytes are resident per output row, never the whole
    * decoded frame list.
    */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 256,
      stride: Int = 4, codec: MediaCodec = StubCodec): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        codec.frames(r.content, frameSize, stride)
          .map { case (i, chunk) => FrameRow(r.media_id, i, chunk) }
      }
    }
  }

  /** Resize audit (q134): run the batched [[resize]] stub (keep every
    * `scale`-th byte) over every media payload and roll up per kind —
    * media count, original vs resized byte totals (the shuffle-volume
    * reduction a real resize stage buys), and a content signature (sum
    * of each resized payload's md5 prefix) so the oracle re-derives the
    * RESIZED BYTES character by character: an off-by-one in the stride
    * or the tail handling changes the signature. The resize itself is a
    * mapPartitions scan stage; only kind-keyed aggregates shuffle.
    */
  def resizeAudit(spark: SparkSession, dir: String, scale: Int = 4): DataFrame = {
    import spark.implicits._
    resize(mediaTable(spark, dir), scale).toDF()
      .select($"kind", $"orig_bytes",
        length($"content").cast("long").as("out_bytes"),
        expr("cast(conv(substring(md5(content), 1, 8), 16, 10) as bigint)").as("sig"))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_media"),
        sum($"orig_bytes").as("total_orig_bytes"),
        sum($"out_bytes").as("total_out_bytes"),
        sum($"sig").as("sig_sum"))
  }

  /** Frame-sampling manifest (q130): run [[frameSample]] over the video
    * payloads and roll the sampled frames up per media — frame count,
    * sampled byte total, last frame index, and a content signature (sum
    * of each frame's md5 prefix) so the oracle checks the FRAME BYTES,
    * not just the arithmetic: a stride/boundary bug in the sampler
    * changes the signature even when counts survive. One mapPartitions
    * pass (no materialized frame array) feeding a media-keyed aggregate;
    * output is media-sized, frames never shuffle anywhere whole.
    */
  def frameManifest(spark: SparkSession, dir: String, frameSize: Int = 64,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    frameSample(mediaTable(spark, dir), frameSize, stride).toDF()
      .select($"media_id", $"frame_idx",
        length($"frame").cast("long").as("n_bytes"),
        expr("cast(conv(substring(md5(frame), 1, 8), 16, 10) as bigint)").as("sig"))
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum($"n_bytes").as("frame_bytes"),
        max($"frame_idx").cast("long").as("last_idx"),
        sum($"sig").as("sig_sum"))
  }

  /** PNG round-trip law over the REAL JDK codec (q263): per document, a
    * deterministic 16×8 raster (pixel = f(doc_id, x, y), no text
    * dependence, so the count is oracle-replayable) is encoded to PNG
    * with ImageIO, decoded back with [[JdkMediaCodec]], and checked
    * pixel-for-pixel — PNG is lossless, so ANY mismatch is a codec
    * regression — plus a real nearest-neighbor resize whose output dims
    * must be exactly (w/2, h/2). The rollup emits the counts and a
    * `roundtrip_law` boolean the DuckDB oracle asserts literally TRUE
    * (the q254 pattern: the engine-external decode can't be replayed in
    * SQL, its LAW can) with n_media replayed from the documents table —
    * the real-codec binding is now in the driver's per-round sweep, not
    * only the spec suite.
    *
    * Scale: the audit runs on a DETERMINISTIC md5-bucket doc sample
    * (the q222/q223 twin recipe, `hexMax` = first md5 hex digit cap) —
    * a per-payload decode is inherently linear in payloads (~0.4 ms
    * each), which at 10⁹ media is a sampling problem, not a plan
    * problem; the oracle replays the identical sample predicate. Per
    * sampled row: batched mapPartitions encode+decode, one single-row
    * aggregate.
    */
  def pngRoundtrip(spark: SparkSession, dir: String,
      hexMax: String = "3"): DataFrame = {
    import spark.implicits._
    val w = 16
    val h = 8
    val checks = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"text".isNotNull &&
        substring(md5($"doc_id".cast("string")), 1, 1) <= hexMax)
      .select($"doc_id").as[Long]
      .mapPartitions { ids =>
        ids.grouped(64).flatMap { batch =>
          batch.iterator.map { id =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y,
                  ((id * 31 + x * 17 + y * 7) & 0xffffffL).toInt & 0xffffff)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            val png = bos.toByteArray
            val meta = JdkMediaCodec.decode("image", png)
            val back = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            var exact = back != null && back.getWidth == w &&
              back.getHeight == h && meta.codec == "jdk-imageio"
            if (exact) {
              var y2 = 0
              while (exact && y2 < h) {
                var x2 = 0
                while (exact && x2 < w) {
                  if ((back.getRGB(x2, y2) & 0xffffff) !=
                      (img.getRGB(x2, y2) & 0xffffff)) exact = false
                  x2 += 1
                }
                y2 += 1
              }
            }
            val half = JdkMediaCodec.resize(png, 2)
            val halfImg = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(half))
            val resized = halfImg != null &&
              halfImg.getWidth == w / 2 && halfImg.getHeight == h / 2
            (1L, if (exact) 1L else 0L, if (resized) 1L else 0L)
          }
        }
      }
      .toDF("one", "rt", "rs")
    // coalesce: an empty sample (no doc_id hashes ≤ hexMax) must yield
    // 0,0,0,true — the oracle replays count(*)-based zeros, and bare
    // sum() over zero rows would emit NULLs and a NULL law instead.
    checks.agg(coalesce(sum($"one"), lit(0L)).as("n_media"),
        coalesce(sum($"rt"), lit(0L)).as("n_roundtrip_ok"),
        coalesce(sum($"rs"), lit(0L)).as("n_resize_ok"))
      .select($"n_media", $"n_roundtrip_ok", $"n_resize_ok",
        ($"n_roundtrip_ok" === $"n_media" &&
          $"n_resize_ok" === $"n_media").as("roundtrip_law"))
  }

  /** Deterministic 3-channel raster for [[realCodecAudit]]: dims and
    * pixels are pure functions of the doc id, so the DuckDB oracle can
    * replay every decoded width/height as `8 + doc_id % 9` / `8 +
    * doc_id % 7` without seeing a single pixel.
    */
  private def auditPng(id: Long): Array[Byte] = {
    val w = 8 + java.lang.Math.floorMod(id, 9L).toInt
    val h = 8 + java.lang.Math.floorMod(id, 7L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 37 + x * 13 + y * 5) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 8-bit mono WAV for [[realCodecAudit]]: frame count =
    * 8·(100 + doc_id % 32) at 8 kHz, so the REAL header parse must
    * yield duration_ms = 100 + doc_id % 32 exactly (frames·1000/8000 =
    * frames/8, an exact power-of-two division in double).
    */
  private def auditWav(id: Long): Array[Byte] = {
    val nFrames = 8 * (100 + java.lang.Math.floorMod(id, 32L).toInt)
    val data = new Array[Byte](nFrames)
    var i = 0
    while (i < nFrames) { data(i) = ((id * 31 + i * 7) & 0xff).toByte; i += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real-codec audit through the PRODUCTION operators (q265): the
    * decode-meta / featurize / resize coverage q263's round-trip law
    * left to the spec suite, now driver-sweep-gated. Each sampled doc
    * (the q263/q222 md5-bucket predicate, replayed verbatim by the
    * oracle) becomes one deterministic PNG and one deterministic WAV
    * payload whose ground-truth dims/duration are pure functions of
    * doc_id; the FULL batched [[decodeMeta]] / [[featurize]] /
    * [[resize]] operators — not a bespoke loop — then run over them
    * with [[JdkMediaCodec]], and the resized payloads go through
    * [[decodeMeta]] AGAIN to prove the re-encoded PNG halves. Every
    * output is a VALUE the oracle recomputes from the sample predicate
    * alone: Σwidth = Σ(8 + id%9), Σduration = Σ(100 + id%32),
    * Σhalf-width = Σ greatest(1, (8 + id%9) // 2), plus `codec_law`
    * (all rows decoded by the REAL jdk codec paths and every feature
    * vector unit-norm) asserted literally TRUE — a regression in any
    * real decode path breaks a replayed SUM, not just a boolean.
    *
    * Scale: same story as q263 — per-payload decode is linear, so the
    * audit rides a deterministic sample; operators are one batched
    * mapPartitions scan each, aggregates are single-row.
    */
  def realCodecAudit(spark: SparkSession, dir: String,
      hexMax: String = "3", dim: Int = 16): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"text".isNotNull &&
        substring(md5($"doc_id".cast("string")), 1, 1) <= hexMax)
      .select($"doc_id").as[Long]
    val media: Dataset[MediaRow] = ids.mapPartitions { it =>
      it.flatMap { id =>
        Iterator(MediaRow(2 * id, "image", auditPng(id)),
          MediaRow(2 * id + 1, "audio", auditWav(id)))
      }
    }
    val meta = decodeMeta(media, codec = JdkMediaCodec).toDF()
    val feats = featurize(media, dim, codec = JdkMediaCodec).toDF()
    val halves = decodeMeta(
      resize(media.filter(_.kind == "image"), 2, codec = JdkMediaCodec)
        .map(r => MediaRow(r.media_id, r.kind, r.content)),
      codec = JdkMediaCodec).toDF()
    val m = meta.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_media"),
      coalesce(sum(when($"kind" === "image", 1L).otherwise(0L)), lit(0L))
        .as("n_images"),
      coalesce(sum(when($"kind" === "image", $"width".cast("long"))
        .otherwise(0L)), lit(0L)).as("sum_img_width"),
      coalesce(sum(when($"kind" === "image", $"height".cast("long"))
        .otherwise(0L)), lit(0L)).as("sum_img_height"),
      coalesce(sum(when($"kind" === "audio", $"duration_ms")
        .otherwise(0L)), lit(0L)).as("sum_audio_ms"),
      coalesce(sum(when($"codec".isin("jdk-imageio", "jdk-sampled"), 1L)
        .otherwise(0L)), lit(0L)).as("n_jdk_decoded"))
    val norm2 = aggregate($"feature", lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val f = feats.agg(
      coalesce(sum(when(abs(norm2 - 1.0) < 1e-3, 1L).otherwise(0L)), lit(0L))
        .as("n_unit_norm"))
    val r = halves.agg(
      coalesce(sum($"width".cast("long")), lit(0L)).as("sum_half_width"),
      coalesce(sum($"height".cast("long")), lit(0L)).as("sum_half_height"),
      coalesce(sum(when($"codec" === "jdk-imageio", 1L).otherwise(0L)),
        lit(0L)).as("n_half_decoded"))
    m.crossJoin(f).crossJoin(r)
      .select($"n_media", $"n_images", $"sum_img_width", $"sum_img_height",
        $"sum_audio_ms", $"sum_half_width", $"sum_half_height",
        ($"n_jdk_decoded" === $"n_media" && $"n_unit_norm" === $"n_media" &&
          $"n_half_decoded" === $"n_images").as("codec_law"))
  }

  /** The queries-surface entry: media → decode → featurize → per-kind
    * rollup, every column a VALUE the oracle recomputes from the payload
    * bytes: counts, byte totals, durations (= 8×bytes by the stub's
    * contract), width/height sums (md5-derived, so DuckDB rebuilds them
    * from `md5(text)`), the count of unit-norm feature vectors (norm2≈1
    * exactly when the payload has ≥4 bytes — one 4-gram), and the codec
    * tag. No pinned booleans: a stub regression in any decoded value
    * hash-mismatches the oracle.
    */
  def mediaSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    val meta = decodeMeta(media)
    val feats = featurize(media)
    val norm2 = aggregate($"feature", lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    meta.join(feats.select($"media_id", norm2.as("norm2")), "media_id")
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        sum($"duration_ms").as("total_duration_ms"),
        sum($"width".cast("long")).as("sum_width"),
        sum($"height".cast("long")).as("sum_height"),
        sum(when(abs($"norm2" - 1.0) < 1e-3, 1L).otherwise(0L))
          .as("unit_norm_count"),
        min($"codec").as("codec_tag"))
  }
}
