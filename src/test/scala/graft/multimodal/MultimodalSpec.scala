package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("mediaTable: opaque binary column with kind metadata") {
    val m = mediaTable(spark, sf)
    val schema = m.schema.map(f => (f.name, f.dataType.typeName)).toMap
    assert(schema("content") == "binary")
    assert(schema("kind") == "string")
    val kinds = m.collect().map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeMeta is deterministic and batch-size invariant") {
    val media = mediaTable(spark, sf)
    val a = decodeMeta(media, batchSize = 1).collect().sortBy(_.media_id)
    val b = decodeMeta(media, batchSize = 1000).collect().sortBy(_.media_id)
    assert(a.map(r => (r.media_id, r.width, r.height, r.duration_ms, r.codec)).toSeq ==
      b.map(r => (r.media_id, r.width, r.height, r.duration_ms, r.codec)).toSeq)
    assert(a.forall(r => r.width >= 64 && r.height >= 64 && r.n_bytes > 0))
  }

  test("featurize: fixed dim, L2-normalized, batch-size invariant") {
    val media = mediaTable(spark, sf)
    val f1 = featurize(media, dim = 64, batchSize = 3).collect().sortBy(_.media_id)
    val f2 = featurize(media, dim = 64, batchSize = 500).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 64))
    val norms = f1.map(_.feature.foldLeft(0.0)((s, x) => s + x * x))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("frameSample: only video rows, strided frame indices, bounded frames") {
    val media = mediaTable(spark, sf)
    val frames = frameSample(media, frameSize = 100, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(_.frame.length <= 100))
    // reassembly: frame 0 of each media is the payload's first 100 bytes
    val byId = mediaTable(spark, sf).filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.content).toMap
    frames.filter(_.frame_idx == 0).foreach { f =>
      assert(f.frame.toSeq == byId(f.media_id).take(100).toSeq)
    }
  }

  test("resize: 1/scale output bytes, deterministic, scale=1 is identity") {
    val media = mediaTable(spark, sf)
    val r4 = resize(media, scale = 4).collect().sortBy(_.media_id)
    assert(r4.forall(r => r.content.length == (r.orig_bytes + 3) / 4))
    val r1 = resize(media, scale = 1).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id)
    assert(r1.map(_.content.toSeq).toSeq == orig.map(_.content.toSeq).toSeq)
    // deterministic across batch sizes
    val r4b = resize(media, scale = 4, batchSize = 1).collect().sortBy(_.media_id)
    assert(r4.map(_.content.toSeq).toSeq == r4b.map(_.content.toSeq).toSeq)
  }

  test("mediaFromDirectory: binaryFile source with extension-derived kinds") {
    val root = java.nio.file.Files.createTempDirectory("graft-media")
    try {
      java.nio.file.Files.write(root.resolve("a.png"), Array[Byte](1, 2, 3))
      java.nio.file.Files.createDirectories(root.resolve("sub"))
      java.nio.file.Files.write(root.resolve("sub/b.mp4"), Array[Byte](4, 5))
      java.nio.file.Files.write(root.resolve("c.dat"), Array[Byte](6))
      val m = mediaFromDirectory(spark, root.toString).collect()
      assert(m.map(_.kind).sorted.toSeq == Seq("binary", "image", "video"))
      assert(m.map(_.media_id).distinct.length == 3)
      // the decode/featurize operators run unchanged on real-file media
      val decoded = decodeMeta(mediaFromDirectory(spark, root.toString)).collect()
      assert(decoded.length == 3 && decoded.forall(_.n_bytes > 0))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("mediaSummary rolls up decode + features per kind as oracle values") {
    val s = mediaSummary(spark, sf).collect()
    assert(s.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(s.forall(_.getLong(1) > 0))
    // duration = 8 × bytes is the stub codec's contract (oracle-checked too)
    assert(s.forall(r => r.getLong(3) == 8 * r.getLong(2)))
    // md5-derived dims land in [64, 1087], so per-kind sums are bounded
    assert(s.forall(r => r.getLong(4) >= 64 * r.getLong(1) &&
      r.getLong(4) <= 1087 * r.getLong(1)))
    assert(s.forall(r => r.getLong(5) >= 64 * r.getLong(1) &&
      r.getLong(5) <= 1087 * r.getLong(1)))
    // every testdata payload has ≥4 bytes → every feature is unit-norm
    assert(s.forall(r => r.getLong(6) == r.getLong(1)))
    assert(s.forall(r => r.getString(7) == s"stub-${r.getString(0)}"))
  }

  test("StubCodec dims match the md5-prefix formula the oracle recomputes") {
    val bytes = "hello world".getBytes("UTF-8")
    val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    val m = StubCodec.decode("image", bytes)
    assert(m.width == 64 + (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1024).toInt)
    assert(m.height == 64 + (java.lang.Long.parseLong(hex.substring(8, 16), 16) % 1024).toInt)
    assert(m.durationMs == bytes.length * 8L && m.codec == "stub-image")
  }

  // --- codec swap contract: the Spark-side plumbing must be a pure
  // function of the MediaCodec instance. An independent toy codec with
  // DIFFERENT values on every path proves no operator secretly calls
  // StubCodec, and the same property suite runs over both.

  /** Second MediaCodec implementation: length-derived metadata, byte
    * histogram features, tail-keeping resize, odd-window frames —
    * deliberately disagrees with StubCodec on every output.
    */
  private object ToyCodec extends MediaCodec {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta =
      MediaMeta(10 + bytes.length % 7, 20 + bytes.length % 5,
        bytes.length.toLong, s"toy-$kind")
    def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      bytes.foreach(b => acc((b & 0xff) % dim) += 1f)
      acc
    }
    def resize(bytes: Array[Byte], scale: Int): Array[Byte] =
      bytes.takeRight((bytes.length + scale - 1) / scale)
    def frames(bytes: Array[Byte], frameSize: Int,
        stride: Int): Iterator[(Int, Array[Byte])] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (c, i) if i % stride == 1 => (i, c) }
  }

  for ((name, codec) <- Seq("StubCodec" -> (StubCodec: MediaCodec),
      "ToyCodec" -> (ToyCodec: MediaCodec))) {
    test(s"decode/featurize/resize/frame paths are codec-agnostic: $name") {
      val media = mediaTable(spark, sf)
      val sample = media.collect().sortBy(_.media_id).take(20)
      // decode: distributed output == the codec applied driver-side
      val dec = decodeMeta(media, batchSize = 7, codec = codec).collect()
        .map(r => r.media_id -> r).toMap
      sample.foreach { m =>
        val want = codec.decode(m.kind, m.content)
        val got = dec(m.media_id)
        assert((got.width, got.height, got.duration_ms, got.codec) ==
          (want.width, want.height, want.durationMs, want.codec), name)
      }
      // featurize: exact vector equality with the driver-side codec
      val feats = featurize(media, dim = 16, codec = codec).collect()
        .map(r => r.media_id -> r.feature.toSeq).toMap
      sample.foreach { m =>
        assert(feats(m.media_id) == codec.featurize(m.content, 16).toSeq, name)
      }
      // resize: bytes equal the codec's own transform
      val rz = resize(media, scale = 3, codec = codec).collect()
        .map(r => r.media_id -> r.content.toSeq).toMap
      sample.foreach { m =>
        assert(rz(m.media_id) == codec.resize(m.content, 3).toSeq, name)
      }
      // frames: the per-media (idx, bytes) multiset matches
      val fr = frameSample(media, frameSize = 64, stride = 2, codec = codec)
        .collect().groupBy(_.media_id)
        .map { case (id, fs) =>
          id -> fs.map(f => (f.frame_idx, f.frame.toSeq)).sortBy(_._1).toSeq }
      sample.filter(_.kind == "video").foreach { m =>
        val want = codec.frames(m.content, 64, 2)
          .map { case (i, c) => (i, c.toSeq) }.toSeq.sortBy(_._1)
        assert(fr.getOrElse(m.media_id, Seq.empty) == want, name)
      }
    }
  }

  test("the two codecs actually disagree — the parameterization is not vacuous") {
    val bytes = "some payload bytes".getBytes("UTF-8")
    assert(StubCodec.decode("image", bytes) != ToyCodec.decode("image", bytes))
    assert(StubCodec.featurize(bytes, 16).toSeq != ToyCodec.featurize(bytes, 16).toSeq)
    assert(StubCodec.resize(bytes, 3).toSeq != ToyCodec.resize(bytes, 3).toSeq)
    assert(StubCodec.frames(bytes, 4, 2).toSeq.map(_._1) !=
      ToyCodec.frames(bytes, 4, 2).toSeq.map(_._1))
  }

  test("media features flow into the similarity operators' contract") {
    import org.apache.spark.sql.functions._
    val spark2 = spark; import spark2.implicits._
    val feats = featurize(mediaTable(spark, sf)).toDF()
    // same array<float> shape as embeddings.parquet: cosine vs first row
    val q = feats.filter($"media_id" === 1L).select($"feature".as("qf"))
    val scored = feats.crossJoin(broadcast(q))
      .select($"media_id",
        aggregate(zip_with($"feature", $"qf", (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("cos"))
      .orderBy(desc("cos")).limit(5).collect()
    assert(scored.head.getLong(0) == 1L) // self-similarity is max (unit norms)
  }
}
