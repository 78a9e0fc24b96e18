package graft.core

import java.nio.file.{Files, Path}
import graft.fs.FileEntry
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator properties from the SURVEY.md §5 port plan:
  * chunk plans reassemble to the file, the directory hash is
  * deterministic, and sensitive to content/structure changes. Raw Gen
  * sampling with fixed seeds (scalatestplus bridge isn't available in the
  * offline dependency set) — deterministic across runs.
  */
class ChunkerPropSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val sizes: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 4L), Gen.choose(0L, 4096L), Gen.oneOf(0L, 1L, 1023L, 1024L, 1025L))
  private val blocks: Gen[Long] = Gen.oneOf(1L, 2L, 3L, 7L, 64L, 1024L, 4096L)

  test("property: chunk plan covers the file exactly once, in order") {
    for {
      size <- samples(sizes, 60)
      block <- samples(blocks, 7)
    } {
      val specs = Chunker.planChunks("/r", Seq(FileEntry("f", isDir = false, size)), block)
      assert(specs.map(_.idx) == specs.indices.map(_.toLong)) // dense 0..n-1
      assert(specs.map(_.len).sum == size) // tiles [0, size): no gap/overlap
      specs.foreach(s => assert(s.offset == s.idx * block))
      specs.dropRight(1).foreach(s => assert(s.len == block))
      specs.lastOption.foreach(s => assert(s.len == size - s.offset && s.len > 0))
      if (size == 0) assert(specs.isEmpty) // empty file => zero chunks (§1.3)
    }
  }

  private val fileGen: Gen[(String, Array[Byte])] = for {
    dir <- Gen.oneOf("a", "b", "deep/nested")
    name <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    bytes <- Gen.choose(0, 600).flatMap(n => Gen.listOfN(n, Arbitrary.arbByte.arbitrary))
  } yield (s"$dir/$name", bytes.toArray)

  private def writeTree(files: Map[String, Array[Byte]]): Path = {
    val root = Files.createTempDirectory("graft-prop")
    files.foreach { case (rel, bytes) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    root
  }

  private def rmTree(root: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  test("property: directory hash deterministic, content- and name-sensitive") {
    for ((files, block) <- samples(Gen.mapOfN(3, fileGen), 4).zip(samples(blocks, 4))
         if files.nonEmpty) {
      val root = writeTree(files)
      try {
        val h1 = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", block)
        val h2 = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", block)
        assert(h1 == h2) // deterministic across runs (incl. shuffle order)

        val (rel, bytes) = files.head
        if (bytes.nonEmpty) { // flipping one byte changes the hash
          val mutated = bytes.clone(); mutated(0) = (mutated(0) ^ 1).toByte
          Files.write(root.resolve(rel), mutated)
          assert(DirHash.hashDirectoryRaw(spark, root.toString, "sha256", block) != h1)
          Files.write(root.resolve(rel), bytes)
        }

        // renaming a file changes the hash (listing + digest domain)
        Files.move(root.resolve(rel), root.resolve(rel + ".renamed"))
        assert(DirHash.hashDirectoryRaw(spark, root.toString, "sha256", block) != h1)
      } finally rmTree(root)
    }
  }

  test("property: hash invariant to block size when every file fits one chunk") {
    for (files <- samples(Gen.mapOfN(2, fileGen), 3) if files.nonEmpty) {
      val root = writeTree(files)
      try {
        val big1 = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 1 << 20)
        val big2 = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 1 << 21)
        assert(big1 == big2)
      } finally rmTree(root)
    }
  }

  test("property: distributed plan == driver plan (forced via driverSpecLimit 0)") {
    import graft.fs.FileEntry
    for {
      size <- samples(sizes, 20)
      block <- samples(blocks, 4)
    } {
      val entries = Seq(FileEntry("a/f1", isDir = false, size),
        FileEntry("f2", isDir = false, (size * 3) % 4097),
        FileEntry("a", isDir = true, 0L),
        FileEntry("empty", isDir = false, 0L))
      val driver = Chunker.planChunks("/r", entries, block)
      val dist = Chunker.planChunksDataset(spark, "/r", entries, block,
        driverSpecLimit = 0L).collect().toSeq
      assert(dist.sortBy(s => (s.relPath, s.idx)) ==
        driver.sortBy(s => (s.relPath, s.idx)),
        s"plan mismatch at size=$size block=$block")
    }
  }

  test("a 10-million-chunk listing plans without driver materialization") {
    import graft.fs.FileEntry
    // 10 files × 1e6 chunks each: the old driver Seq would be 1e7
    // ChunkSpec objects (~1.5 GB with object headers + two boxed paths
    // each); the Dataset plan never materializes them driver-side —
    // lazy iterator flatMap per file, spot-checked at both extremes.
    // (Planning needs sizes only; no bytes are read.)
    val entries = (0 until 10).map(i =>
      FileEntry(f"big$i%02d", isDir = false, 1000000L * 512))
    val ds = Chunker.planChunksDataset(spark, "/r", entries, 512L,
      driverSpecLimit = 1000L)
    assert(ds.count() == 10000000L)
    import spark.implicits._
    val last = ds.filter($"relPath" === "big09" && $"idx" === 999999L)
      .collect()
    assert(last.length == 1 && last(0).offset == 999999L * 512 &&
      last(0).len == 512L)
  }
}
