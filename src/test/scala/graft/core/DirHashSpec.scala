package graft.core

import graft.SparkTestSession
import graft.fs.{FileEntry, Listing}
import graft.hash.{Algos, HashSpec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}

/** Ports the reference's golden tests 1:1
  * (/root/reference/dirhash_test.py:44-296): chunk-hash known answers,
  * the chunking boundary matrix, and the end-to-end composite directory
  * hash over the identical fixture tree (incl. empty file, empty dir,
  * 32 MiB zeros, space in a filename).
  */
class DirHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private var root: Path = _

  private val LoremPath = "dir/subdir1/loremipsum.txt"
  private val LoremText = "Lorem ipsum dolor sit amet..."
  private val HelloPath = "dir/subdir1/hello_world.html"
  private val HelloText = "<html><body>Hello, World!</body></html>"
  private val PasswordsPath = "dir/subdir2/my_passwords.txt"
  private val PasswordsText = "123456\npassword\nqwerty\nadmin\n1968\n"
  private val AbcPath = "dir/subdir3/abc.txt"
  private val AbcText = "abc"
  private val EmptyPath = "dir/empty_file.txt"
  private val ZerosPath = "32M Zeros.bin"
  private val ZerosLen = 32 * 1024 * 1024

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("dirhash-fixture")
    Seq("dir/subdir1", "dir/subdir2", "dir/subdir3", "dir/emptysubdir")
      .foreach(d => Files.createDirectories(root.resolve(d)))
    Files.write(root.resolve(LoremPath), LoremText.getBytes("UTF-8"))
    Files.write(root.resolve(HelloPath), HelloText.getBytes("UTF-8"))
    Files.write(root.resolve(PasswordsPath), PasswordsText.getBytes("UTF-8"))
    Files.write(root.resolve(AbcPath), AbcText.getBytes("UTF-8"))
    Files.write(root.resolve(EmptyPath), Array.emptyByteArray)
    Files.write(root.resolve(ZerosPath), new Array[Byte](ZerosLen))
  }

  override def afterAll(): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(root)
  }

  private def chunkHashHex(path: String, num: Long, content: Array[Byte], algo: String): String = {
    val d = Algos.get(algo)
    d.update(path); d.update(Array(0.toByte))
    d.update(num.toString); d.update(Array(0.toByte))
    d.update(content)
    Algos.hex(d.digest())
  }

  test("chunk-hash golden vectors (dirhash_test.py:163-184)") {
    assert(chunkHashHex(LoremPath, 0, LoremText.getBytes, "sha224") ==
      "47f643133bc485ccd35f8062487ef5dea826c7ce4761172787cc0e6d")
    assert(chunkHashHex(LoremPath, 0, LoremText.getBytes, "sha256") ==
      "31cf1c37b0ad34b0f338dfd67e28f84e6c250ff86449d0ca04e459bf5d8ecef2")
    assert(chunkHashHex(HelloPath, 0, HelloText.getBytes, "sha256") ==
      "4580355ebe176eaf9104604a29ecf94a29d0fc037195cb7188db4d395e083eab")
    assert(chunkHashHex(PasswordsPath, 0, PasswordsText.getBytes, "sha256") ==
      "526c93bf9075212ede97162d68a47697b412a152e7804b53cb036a6d1b361630")
    assert(chunkHashHex(PasswordsPath, 0, PasswordsText.getBytes, "sha384") ==
      "0c9ad04c8553046eacbc6260c32daa76e9f88d0f33f77cf3aebd03e204e5e168d530874b1239f7d99bfc64789fc1224e")
    assert(chunkHashHex(AbcPath, 0, AbcText.getBytes, "sha256") ==
      "b4f567d6c89cd9998bf08292ba1f04190b2213236d5691b2a24a6adcef1dc663")
    assert(chunkHashHex(AbcPath, 0, AbcText.getBytes, "sha512") ==
      "5e7bfaf0fa6d6e46357b0c4c19e85dcf17d0ac910fc829c480d04457f02795fa23ae096d61acfb09d5110ea23530f0dbd5b4a5d819071a00b42e3375202409ea")
    assert(chunkHashHex(EmptyPath, 0, Array.emptyByteArray, "sha224") ==
      "9b227149fdfcf594980496a203b946f85b47c20c4f712dd559fce447")
    assert(chunkHashHex(EmptyPath, 0, Array.emptyByteArray, "sha256") ==
      "59d4ae7bc15d68b021c0c9557c3568b769e36d6cc9a56582cc4c1b7f1d9a1bac")
    assert(chunkHashHex(ZerosPath, 0, new Array[Byte](ZerosLen), "sha256") ==
      "67ee253eb4f7db3687ecd8fb8e8fd6712b828f1b8f742691070343b1c5bd630b")
  }

  test("chunking boundary matrix (dirhash_test.py:187-224)") {
    def chunksOf(rel: String, blockSize: Long): Seq[(Long, Array[Byte])] =
      Chunker.fileChunks(spark, root.resolve(rel).toString, blockSize)
        .collect().sortBy(_._1).toSeq

    // whole file in one chunk
    val whole = chunksOf(AbcPath, 1024)
    assert(whole.map(_._1) == Seq(0L))
    assert(new String(whole.head._2) == "abc")
    // 1-byte chunks
    assert(chunksOf(AbcPath, 1).map(c => (c._1, new String(c._2))) ==
      Seq((0L, "a"), (1L, "b"), (2L, "c")))
    // uneven final chunk
    assert(chunksOf(AbcPath, 2).map(c => (c._1, new String(c._2))) ==
      Seq((0L, "ab"), (1L, "c")))
    // empty file -> no chunks
    assert(chunksOf(EmptyPath, 1024).isEmpty)
    // exact-multiple file: 1 chunk at 32M, 2 at 16M, 1024 at 32K
    assert(chunksOf(ZerosPath, ZerosLen).map(_._2.length) == Seq(ZerosLen))
    val halves = chunksOf(ZerosPath, 16 * 1024 * 1024)
    assert(halves.map(_._1) == Seq(0L, 1L))
    assert(halves.forall(c => c._2.length == 16 * 1024 * 1024 && c._2.forall(_ == 0)))
    val kchunks = chunksOf(ZerosPath, 32 * 1024)
    assert(kchunks.map(_._1) == (0L until 1024L))
    assert(kchunks.forall(_._2.length == 32 * 1024))
  }

  test("listing includes empty dirs, dirs /-suffixed, root excluded") {
    val entries = Listing.list(root.toString, spark.sparkContext.hadoopConfiguration)
    val rels = entries.map(_.relPath).sorted(Listing.utf8Ordering)
    assert(rels == Seq(
      "32M Zeros.bin", "dir/", "dir/empty_file.txt", "dir/emptysubdir/",
      "dir/subdir1/", "dir/subdir1/hello_world.html", "dir/subdir1/loremipsum.txt",
      "dir/subdir2/", "dir/subdir2/my_passwords.txt", "dir/subdir3/",
      "dir/subdir3/abc.txt"))
    assert(entries.count(_.isDir) == 5)
  }

  // Composite expectation assembled by hand exactly as
  // dirhash_test.py:246-267 does; the resulting constant was cross-checked
  // against the spec (2ba2bc52…).
  private lazy val expectedCompositeHex: String = {
    val h = Algos.get("sha256")
    val zero = Array(0.toByte)
    h.update("11"); h.update(zero)
    Seq("32M Zeros.bin", "dir/", "dir/empty_file.txt", "dir/emptysubdir/",
      "dir/subdir1/", "dir/subdir1/hello_world.html", "dir/subdir1/loremipsum.txt",
      "dir/subdir2/", "dir/subdir2/my_passwords.txt", "dir/subdir3/",
      "dir/subdir3/abc.txt").foreach { e => h.update(e); h.update(zero) }
    def digestOf(path: String, content: Array[Byte]): Array[Byte] = {
      val d = Algos.get("sha256")
      d.update(path); d.update(zero); d.update("0"); d.update(zero); d.update(content)
      d.digest()
    }
    // chunk digests in (relPath, idx) order; empty file contributes none
    h.update(digestOf(ZerosPath, new Array[Byte](ZerosLen)))
    h.update(digestOf(HelloPath, HelloText.getBytes))
    h.update(digestOf(LoremPath, LoremText.getBytes))
    h.update(digestOf(PasswordsPath, PasswordsText.getBytes))
    h.update(digestOf(AbcPath, AbcText.getBytes))
    Algos.hex(h.digest())
  }

  test("end-to-end composite directory hash (dirhash_test.py:226-296)") {
    assert(expectedCompositeHex ==
      "2ba2bc5268c14ee3a736e4d4eab10aef9374870bae23b4983834cc25629a1583")

    val actual = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 32L * 1024 * 1024)
    assert(actual == expectedCompositeHex)

    // trailing-slash invariance
    assert(DirHash.hashDirectoryRaw(spark, root.toString + "/", "sha256", 32L * 1024 * 1024)
      == expectedCompositeHex)

    // verify_raw_directory_hash
    val ok = DirHash.verifyRawDirectoryHash(spark, root.toString, "sha256",
      32L * 1024 * 1024, expectedCompositeHex)
    assert(ok == HashComparisonResult(matches = true, expectedCompositeHex))

    // string form + verify round trip
    val hashStr = DirHash.hashDirectory(spark, root.toString, "sha256", "32M")
    assert(hashStr == s"v1-sha256-32M-$expectedCompositeHex")
    assert(DirHash.verifyDirectoryHash(spark, root.toString, hashStr).matches)
    // a mismatching digest is reported, not thrown
    val bad = DirHash.verifyDirectoryHash(spark, root.toString,
      s"v1-sha256-32M-${"0" * 64}")
    assert(!bad.matches && bad.actualHash == expectedCompositeHex)
  }

  test("multi-chunk file hashes identically at smaller block size than file") {
    // 32M zeros at 1M blocksize -> 32 chunks; recompute expectation by hand
    val h = Algos.get("sha256")
    val zero = Array(0.toByte)
    h.update("11"); h.update(zero)
    Seq("32M Zeros.bin", "dir/", "dir/empty_file.txt", "dir/emptysubdir/",
      "dir/subdir1/", "dir/subdir1/hello_world.html", "dir/subdir1/loremipsum.txt",
      "dir/subdir2/", "dir/subdir2/my_passwords.txt", "dir/subdir3/",
      "dir/subdir3/abc.txt").foreach { e => h.update(e); h.update(zero) }
    val mb = new Array[Byte](1024 * 1024)
    (0 until 32).foreach { i =>
      val d = Algos.get("sha256")
      d.update(ZerosPath); d.update(zero); d.update(i.toString); d.update(zero); d.update(mb)
      h.update(d.digest())
    }
    Seq(HelloPath -> HelloText, LoremPath -> LoremText,
      PasswordsPath -> PasswordsText, AbcPath -> AbcText).foreach { case (p, t) =>
      val d = Algos.get("sha256")
      d.update(p); d.update(zero); d.update("0"); d.update(zero); d.update(t.getBytes)
      h.update(d.digest())
    }
    val expected = Algos.hex(h.digest())
    assert(DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 1024 * 1024) == expected)
    assert(DirHash.hashDirectory(spark, root.toString, "sha256", "1M") ==
      s"v1-sha256-1M-$expected")
  }

  test("empty root hashes the reference byte layout: count, 0x00, 0x00 (ADVICE r1)") {
    // reference fold: str(0) + "\0" + "\0".join([]) + "\0" = "0\0\0"
    // (dirhash.py:422-441 — the trailing separator is unconditional)
    val emptyRoot = Files.createTempDirectory("dirhash-empty")
    try {
      val h = Algos.get("sha256")
      h.update("0".getBytes("UTF-8"))
      h.update(Array(0.toByte, 0.toByte))
      val expected = Algos.hex(h.digest())
      assert(DirHash.hashDirectoryRaw(spark, emptyRoot.toString, "sha256", 1024) == expected)
    } finally Files.delete(emptyRoot)
  }

  test("hash changes on rename, content change, and added empty dir") {
    val base = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 32L * 1024 * 1024)
    val extra = root.resolve("dir/anotherempty")
    Files.createDirectory(extra)
    try {
      val withDir = DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 32L * 1024 * 1024)
      assert(withDir != base)
    } finally Files.delete(extra)
    assert(DirHash.hashDirectoryRaw(spark, root.toString, "sha256", 32L * 1024 * 1024) == base)
  }
}
