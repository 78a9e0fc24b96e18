package graft.cli

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Exit-code + output contract of the CLI (reference dirhash.py:582-687):
  * 0 hash/match, 1 mismatch or softlink conflict, 2 usage errors.
  * Runs in-process against the shared test session (Main.run only stops
  * sessions it created).
  */
class MainSpec extends AnyFunSuite {

  graft.SparkTestSession.spark // ensure the shared session exists first

  private def fixture(): Path = {
    val root = Files.createTempDirectory("graft-cli")
    Files.createDirectories(root.resolve("sub"))
    Files.write(root.resolve("a.txt"), "hello".getBytes)
    Files.write(root.resolve("sub/b.bin"), Array.fill[Byte](3000)(7))
    Files.write(root.resolve("empty.txt"), Array.emptyByteArray)
    root
  }

  private def run(args: String*): (Int, String) = {
    val out = new ByteArrayOutputStream()
    val code = Console.withOut(out)(Main.run(args.toArray))
    (code, out.toString.trim)
  }

  private def rm(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  test("hash prints v1 string, exit 0; verify report matches the reference's " +
      "Expected:/Actual: format; mismatch exits 1") {
    val root = fixture()
    try {
      val (c0, hash) = run(root.toString, "-b", "1k")
      assert(c0 == 0)
      assert(hash.startsWith("v1-sha256-1k-"))
      val hex = hash.split("-", 4)(3)

      // reference two-line digest-only report (dirhash.py:645-661):
      // "%9s %s" right-justifies "Actual:" to 9 chars
      val (c1, out1) = run(root.toString, "--check", hash, "-b", "1k")
      assert(c1 == 0)
      assert(out1 == s"The hash values match:\nExpected: $hex\n  Actual: $hex",
        out1)

      val bogusHex = hex.dropRight(8) + "00000000"
      val bogus = hash.dropRight(8) + "00000000"
      val (c2, out2) = run(root.toString, "-c", bogus, "-b", "1k")
      assert(c2 == 1)
      assert(out2 == s"Hash value mismatch:\nExpected: $bogusHex\n  Actual: $hex",
        out2)
    } finally rm(root)
  }

  test("usage errors exit 2") {
    assert(run()._1 == 2) // no dir
    assert(run("/tmp", "--check", "x", "--check-name")._1 == 2) // exclusive
    assert(run("/tmp", "--softlink", "l")._1 == 2) // softlink sans archive
    assert(run("/tmp", "-a", "md5")._1 == 2) // weak algo rejected
    assert(run("/tmp", "--bogus")._1 == 2) // unknown flag
  }

  test("softlink conflict pre-checked: exit 1 with NO side effects (ADVICE r1)") {
    val root = fixture()
    val repo = Files.createTempDirectory("graft-repo-sl")
    val link = Files.createTempFile("graft-existing-link", "")
    try {
      // link path already exists -> exit 1 BEFORE hashing/archiving:
      // source stays in place, nothing lands in the repo
      val (code, _) = run(root.toString, "-b", "1k",
        "--move-to-archive", repo.toString, "--softlink", link.toString)
      assert(code == 1)
      assert(Files.exists(root.resolve("a.txt")), "source must not be moved on conflict")
      import scala.jdk.CollectionConverters._
      assert(Files.list(repo).iterator().asScala.isEmpty, "repo must stay empty on conflict")
    } finally {
      Files.deleteIfExists(link)
      rm(repo); rm(root)
    }
  }

  test("softlink failure AFTER a successful archive still exits 0 " +
      "(reference logs the ln error and continues, dirhash.py:671-682)") {
    val root = fixture()
    val repo = Files.createTempDirectory("graft-repo-slfail")
    val blocker = Files.createTempFile("graft-blocker", "")
    try {
      // link path nested under a regular FILE: passes the pre-check (the
      // path does not exist) but createSoftlink's createDirectories
      // throws Not-a-directory — even as root
      val badLink = blocker.resolve("sub").toString
      val (code, printed) = run(root.toString, "-b", "1k",
        "--move-to-archive", repo.toString, "--softlink", badLink)
      assert(code == 0, "archive succeeded; ln failure must not flip the exit code")
      assert(Files.isDirectory(Paths.get(printed)), "archive path printed and real")
    } finally {
      Files.deleteIfExists(blocker)
      rm(repo)
      if (Files.exists(root)) rm(root) // moved into the repo on success
    }
  }

  test("softlink == hashed dir is exempt from the conflict check: archive " +
      "leaves a link directory at the original location (dirhash.py:663)") {
    val root = fixture()
    val repo = Files.createTempDirectory("graft-repo-self")
    try {
      val (code, printed) = run(root.toString, "-b", "1k",
        "--move-to-archive", repo.toString, "--softlink", root.toString)
      assert(code == 0)
      val archived = Paths.get(printed)
      val hash = archived.getFileName.toString
      // reference: makedirs(softlink) then `ln -s new_path softlink` →
      // the link lands INSIDE the recreated dir, named by the hash
      val link = root.resolve(hash)
      assert(Files.isDirectory(root), "original path recreated as a dir")
      assert(Files.isSymbolicLink(link), s"expected symlink at $link")
      assert(Files.readSymbolicLink(link) == archived.toAbsolutePath)
      // the link resolves INTO the archive: the moved content is reachable
      // through the original location
      assert(Files.exists(link.resolve("a.txt")))
    } finally {
      import scala.jdk.CollectionConverters._
      if (Files.exists(repo))
        Files.walk(repo).iterator().asScala.foreach(p => p.toFile.setWritable(true))
      rm(repo); rm(root)
    }
  }

  test("archive prints the new archive path, --check-name self-verifies, " +
      "dedup deletes source") {
    val root = fixture()
    val repo = Files.createTempDirectory("graft-repo")
    try {
      // reference prints the archive target path, not the hash
      // (dirhash.py:668-669)
      val (c0, printed) = run(root.toString, "-b", "1k", "--move-to-archive", repo.toString)
      assert(c0 == 0)
      val archived = Paths.get(printed)
      assert(archived.getParent == repo, s"printed '$printed' not under $repo")
      val hash = archived.getFileName.toString
      assert(hash.startsWith("v1-sha256-1k-"))
      assert(Files.isDirectory(archived) && !Files.exists(root))

      val (c1, out1) = run(archived.toString, "--check-name", "-b", "1k")
      assert(c1 == 0 && out1.startsWith("The hash values match:"), out1)

      // identical second tree: target exists => source deleted (dedup)
      val root2 = fixture()
      val (c2, _) = run(root2.toString, "-b", "1k", "--move-to-archive", repo.toString)
      assert(c2 == 0 && !Files.exists(root2))
    } finally {
      // archive chmods a-w; restore before cleanup
      import scala.jdk.CollectionConverters._
      if (Files.exists(repo))
        Files.walk(repo).iterator().asScala.foreach(p => p.toFile.setWritable(true))
      rm(repo); rm(root)
    }
  }
}
