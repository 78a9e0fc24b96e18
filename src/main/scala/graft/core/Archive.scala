package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.PosixFilePermission
import scala.jdk.CollectionConverters._

/** Archive-by-hash sink (reference `move_folder_to_hashed_archive`,
  * /root/reference/dirhash.py:558-578, symlink handling 662-682). Pure
  * driver-side filesystem utility — not a Spark operator.
  */
object Archive {

  /** Moves `path` to `<hashedRepo>/<hashStr>`. If the target already exists
    * the source is DELETED instead (content already archived — the
    * reference's dedup semantics, dirhash.py:565-570). Optionally makes the
    * archived tree read-only (`chmod -R a-w`).
    *
    * @return the target path inside the archive
    */
  def moveFolderToHashedArchive(
      hashedRepo: String, path: String, hashStr: String,
      setReadonly: Boolean = true): Path = {
    val target = Paths.get(hashedRepo, hashStr)
    val source = Paths.get(path)
    if (Files.exists(target)) {
      deleteRecursively(source)
    } else {
      Files.createDirectories(target.getParent)
      Files.move(source, target, StandardCopyOption.ATOMIC_MOVE)
      if (setReadonly) removeWritePermissions(target)
    }
    target
  }

  /** Reference softlink semantics (dirhash.py:671-682): `linkPath` is a
    * DIRECTORY — created if absent (`os.makedirs`) — and the symlink is
    * created inside it by `ln -s <repo>/<hashStr> <linkPath>`, i.e. at
    * `<linkPath>/<hashStr>`. With the CLI's same-path exemption this is
    * what makes "archive, then leave a link at the original location"
    * work: the moved dir's path is recreated as a directory holding a
    * link named by the hash.
    */
  def createSoftlink(hashedRepo: String, hashStr: String, linkPath: String): Unit = {
    val linkDir = Paths.get(linkPath)
    if (!Files.exists(linkDir)) Files.createDirectories(linkDir)
    val link = linkDir.resolve(hashStr)
    if (Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      throw new IllegalStateException(s"softlink target already exists: $link")
    Files.createSymbolicLink(link, Paths.get(hashedRepo, hashStr).toAbsolutePath)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def removeWritePermissions(root: Path): Unit = {
    val writePerms = Set(
      PosixFilePermission.OWNER_WRITE,
      PosixFilePermission.GROUP_WRITE,
      PosixFilePermission.OTHERS_WRITE)
    Files.walk(root).iterator().asScala.foreach { p =>
      val perms = Files.getPosixFilePermissions(p).asScala.toSet -- writePerms
      Files.setPosixFilePermissions(p, perms.asJava)
    }
  }
}
