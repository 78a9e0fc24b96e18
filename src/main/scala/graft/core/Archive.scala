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

  /** `ln -s <repo>/<hashStr> <linkPath>` — fails if `linkPath` exists
    * (reference pre-check, dirhash.py:663-666).
    */
  def createSoftlink(hashedRepo: String, hashStr: String, linkPath: String): Unit = {
    val link = Paths.get(linkPath)
    if (Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      throw new IllegalStateException(s"softlink target already exists: $linkPath")
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
