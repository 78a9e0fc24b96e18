package graft

import java.nio.file.{Files, Path}

/** Shared test-fixture filesystem helpers (every spec was re-implementing
  * the recursive delete).
  */
object TestFiles {
  def rmrf(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Lowercase md5 hex of a UTF-8 string — brute-force-replay twin of
    * the engine's md5-prefix sample predicates.
    */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
