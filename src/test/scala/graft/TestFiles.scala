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
}
