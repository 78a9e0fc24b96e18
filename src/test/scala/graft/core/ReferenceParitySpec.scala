package graft.core

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The reference repository's ONLY published end-to-end output: hashing a
  * directory containing exactly test/data/iris.csv at the defaults
  * (sha256, 128M) prints the value pinned in its README
  * (/root/reference/README.md:65 — modulo the documented colon/dash
  * separator typo there; the code emits dashes, dirhash.py:253).
  * Reproducing it byte-for-byte is the strongest cross-implementation
  * parity check available.
  */
class ReferenceParitySpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val irisSrc = Paths.get("/root/reference/test/data/iris.csv")

  test("reference Docker smoke fixture reproduces the published hash") {
    assume(Files.exists(irisSrc), "reference fixture not present")
    val dir = Files.createTempDirectory("graft-iris")
    try {
      Files.copy(irisSrc, dir.resolve("iris.csv"))
      val h = DirHash.hashDirectory(spark, dir.toString, "sha256", "128M")
      assert(h ==
        "v1-sha256-128M-aa669dcefba57e01bd7ff0526a0001d2118f06adc8106d265b5743b0ee90084f")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
