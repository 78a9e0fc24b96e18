package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator properties for the codegen'd text expressions, checked
  * against naive reference implementations (raw Gen sampling with fixed
  * seeds — deterministic, no scalatestplus bridge in the offline set).
  */
class TextOpsPropSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // texts shaped like the corpus plus adversarial shapes: empty, single
  // char, runs of spaces (empty tokens), long tokens, unicode
  private val texts: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(" "),
    Gen.const("  a  b "),
    Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d e", "", "é", "日本"))
      .map(_.mkString(" ")),
    Gen.alphaNumStr)

  private def refFeatureHash(text: String, dim: Int): Array[Long] = {
    val counts = new Array[Long](dim)
    // split keeping ALL empties (Spark split(_, " ") == str.split(" ", -1))
    text.split(" ", -1).foreach { tok =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md5.take(4).map(b => f"${b & 0xff}%02x").mkString
      counts((java.lang.Long.parseLong(hex, 16) % dim).toInt) += 1
    }
    counts
  }

  test("property: featureHash equals the hex-parse reference; counts sum to token count") {
    for (text <- samples(texts, 200); dim <- Seq(4, 64)) {
      val got = TextOps.featureHash(UTF8String.fromString(text), dim).toLongArray()
      val ref = refFeatureHash(text, dim)
      assert(got.toSeq == ref.toSeq, s"text=${text.take(40)} dim=$dim")
      assert(got.sum == text.split(" ", -1).length, s"token count, text=${text.take(40)}")
    }
  }

  test("property: simhash32 equals the naive per-token vote reference") {
    def refSimhash(text: String): Long = {
      val votes = new Array[Int](32)
      text.split(" ", -1).foreach { tok =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8")).take(4)
          .map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex, 16)
        (0 until 32).foreach(b =>
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 32).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    for (text <- samples(texts, 200)) {
      val got = TextOps.simhash32(UTF8String.fromString(text))
      assert(got == refSimhash(text), s"text=${text.take(40)}")
    }
  }

  test("property: bigramCounts total equals max(len-1, 0) and keys are true bigrams") {
    for (text <- samples(texts, 200)) {
      val m = TextOps.bigramCounts(UTF8String.fromString(text))
      val keys = m.keyArray().toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString)
      val vals = m.valueArray().toLongArray()
      assert(vals.sum == math.max(text.length - 1, 0), s"text=${text.take(40)}")
      val naive = text.sliding(2).filter(_.length == 2).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(keys.zip(vals).toMap == naive, s"text=${text.take(40)}")
    }
  }
}
