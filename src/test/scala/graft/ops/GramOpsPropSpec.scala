package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The three gram-window operators (q77 dup fraction, q80 cut, q81
  * novelty) checked against naive in-JVM references on adversarial
  * synthetic corpora — identical twins, within-doc repetition, shared
  * spans straddling doc boundaries, sub-window docs, and a seeded
  * random corpus over a tiny vocabulary (forced collisions). The DuckDB
  * oracle gates the real corpus; this gates the SEMANTICS on shapes the
  * corpus may not contain.
  */
class GramOpsPropSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-gramprop").toString
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", org.apache.spark.sql.functions.lit("en").as("lang"),
        org.apache.spark.sql.functions.lit("s").as("source"),
        org.apache.spark.sql.functions.length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ---- naive references (string windows, no hashing) ----
  private def windows(text: String, n: Int): Seq[String] = {
    val t = text.split(" ", -1).toSeq
    if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def refStats(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Long)] = {
    // corpus-wide window multiplicity and per-gram first doc
    val all = docs.flatMap { case (id, tx) => windows(tx, n).map(w => (id, w)) }
    val counts = all.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val firstDoc = all.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._1).min }
    docs.map { case (id, tx) =>
      val ws = windows(tx, n)
      val dup = ws.count(w => counts(w) > 1).toLong
      val novel = ws.count(w => firstDoc(w) == id).toLong
      id -> (ws.size.toLong, dup, novel)
    }.toMap
  }

  private def refCut(docs: Seq[(Long, String)], n: Int): Map[Long, String] = {
    val all = docs.flatMap { case (id, tx) => windows(tx, n).map(w => (id, w)) }
    val counts = all.groupBy(_._2).map { case (w, xs) => w -> xs.size }
    docs.map { case (id, tx) =>
      val t = tx.split(" ", -1).toSeq
      val dupStarts = (0 to t.length - n)
        .filter(s => counts(t.slice(s, s + n).mkString(" ")) > 1)
      val kept = t.zipWithIndex.collect {
        case (tok, i) if !dupStarts.exists(s => s <= i && i <= s + n - 1) => tok
      }
      id -> kept.mkString(" ")
    }.toMap
  }

  private def check(docs: Seq[(Long, String)], n: Int): Unit = {
    val dir = corpusDir(docs)
    try {
      val expect = refStats(docs, n)
      val dup = Dedup.duplicatedWindowFraction(spark, dir, n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val nov = Dedup.gramNovelty(spark, dir, n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val cut = Dedup.substringDedupCut(spark, dir, n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
      val expectCut = refCut(docs, n)
      docs.foreach { case (id, tx) =>
        val (w, d, nv) = expect(id)
        assert(dup(id) == (w, d), s"doc $id dup: got ${dup(id)}, want ($w, $d)")
        assert(nov(id) == (w, nv), s"doc $id novelty: got ${nov(id)}, want ($w, $nv)")
        assert(cut(id)._1 == tx.split(" ", -1).length.toLong, s"doc $id n_tokens")
        assert(cut(id)._2 == expectCut(id),
          s"doc $id cut: got '${cut(id)._2}', want '${expectCut(id)}'")
      }
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("identical twins: every window duplicated, junior doc zero-novel, full cut") {
    check(Seq(
      0L -> "a b c d e f",
      1L -> "a b c d e f",
      2L -> "g h i j k l"), n = 3)
  }

  test("within-doc repetition counts as duplication and is cut") {
    // "a b c" occurs twice INSIDE doc 0 — dup without any twin doc
    check(Seq(
      0L -> "a b c x a b c",
      1L -> "p q r s t"), n = 3)
  }

  test("shared span straddling two otherwise-different docs") {
    check(Seq(
      0L -> "u v w SHARED1 SHARED2 SHARED3 x y",
      1L -> "m n SHARED1 SHARED2 SHARED3 o p q"), n = 3)
  }

  test("docs shorter than the window emit zero windows and pass through") {
    check(Seq(
      0L -> "a b",
      1L -> "a b",
      2L -> "longer doc with more tokens here"), n = 3)
  }

  test("seeded random corpus over a 6-word vocabulary (forced collisions)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 20L).map { id =>
      val len = 3 + rnd.nextInt(25)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    check(docs, n = 3)
  }
}
