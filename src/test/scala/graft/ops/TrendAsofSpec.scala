package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q136-q139 batch: OLS on an exact synthetic line,
  * skip-gram PMI on a hand-counted corpus, sketch-union tolerance and
  * exactness on real data, and forward as-of attribution edges
  * (prior purchase ignored, simultaneous counts, no-later-purchase
  * dropped).
  */
class TrendAsofSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._
  private val dayNs = 86400000000000L

  test("dailyTrend recovers an exact synthetic line with r2 = 1") {
    val tmp = java.nio.file.Files.createTempDirectory("trend").toString
    try {
      // n = 2 + 3*x for x in 0..9 → slope 3, intercept 2, r2 1
      val rows = (0 until 10).flatMap { d =>
        (0 until 2 + 3 * d).map(i => (d * 1000L + i, d * dayNs + i + 1, 1L, "a", 1.0, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$tmp/events.parquet")
      val r = Series.dailyTrend(spark, tmp).collect().head
      assert(r.getAs[Long]("n_days") == 10L)
      assert(r.getAs[Double]("slope") == 3.0)
      assert(r.getAs[Double]("intercept") == 2.0)
      assert(r.getAs[Double]("r2") == 1.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("skipgramPmi counts distance-1 AND distance-2 pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("skip").toString
    try {
      Seq.tabulate(5)(i => (i.toLong, "a b c", "en", "s", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val got = TextAnalysis.skipgramPmi(spark, tmp)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(5))).toMap
      // pairs per doc: (a,b),(b,c) at d=1 and (a,c) at d=2, ×5 docs
      val pmi = BigDecimal(math.log(3.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == Map(
        ("a", "b") -> (5L, pmi), ("b", "c") -> (5L, pmi), ("a", "c") -> (5L, pmi)))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("sketchUnion: exacts match a direct distinct; all tolerance booleans hold") {
    val got = Relational.sketchUnion(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val all = got.find(_.getString(0) == "__ALL__").get
    assert(all.getAs[Long]("n_exact") ==
      docs.select("text").distinct().count())
    assert(got.forall(_.getAs[Boolean]("within_tol")),
      "every sketch estimate inside ±5%")
    assert(got.length.toLong ==
      docs.select("source").distinct().count() + 1)
  }

  test("asofForwardAttribution: prior purchase ignored, tie attributes, open click drops") {
    val tmp = java.nio.file.Files.createTempDirectory("asoff").toString
    try {
      val us = 1000L // helper: micros→nanos factor for ts column
      Seq(
        (1L, 3 * us, 1L, "purchase", 1.0, "{}"), // before the click: ignored
        (2L, 5 * us, 1L, "click", 1.0, "{}"),    // → next purchase at 9
        (3L, 9 * us, 1L, "purchase", 1.0, "{}"),
        (4L, 9 * us, 2L, "click", 1.0, "{}"),    // simultaneous purchase: wait 0
        (5L, 9 * us, 2L, "purchase", 1.0, "{}"),
        (6L, 20 * us, 3L, "click", 1.0, "{}"))   // no later purchase: dropped
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$tmp/events.parquet")
      val got = Sessionize.asofForwardAttribution(spark, tmp)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == Map(2L -> (5L, 9L, 4L), 4L -> (9L, 9L, 0L)))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }
}
