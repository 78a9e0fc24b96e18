package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q121-q126 batch: PII detector hits on planted
  * fixtures, rolling-active window edges (gap days, dedup), the
  * changepoint split statistic on a hand-built step series, the EWMA
  * recurrence against a driver-side fold, MAD robustness against a
  * planted heavy outlier, and PSI ≈ 0 on identical halves.
  */
class SeriesOpsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def eventsFixture(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("seriesops").toString
    // ts written as LongType epoch-nanos — the fixture/replica encoding
    // Tables.eventsNs passes through untouched
    rows.map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/events.parquet")
    tmp
  }
  private val dayNs = 86400000000000L

  test("piiScrub detects planted email/ipv4/terms and counts redacted chars") {
    val tmp = java.nio.file.Files.createTempDirectory("pii").toString
    try {
      Seq(
        (1L, "contact me at bob@example.com for the key", "en", "s1", 0L),
        (2L, "server 10.0.0.1 holds the customer table", "en", "s1", 0L),
        (3L, "value value key", "en", "s2", 0L),
        (4L, "nothing sensitive here", "en", "s2", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val r = TextAnalysis.piiScrub(spark, tmp)
        .collect().map(x => x.getString(0) -> x).toMap
      assert(r("s1").getAs[Long]("n_email_docs") == 1L)
      assert(r("s1").getAs[Long]("n_ipv4_docs") == 1L)
      assert(r("s1").getAs[Long]("n_term_docs") == 2L) // key + customer
      assert(r("s2").getAs[Long]("n_email_docs") == 0L)
      assert(r("s2").getAs[Long]("n_term_docs") == 1L)
      assert(r("s2").getAs[Long]("n_term_matches") == 3L)
      // "value"(5)→"[X]"(3): delta 2 ×2; "key"(3)→3: delta 0
      assert(r("s2").getAs[Long]("n_redacted_chars") == 4L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("rollingActive: trailing window spans gaps, dedups users, zero-fills") {
    // user 1 active day 0; user 2 active day 0 (twice) and day 10
    val tmp = eventsFixture(Seq(
      (1L, 1L, 1L, "click", 1.0),
      (2L, 2L, 2L, "click", 1.0),
      (3L, 3L, 2L, "view", 1.0),
      (4L, 10 * dayNs + 1, 2L, "click", 1.0)))
    try {
      val got = Series.rollingActive(spark, tmp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == (0L to 10L).toSet) // full grid, gap days kept
      assert(got(0L) == 2L) // both users, duplicate event deduped
      assert(got(6L) == 2L) // day 0 still inside the 7-day trail
      assert(got(7L) == 0L) // window [1..7] empty
      assert(got(10L) == 1L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("changepoint finds the step in a level-shifted series") {
    // type "a": days 0-3 one event/day, days 4-7 three/day → split at day 3
    val rows = (0 to 3).map(d => (d.toLong, d.toLong * dayNs + 1, 1L, "a", 1.0)) ++
      (4 to 7).flatMap(d => (0 until 3).map(i =>
        (100L + d * 3 + i, d.toLong * dayNs + i + 1, 1L, "a", 1.0)))
    val tmp = eventsFixture(rows)
    try {
      val r = Series.changepoint(spark, tmp).collect()
      assert(r.length == 1)
      assert(r.head.getAs[Long]("split_day") == 3L)
      assert(r.head.getAs[Double]("split_stat") == 2.0) // |1 − 3|
      assert(r.head.getAs[Long]("n_days") == 8L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("ewmaDaily equals the driver-side recurrence on real data") {
    val daily = Tables.eventsNs(spark, sf)
      .select($"event_type", expr(s"ts div $dayNs").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      var prev: Option[Double] = None
      rows.sortBy(_._2).toSeq.map { case (_, day, n) =>
        val e = prev match {
          case None => n.toDouble
          case Some(p) => 0.8 * p + 0.2 * n
        }
        prev = Some(e)
        (et, day) -> BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      }
    }.toMap
    val got = Series.ewmaDaily(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} != $v")
  }

  test("madOutliers: one planted extreme flags exactly itself; z-score twin would drag") {
    // 9 values at 10±2 plus one at 1000: median/MAD ignore the spike
    val vals = Seq(8.0, 9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 11.5, 12.0, 1000.0)
    val tmp = eventsFixture(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong + 1, 1L, "a", v)
    })
    try {
      val r = Series.madOutliers(spark, tmp).collect().head
      assert(r.getAs[Long]("n") == 10L)
      assert(r.getAs[Double]("med") == 10.25)
      assert(r.getAs[Long]("n_outliers") == 1L)
      assert(r.getAs[Double]("outlier_frac") == 0.1)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("psiDrift ≈ 0 when both halves share a distribution, > 0 when shifted") {
    // type "flat": same values day 0 and day 9; type "shift": low→high
    val flat = (0 until 20).map(i =>
      (i.toLong, (if (i < 10) 0L else 9L) * dayNs + i + 1, 1L, "flat", (i % 10) * 10.0))
    val shift = (0 until 20).map(i =>
      (100L + i, (if (i < 10) 0L else 9L) * dayNs + i + 1, 1L, "shift",
        if (i < 10) 10.0 else 90.0))
    val tmp = eventsFixture(flat ++ shift)
    try {
      val r = Series.psiDrift(spark, tmp)
        .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
      assert(math.abs(r("flat")) < 1e-9)
      assert(r("shift") > 1.0, s"shifted PSI should be large: ${r("shift")}")
      val halves = Series.psiDrift(spark, tmp).collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
      assert(halves == Set(("flat", 10L, 10L), ("shift", 10L, 10L)))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("ksDrift: identical halves score 0; disjoint supports score 1; bounded in [0,1]") {
    // flat: identical value multisets in both halves → KS 0;
    // jump: first half values in [0,1), second in [10,11) → KS 1
    val flat = (0 until 20).map(i =>
      (i.toLong, i * dayNs, 1L, "flat", (i % 5).toDouble))
    val jump = (0 until 20).map(i =>
      (100L + i, i * dayNs, 1L, "jump",
        if (i < 10) (i % 5).toDouble else 10.0 + (i % 5)))
    val tmp = eventsFixture(flat ++ jump)
    try {
      val r = Series.ksDrift(spark, tmp).collect()
        .map(x => x.getString(0) -> x.getDouble(3)).toMap
      assert(r("flat") == 0.0, s"flat KS: ${r("flat")}")
      assert(r("jump") == 1.0, s"jump KS: ${r("jump")}")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
    val real = Series.ksDrift(spark, sf).collect()
    for (x <- real) {
      val ks = x.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0)
      assert(x.getLong(1) > 0 && x.getLong(2) > 0)
    }
  }
}
