package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q156-q160 batch: interval-union island merging
  * (containment + chained overlap, the cases point-gap logic gets
  * wrong), the modal-type tie-break, MI = 0 under exact independence,
  * weighted-median picks on a hand-computed cumulative-weight table, and
  * first-seen novelty accounting across days.
  */
class IntervalNoveltySpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val dayNs = 86400000000000L

  private def ordersFixture(rows: Seq[(Long, Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("interval").toString
    rows.map { case (c, o, d) => (c, o, java.sql.Timestamp.valueOf(s"$d 00:00:00")) }
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    tmp
  }

  private def eventsFixture(rows: Seq[(Long, Long, Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("noveltyev").toString
    rows.map { case (id, ts, u, et, p) => (id, ts, u, et, 1.0, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/events.parquet")
    tmp
  }

  private def docsFixture(rows: Seq[(Long, String, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("midocs").toString
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("intervalMerge merges chained overlap and containment into one island") {
    // cust 1: days 0, 3, 8 with span 7 → [0,7)∪[3,10)∪[8,15) chain to ONE
    // island [0,15); cust 2: days 0 and 20 → two disjoint islands. Chained
    // overlap is the hard case: a lag(fin)-based break test would split
    // the chain wherever a window starts after its PREDECESSOR's end.
    val tmp = ordersFixture(Seq(
      (1L, 1L, "1970-01-01"), (1L, 2L, "1970-01-04"), (1L, 3L, "1970-01-09"),
      (2L, 4L, "1970-01-01"), (2L, 5L, "1970-01-21")))
    try {
      val r = Relational.intervalMerge(spark, tmp)
        .collect().map(x => x.getLong(0) -> x).toMap
      assert(r(1L).getAs[Long]("n_islands") == 1L)
      assert(r(1L).getAs[Long]("covered_days") == 15L)
      assert(r(1L).getAs[Long]("longest_island_days") == 15L)
      assert(r(2L).getAs[Long]("n_islands") == 2L)
      assert(r(2L).getAs[Long]("covered_days") == 14L)
      assert(r(2L).getAs[Long]("longest_island_days") == 7L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("intervalMerge: out-of-order arrival and same-day duplicates keep one island") {
    // same-day duplicate orders and an order that lands INSIDE the merged
    // span (d=2 arrives after d=0 opened [0,7)) must not split the island
    val tmp = ordersFixture(Seq(
      (7L, 10L, "1970-01-03"), (7L, 11L, "1970-01-01"),
      (7L, 12L, "1970-01-01"), (7L, 13L, "1970-01-06")))
    try {
      val r = Relational.intervalMerge(spark, tmp).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n_islands") == 1L)
      assert(r(0).getAs[Long]("covered_days") == 12L) // [0, 12)
      assert(r(0).getAs[Long]("n_orders") == 4L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("eventTypeMode breaks count ties by lexicographic event type") {
    val tmp = eventsFixture(Seq(
      (1L, 1L, 1L, "view", "{}"), (2L, 2L, 1L, "click", "{}"),
      (3L, 3L, 1L, "view", "{}"), (4L, 4L, 1L, "click", "{}"),
      (5L, 5L, 2L, "purchase", "{}")))
    try {
      val r = Sessionize.eventTypeMode(spark, tmp)
        .collect().map(x => x.getLong(0) -> x).toMap
      // user 1: click=2, view=2 → tie → lexicographic smallest: click
      assert(r(1L).getAs[String]("modal_type") == "click")
      assert(r(1L).getAs[Long]("n_modal") == 2L)
      assert(r(1L).getAs[Long]("n_events") == 4L)
      assert(r(1L).getAs[Long]("n_types") == 2L)
      assert(r(1L).getAs[Double]("modal_share") == 0.5)
      assert(r(2L).getAs[String]("modal_type") == "purchase")
      assert(r(2L).getAs[Double]("modal_share") == 1.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("langSourceMI: exact independence gives pmi = mi_contrib = chi2 = 0") {
    // 2 langs × 2 sources, perfectly balanced 2-2-2-2 → independent
    val tmp = docsFixture(for {
      (lang, base) <- Seq(("en", 0L), ("de", 100L))
      (src, off) <- Seq(("s1", 0L), ("s2", 10L))
      i <- 0L to 1L
    } yield (base + off + i, "x y", lang, src))
    try {
      val rows = TextAnalysis.langSourceMI(spark, tmp).collect()
      assert(rows.length == 4)
      rows.foreach { r =>
        assert(r.getAs[Long]("n") == 2L)
        assert(r.getAs[Double]("expected") == 2.0)
        assert(r.getAs[Double]("pmi") == 0.0)
        assert(r.getAs[Double]("mi_contrib") == 0.0)
        assert(r.getAs[Double]("chi2") == 0.0)
      }
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("langSourceMI: a deterministic cell has positive pmi") {
    val tmp = docsFixture(Seq(
      (1L, "a", "en", "s1"), (2L, "a", "en", "s1"),
      (3L, "a", "de", "s2")))
    try {
      val r = TextAnalysis.langSourceMI(spark, tmp)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
      // P(en,s1)=2/3 > P(en)·P(s1)=4/9 → pmi = ln(3/2)
      assert(math.abs(r(("en", "s1")).getAs[Double]("pmi")
        - math.log(1.5)) < 1e-6)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("weightedMedianLength picks the doc holding the median token") {
    // source s, sorted by chars v: ("a": v=1, wt=1, cum=1), ("bb b": v=4,
    // wt=2, cum=3), ("cc dd ee": v=8, wt=3, cum=6); W=6.
    // p25: first cum·4 ≥ 6 → v=4; median: first cum·2 ≥ 6 → v=4 (cum=3
    // exactly hits the lower-median boundary); p75: first cum·4 ≥ 18 → v=8.
    val tmp = docsFixture(Seq(
      (1L, "a", "en", "s"), (2L, "bb b", "en", "s"),
      (3L, "cc dd ee", "en", "s")))
    try {
      val r = PipelinePrep.weightedMedianLength(spark, tmp).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n_docs") == 3L)
      assert(r(0).getAs[Long]("n_tokens") == 6L)
      assert(r(0).getAs[Long]("w_p25") == 4L)
      assert(r(0).getAs[Long]("w_median") == 4L)
      assert(r(0).getAs[Long]("w_p75") == 8L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("noveltyCurve counts first-seen payloads per day and accumulates") {
    val tmp = eventsFixture(Seq(
      (1L, 0L, 1L, "e", "p1"), (2L, 1L, 1L, "e", "p2"),
      (3L, dayNs, 1L, "e", "p1"), (4L, dayNs + 1, 1L, "e", "p3"),
      (5L, 2 * dayNs, 1L, "e", "p1"), (6L, 2 * dayNs + 1, 1L, "e", "p2")))
    try {
      val r = Series.noveltyCurve(spark, tmp)
        .collect().map(x => x.getLong(0) -> x).toMap
      assert(r(0L).getAs[Long]("n_novel") == 2L)
      assert(r(0L).getAs[Long]("cum_distinct") == 2L)
      assert(r(1L).getAs[Long]("n_novel") == 1L) // p3 new, p1 seen
      assert(r(1L).getAs[Long]("n_distinct") == 2L)
      assert(r(1L).getAs[Long]("cum_distinct") == 3L)
      assert(r(2L).getAs[Long]("n_novel") == 0L)
      assert(r(2L).getAs[Long]("cum_distinct") == 3L)
      assert(r(2L).getAs[Double]("novelty_rate") == 0.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }
}
