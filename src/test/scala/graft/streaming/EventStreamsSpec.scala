package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams._

/** Drives the streaming ops end-to-end with MemoryStream micro-batches,
  * including late data and watermark-driven session closing.
  */
class EventStreamsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:$sec%02d")

  private def ev(id: Long, min: Int, user: Long, typ: String = "click",
      value: Double = 1.0): Event = Event(id, ts(min), user, typ, value)

  test("hourlyCounts aggregates tumbling windows across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 10, 2, "view", 2.5))
      q.processAllAvailable()
      in.addData(ev(4, 65, 1, "click", 3.0)) // next hour's window
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("window_start", "event_type", "n", "total_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .groupBy(t => (t._1, t._2)).map(_._2.last).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 2.0)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 2.5)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionWindows merges events within gap and splits across it") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionWindows(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      // user 1: two events 10 min apart (one session), then one 50 min
      // later (new session); user 2: single event
      in.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 60, 1), ev(4, 5, 2, value = 9.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 2L, 2.0), (1L, 1L, 1.0), (2L, 1L, 9.0)))
    } finally q.stop()
  }

  test("sessionizeWithState emits closed sessions as the watermark advances") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionizeWithState(in.toDS())
      .writeStream.format("memory").queryName("statesessions")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 7, value = 1.5), ev(2, 10, 7, value = 2.0))
      q.processAllAvailable()
      // 2 hours later: past watermark delay (1h) + gap (30m), so the
      // first session must close — either by gap-break or timeout
      in.addData(ev(3, 150, 7, value = 4.0))
      q.processAllAvailable()
      in.addData(ev(4, 400, 8)) // push watermark far ahead, times out session 2
      q.processAllAvailable()
      val rows = spark.table("statesessions")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((7L, 2L, 3.5)), s"got $rows")
      assert(rows.contains((7L, 1L, 4.0)), s"got $rows")
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with in-window purchases only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 0, 1, "click"), ev(2, 0, 2, "click"))
      purchases.addData(
        ev(10, 30, 1, "purchase", 5.0),   // in window for user 1
        ev(11, 300, 1, "purchase", 7.0),  // 5h later: out of window
        ev(12, 30, 3, "purchase", 9.0))   // other user
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
      assert(rows == Set((1L, 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream drops re-delivered events within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 0, 1), ev(2, 5, 1))
      q.processAllAvailable()
      in.addData(ev(1, 0, 1), ev(3, 10, 2)) // event 1 re-delivered
      q.processAllAvailable()
      val ids = spark.table("dedupstream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("readEventStream: parquet file source streams micro-batches end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    try {
      // first file lands before the stream starts, second mid-stream
      spark.createDataset(Seq(ev(1, 0, 1), ev(2, 10, 1)))
        .write.parquet(s"$dir/batch1")
      val src = readEventStream(spark, s"$dir/batch1")
      val q = hourlyCounts(src)
        .writeStream.format("memory").queryName("filestream")
        .outputMode(OutputMode.Update).start()
      try {
        q.processAllAvailable()
        val n = spark.table("filestream").count()
        assert(n > 0)
      } finally q.stop()
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("streaming sessionWindows agrees with the batch gap-sessionizer shape") {
    // same events through the batch Dataset path of sessionizeWithState
    val events = Seq(ev(1, 0, 1), ev(2, 10, 1), ev(3, 60, 1), ev(4, 5, 2, value = 9.0))
    val out = sessionizeWithState(spark.createDataset(events))
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    // batch emits only *closed* sessions (open ones stay in state);
    // user 1's first session closes at the 60-min gap break
    assert(out == Set((1L, 2L, 2.0)))
  }
}
