package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9 extended / north-star):
  * watermarked tumbling-window aggregation, native `session_window`
  * sessionization, and a custom-state sessionizer via
  * `flatMapGroupsWithState` — the three canonical streaming shapes.
  *
  * Every transform takes the event stream as a DataFrame/Dataset argument
  * (MemoryStream in tests, `readEventStream` in production) so the logic
  * is identical for batch and streaming inputs — same plan Catalyst sees
  * either way, which is what keeps the batch twins in graft.ops.Sessionize
  * oracle-comparable.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start_sec: Long,
    session_end_sec: Long, n_events: Long, total_value: Double)

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over an events directory (parquet, micros
    * timestamps). `maxFilesPerTrigger` bounds per-batch work so a backlog
    * replay doesn't build one giant micro-batch.
    */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Tumbling 1-hour counts per event type with a 2-hour watermark: the
    * streaming twin of Sessionize.hourlyEventCounts. State is bounded by
    * (watermark horizon × distinct event types).
    */
  def hourlyCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
  }

  /** Native session-window sessionization (30-minute gap): Spark merges
    * overlapping per-event windows into sessions; the watermark closes a
    * session once event time passes gap + lateness, so state can't grow
    * unboundedly.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("session_value"))
      .select($"user_id", $"sw.start".as("session_start"), $"sw.end".as("session_end"),
        $"n_events", $"session_value")
  }

  /** Stream-stream join: clicks joined to purchases of the same user
    * within [click, click + 2h] — both sides watermarked so Spark can
    * bound the join state buffers (without the time-range condition a
    * stream-stream join would buffer forever).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    import clicks.sparkSession.implicits._
    val c = clicks.select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.select($"user_id".as("p_user"), $"ts".as("purchase_ts"),
        $"value".as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    c.join(p,
      $"user_id" === $"p_user" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 2 HOURS"))
      .select($"click_id", $"user_id", $"click_ts", $"purchase_ts", $"purchase_value")
  }

  /** Streaming exact dedup: first occurrence of each key wins, state
    * bounded by the watermark horizon (`dropDuplicatesWithinWatermark`
    * evicts seen-keys once they age out — the only way streaming dedup
    * state survives an unbounded stream). On a batch frame the same
    * function IS its batch twin (exact `dropDuplicates`, no horizon) —
    * the DocStreams.dedupByContent backfill contract, audited by q272.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String] = Seq("event_id")): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Event-pipeline accounting audit (q272): the q268 pattern on the
    * EVENTS side — every deployed streaming transform ([[hourlyCounts]],
    * [[sessionWindows]], [[dedupStream]], [[clickPurchaseJoin]]) run on
    * the batch events frame (identical plans by construction — each
    * takes its input as an argument), rolled up into row-accounting
    * values the DuckDB oracle replays independently: tumbling cells by
    * epoch-hour flooring, native `session_window` sessions against the
    * lag/gap-island derivation (two DIFFERENT constructions of the same
    * semantics — a disagreement is an engine bug, not drift), the
    * stream-stream join's pair count by the same time-range predicate,
    * and conservation laws (every event lands in exactly one hourly
    * cell and one session) asserted literally.
    *
    * Scale: each audited transform keeps its production shape (keyed
    * windows/aggregates); the audit adds only single-row rollups.
    */
  def streamAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.ops.Tables.eventsNs(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val nRaw = ev.agg(count(lit(1)).as("n_raw"))
    val hAgg = hourlyCounts(ev).agg(
      count(lit(1)).as("n_hourly_cells"),
      coalesce(sum($"n"), lit(0L)).as("n_hourly_counted"))
    val sAgg = sessionWindows(ev).agg(
      count(lit(1)).as("n_sessions"),
      coalesce(sum($"n_events"), lit(0L)).as("n_sessioned"))
    val dAgg = dedupStream(ev).agg(count(lit(1)).as("n_dedup"))
    val pAgg = clickPurchaseJoin(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"))
      .agg(count(lit(1)).as("n_click_purchase_pairs"))
    nRaw.crossJoin(hAgg).crossJoin(sAgg).crossJoin(dAgg).crossJoin(pAgg)
      .select($"n_raw", $"n_hourly_cells", $"n_hourly_counted",
        $"n_sessions", $"n_sessioned", $"n_dedup",
        $"n_click_purchase_pairs",
        ($"n_hourly_counted" === $"n_raw" &&
          $"n_sessioned" === $"n_raw" &&
          $"n_sessions" <= $"n_raw" && $"n_dedup" <= $"n_raw")
          .as("conservation_law"))
  }

  /** Custom-state sessionizer: `flatMapGroupsWithState` with event-time
    * timeout. Emits a SessionOut each time a 30-minute gap closes a
    * session — the shape to reach for when session semantics outgrow
    * `session_window` (e.g. value-dependent gaps, per-session caps).
    *
    * State per user is one open session (constant size); the event-time
    * timeout fires when the watermark passes last-event + gap, so closed
    * sessions are emitted even for users who go silent.
    */
  def sessionizeWithState(events: Dataset[Event],
      gapSec: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fold(user: Long, incoming: Iterator[Event],
        state: GroupState[(Long, Long, Long, Double)]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val (s, e, n, v) = state.get
        state.remove()
        return Iterator(SessionOut(user, s, e, n, math.rint(v * 100) / 100))
      }
      val sorted = incoming.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_id))
      var out = List.empty[SessionOut]
      var open = state.getOption
      sorted.foreach { ev =>
        val sec = Math.floorDiv(ev.ts.getTime, 1000L)
        open = open match {
          case Some((s, e, n, v)) if sec - e <= gapSec =>
            Some((s, sec max e, n + 1, v + ev.value))
          case Some((s, e, n, v)) =>
            out ::= SessionOut(user, s, e, n, math.rint(v * 100) / 100)
            Some((sec, sec, 1L, ev.value))
          case None => Some((sec, sec, 1L, ev.value))
        }
      }
      open.foreach { o =>
        state.update(o)
        state.setTimeoutTimestamp(o._2 * 1000L + gapSec * 1000L)
      }
      out.reverseIterator
    }

    // Event-time timeout requires a watermark on the input stream (a
    // no-op for batch Datasets).
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "1 hour").as[Event]
      else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
