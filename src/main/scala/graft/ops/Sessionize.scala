package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: gap-based
  * sessionization (the batch shape of `session_window`) and tumbling-window
  * aggregation. The streaming variants live in graft.streaming; these
  * batch forms share the semantics and the oracle.
  */
object Sessionize {

  /** Shared adaptive loader (Tables.eventsNs): `ts` is epoch-nanos BIGINT
    * regardless of the parquet physical encoding, so `ts div 1e9` stays
    * in integer arithmetic — 2024 epoch-nanos (~1.7e18) exceed double's
    * 53-bit mantissa, so a `/`-then-cast would corrupt seconds.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsNs(spark, dir)

  /** Gap-based sessionization (30-minute inactivity gap): session id =
    * running count of gap-breaks per user. One shuffle on user_id; the
    * window functions and the final aggregation share that partitioning so
    * Catalyst plans a single exchange.
    */
  def userSessions(spark: SparkSession, dir: String, gapSec: Long = 1800L): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val sessions = events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000000000").as("sec"), $"value")
      .withColumn("prev_sec", lag($"sec", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"sec") - min($"sec")).as("span_sec"),
        round(sum($"value"), 2).as("session_value"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        round(avg($"n_events"), 4).as("avg_events_per_session"),
        max($"span_sec").as("max_span_sec"),
        round(sum($"session_value"), 2).as("total_value"))
  }

  /** As-of join — the classic time-series operator Spark has no native
    * plan for: each click event attributed to the user's most recent
    * prior-or-simultaneous purchase. Implemented as the scalable
    * composition (SURVEY.md §2.12 custom-operator preference (a)):
    * union both sides tagged, ONE shuffle on user_id, and a running
    * `last(purchase_ts)` window — no per-row range probe, no broadcast
    * of either side, works at any key cardinality. The DuckDB oracle is
    * the engine's native ASOF JOIN, so two entirely different
    * implementation strategies must agree row-for-row.
    */
  def asofPurchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("us"), $"event_type")
    val clicks = base.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"us", lit(1).as("is_click"))
    val purchases = base.filter($"event_type" === "purchase")
      .select(lit(-1L).as("event_id"), $"user_id", $"us", lit(0).as("is_click"))
    // purchases sort before clicks at equal timestamps => "prior or
    // simultaneous" matches ASOF's >= semantics
    val w = Window.partitionBy($"user_id").orderBy($"us", $"is_click")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("purchase_us",
        last(when($"is_click" === 0, $"us"), ignoreNulls = true).over(w))
      .filter($"is_click" === 1 && $"purchase_us".isNotNull)
      .select($"event_id", $"user_id", $"us".as("click_us"), $"purchase_us",
        ($"us" - $"purchase_us").as("gap_us"))
  }

  /** Forward as-of join (q139): each click attributed to the user's
    * EARLIEST at-or-after purchase — [[asofPurchaseAttribution]]'s time
    * mirror ("how long until conversion" vs "what preceded this"). Same
    * scalable composition: union both sides tagged, ONE user-keyed
    * shuffle, and a `min(purchase time)` over the [current, ∞) frame —
    * min ignores nulls and is frame-order-insensitive, so both engines
    * state the window identically; clicks sort before simultaneous
    * purchases so "at-or-after" includes ties.
    */
  def asofForwardAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("us"), $"event_type")
    val clicks = base.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"us", lit(1).as("is_click"))
    val purchases = base.filter($"event_type" === "purchase")
      .select(lit(-1L).as("event_id"), $"user_id", $"us", lit(0).as("is_click"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"is_click".desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("purchase_us", min(when($"is_click" === 0, $"us")).over(w))
      .filter($"is_click" === 1 && $"purchase_us".isNotNull)
      .select($"event_id", $"user_id", $"us".as("click_us"), $"purchase_us",
        ($"purchase_us" - $"us").as("wait_us"))
  }

  /** Semi-structured extraction: event props is a JSON string column;
    * `get_json_object` pulls `$.k` in the scan projection (codegen'd
    * Jayway path, no UDF) and the rollup aggregates it per event type.
    */
  def jsonPropsRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
  }

  /** Banded range join — the scalable shape for interval predicates: a
    * raw `p.us BETWEEN c.us AND c.us + W` join is a nested loop in Spark;
    * bucketing both sides into W-wide bins turns it into an equi-join on
    * (user, bin) — each click explodes to its bin and the next, so every
    * qualifying pair lands in exactly one bin match, then the exact
    * interval filter runs on the tiny joined set. Conversion attribution:
    * purchases within 2 hours after a click.
    */
  def rangeJoinConversions(spark: SparkSession, dir: String,
      windowUs: Long = 7200000000L): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("us"), $"event_type")
    val clicks = base.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"us".as("click_us"))
    val purchases = base.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"us".as("purchase_us"))
    clicks
      .withColumn("join_bin", explode(array(
        expr(s"click_us div $windowUs"), expr(s"click_us div $windowUs + 1"))))
      .join(purchases.withColumn("p_bin", expr(s"purchase_us div $windowUs")),
        $"user_id" === $"p_user" && $"join_bin" === $"p_bin")
      .filter($"purchase_us" >= $"click_us" && $"purchase_us" <= $"click_us" + windowUs)
      .select($"click_id", $"user_id", $"click_us", $"purchase_us",
        ($"purchase_us" - $"click_us").as("lag_us"))
  }

  /** Native `session_window` in batch (30-minute gap): Spark merges
    * per-event windows into [min_ts, max_ts + gap) sessions — the exact
    * operator the streaming module uses, verified here against a DuckDB
    * oracle that derives the same sessions with lag/cumsum over epoch
    * micros (integer arithmetic end to end, no float drift).
    */
  def sessionWindowAgg(spark: SparkSession, dir: String,
      gap: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy($"user_id", session_window($"ts", gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("session_value"))
      .select($"user_id",
        unix_micros($"sw.start").as("start_us"),
        unix_micros($"sw.end").as("end_us"),
        $"n_events", $"session_value")
  }

  /** Tumbling 1-hour windows per event type: the batch twin of a
    * Structured Streaming `window($"ts", "1 hour")` aggregation.
    */
  def hourlyEventCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"total_value")
  }

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * stage N only with an event AT OR AFTER their stage-N−1 entry time.
    * Each stage is a filtered scan + per-user min joined to the
    * previous-stage table — no window over the raw events, no self-join
    * of the full table; each ladder step shuffles one row per surviving
    * user. No broadcast hint: the stage tables are one row PER USER and
    * grow with the stream, so the join strategy is left to AQE (a forced
    * broadcast would OOM exactly at the scale this operator targets).
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
    val t1 = base.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val t2 = base.filter($"event_type" === "click")
      .join(t1, "user_id").filter($"us" >= $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val t3 = base.filter($"event_type" === "purchase")
      .join(t2, "user_id").filter($"us" >= $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    def stageRow(order: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(order.toLong).as("stage"), lit(name).as("event_type"), $"n_users")
    stageRow(1, "view", t1)
      .unionByName(stageRow(2, "click", t2))
      .unionByName(stageRow(3, "purchase", t3))
  }

  /** Weekly retention cohorts: cohort = epoch-week of the user's first
    * event, activity offset = weeks since that cohort week; cell value =
    * distinct active users. Integer week arithmetic end to end, so the
    * oracle compare is exact. The cohort table is one row per user —
    * unbounded — so the join back is hint-free (AQE broadcasts it only
    * while it actually fits).
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekly = events(spark, dir)
      .select($"user_id", expr("ts div 1000000000 div 604800").as("week"))
    val cohorts = weekly.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weekly
      .join(cohorts, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
  }

  /** Per-type value outliers: events more than 3 sample standard
    * deviations from their type's mean. Moments come from one tiny
    * (type, n, Σv, Σv²) aggregate broadcast back over a second scan —
    * the two-pass shape that avoids a per-type window over the full
    * corpus. Explicit-sum std (not stddev_samp) so the oracle computes
    * the identical expression.
    */
  def valueOutliers(spark: SparkSession, dir: String, zThreshold: Double = 3.0): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"event_id", $"event_type", $"value")
    val moments = base.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s1"),
        sum($"value" * $"value").as("s2"))
      .filter($"n" >= 2)
      .select($"event_type", ($"s1" / $"n").as("mean"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("std"))
    base
      .join(broadcast(moments), "event_type")
      .filter($"std" > 0 && abs($"value" - $"mean") > lit(zThreshold) * $"std")
      .select($"event_id", $"event_type", round($"value", 2).as("value"),
        round(($"value" - $"mean") / $"std", 4).as("z"))
  }

  /** Per-user burstiness — the bot/scraper rate-anomaly signal: the
    * peak-to-mean ratio of a user's hourly event counts (an organic
    * user's peak hour sits near their mean; a burst-scripted one spikes).
    * Hour buckets are integer division on the epoch-nano timestamp, so
    * both engines bucket identically with no timezone/calendar surface.
    *
    * Scale: (user, hour) counts map-side combine off the scan, then a
    * user-keyed rollup — both shuffles on aggregated rows. Nothing is
    * corpus-sized downstream of the first aggregate and no per-user
    * window is involved.
    */
  def userBurstiness(spark: SparkSession, dir: String,
      ratioThreshold: Double = 3.0): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      // FLOOR division (Math.floorDiv semantics), matching DuckDB's `//`:
      // Spark's `div` truncates toward zero, which would bucket a
      // pre-1970 timestamp one hour off the oracle
      .select($"user_id",
        (expr("ts div 3600000000000") +
          when(expr("ts % 3600000000000") < 0, -1).otherwise(0)).as("hour"))
      .groupBy($"user_id", $"hour").agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(
        sum($"c").as("n_events"),
        count(lit(1)).as("n_hours"),
        max($"c").as("max_hourly"))
      .select($"user_id", $"n_events", $"n_hours", $"max_hourly",
        round(($"max_hourly" * $"n_hours").cast("double") / $"n_events", 6)
          .as("peak_to_mean"))
      .withColumn("bursty", $"peak_to_mean" >= ratioThreshold)
  }

  /** Gap-filled daily series per user (q112): the forward-fill /
    * interpolation pass every time-series feature pipeline runs before
    * training on regular grids. Semantically: build each user's daily
    * grid from first to last active day, carry the last observed daily
    * value forward across inactive days, and report per user the span,
    * active/filled day counts and the sum of the filled series.
    *
    * The plan never materializes the grid: a carried value v persists
    * for (next_active_day - day) grid days, so the filled-series sum is
    * `sum(v * run_length)` over ACTIVE days only — one (user, day)
    * aggregate, one user-partitioned window, no sequence-explode and no
    * grid join. That is the difference between shuffling O(active days)
    * and O(span × users) rows: a 100-TB corpus with years-long sparse
    * users pays for its events, not its calendar. (The DuckDB oracle
    * computes the same numbers the naive way — generate_series grid,
    * left join, IGNORE NULLS window — so the two derivations check each
    * other.)
    */
  def eventGapfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      // events are 2024 epoch-nanos (positive), so truncating `div` and
      // floor-division agree; day = nanos // 86400e9 on both engines
      .select($"user_id", expr("ts div 86400000000000").as("day"), $"value")
      .groupBy($"user_id", $"day").agg(sum($"value").as("v"))
    val byUser = Window.partitionBy($"user_id")
    val ordered = byUser.orderBy($"day")
    daily
      .withColumn("hi", max($"day").over(byUser))
      .withColumn("run", coalesce(lead($"day", 1).over(ordered), $"hi" + 1) - $"day")
      .groupBy($"user_id")
      .agg((max($"day") - min($"day") + 1).as("span_days"),
        count(lit(1)).as("active_days"),
        (max($"day") - min($"day") + 1 - count(lit(1))).as("filled_days"),
        round(sum($"v" * $"run"), 4).as("filled_sum"))
  }

  /** Time-decayed engagement score per user (q113): each event
    * contributes `value * exp(-age/tau)` with age measured in days back
    * from the newest event in the table and tau = `tauDays`. The
    * standard recency-weighted activity feature — unlike a windowed
    * count it needs no cutoff choice, and unlike an EWMA recurrence it
    * is order-independent, so it is a plain one-shuffle aggregate.
    *
    * The reference instant is a one-row aggregate broadcast into the
    * scan projection (no driver collect, no second pass); everything
    * after it is map-side-combined `sum`/`count` per user.
    */
  def decayedEngagement(spark: SparkSession, dir: String,
      tauDays: Double = 7.0): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"user_id", expr("ts div 1000000000").as("sec"), $"value")
    val t0 = ev.agg(max($"sec").as("t0"))
    ev.crossJoin(broadcast(t0))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        // identical double dataflow to the oracle: (t0-sec)/86400.0,
        // then /tau, then exp — negation is exact, so the unary minus
        // can sit anywhere
        round(sum($"value" *
          exp(-(($"t0" - $"sec") / lit(86400.0)) / lit(tauDays))), 4).as("score"))
  }

  /** User-journey path mining (q116): the `k` most common event-type
    * trigram paths across all users, paths read off per-user
    * time-ordered streams. Two `lead`s over one user-partitioned window
    * (no per-user collect_list, whose single array would concentrate a
    * power user's whole history in one task), then a count and a
    * deterministic top-k — ties broken by path text so the limit is
    * stable across engines and runs.
    */
  def eventPaths(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e3".isNotNull)
      .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path").limit(k)
  }

  /** Daily-count autocorrelation per event type (q117): lag-1 and lag-7
    * Pearson autocorrelation of the daily event-count series — the
    * cheap screen for trend stickiness and weekly seasonality before
    * anyone fits a forecast. Lags are validated against the REAL day
    * distance (a missing day nulls the pair out) rather than row
    * offsets, so sparse series don't smear across gaps. Everything
    * after the (type, day) count is per-type window + aggregate on a
    * series bounded by the calendar, not the corpus.
    */
  def dailyAutocorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select($"event_type", expr("ts div 86400000000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("n1",
        when(lag($"day", 1).over(w) === $"day" - 1, lag($"n", 1).over(w)))
      .withColumn("n7",
        when(lag($"day", 7).over(w) === $"day" - 7, lag($"n", 7).over(w)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        round(corr($"n", $"n1"), 4).as("autocorr_1"),
        round(corr($"n", $"n7"), 4).as("autocorr_7"))
  }

  /** Day-of-week seasonality profile per event type (q118): mean/std of
    * daily counts per weekday slot plus the peak-slot flag. The weekday
    * is `day_index % 7` — pure integer arithmetic, no calendar or
    * timezone surface for the two engines to disagree on. Count rows
    * are calendar-bounded; the profile is a 7-row-per-type aggregate.
    */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select($"event_type", expr("ts div 86400000000000").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy($"event_type")
    daily
      .withColumn("dow", pmod($"day", lit(7L)))
      .groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("n_days"),
        round(avg($"n"), 6).as("avg_n"),
        round(stddev_samp($"n"), 6).as("std_n"))
      .withColumn("peak", $"avg_n" === max($"avg_n").over(byType))
  }

  /** Exact per-user modal event type (q157): the most frequent type with
    * a fully deterministic tie-break (highest count, then lexicographic
    * smallest type), plus its share of the user's events. Mode is the
    * one "simple" statistic SQL engines have no builtin for — the
    * composition is a map-side-combined (user, type) count followed by a
    * row_number window over each user's TYPE rows (bounded by the
    * event-type vocabulary, not the event stream), so the heavy input
    * shrinks before the window shuffle touches it.
    */
  def eventTypeMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val pick = Window.partitionBy($"user_id")
      .orderBy($"cnt".desc, $"event_type")
    counts
      .withColumn("rn", row_number().over(pick))
      .withColumn("n_events", sum($"cnt").over(Window.partitionBy($"user_id")))
      .withColumn("n_types", count(lit(1)).over(Window.partitionBy($"user_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("modal_type"),
        $"cnt".as("n_modal"), $"n_events", $"n_types",
        round($"cnt".cast("double") / $"n_events", 6).as("modal_share"))
  }

  /** Audience overlap between event types (q165): exact Jaccard and
    * overlap coefficient of the USER SETS behind each type pair — "do
    * the people who purchase also search?" — the behavioral-cohort set
    * similarity that q16 computes for documents, applied to audiences.
    *
    * Scale: the corpus-sized work is ONE (type, user) distinct with
    * map-side partial dedup; the pair join keys on user_id (uniform
    * fan-out bounded by the type VOCABULARY per user, ≤ |types|² pair
    * rows per user), and the per-type sizes arrive by broadcast. Output
    * is |types|² rows — constant at any corpus size.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ut = events(spark, dir).select($"event_type", $"user_id").distinct()
    val sizes = ut.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val pairs = ut.select($"event_type".as("type_a"), $"user_id")
      .join(ut.select($"event_type".as("type_b"), $"user_id"), Seq("user_id"))
      .filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select($"event_type".as("type_a"), $"n".as("na"))),
        Seq("type_a"))
      .join(broadcast(sizes.select($"event_type".as("type_b"), $"n".as("nb"))),
        Seq("type_b"))
      .select($"type_a", $"type_b", $"na", $"nb", $"n_both",
        round($"n_both".cast("double") / ($"na" + $"nb" - $"n_both"), 6)
          .as("jaccard"),
        round($"n_both".cast("double") / least($"na", $"nb"), 6)
          .as("overlap_coef"))
  }

  /** Funnel step latency (q169): exact p25/median/p75 and mean of the
    * per-user seconds between consecutive funnel stages, over the SAME
    * earliest-qualifying timestamps q60 counts (t1 ≤ t2 ≤ t3 — the
    * definitions cannot drift because the stage joins are shared
    * verbatim). Quartiles are rank-SELECTED order statistics — rank
    * ⌈n·q/100⌉ by integer arithmetic over integer-microsecond latencies
    * — so both engines pick identical rows; only the mean carries FP.
    *
    * Scale: the stage tables are per-user aggregates (the q60 shape);
    * each step's rank window sorts users-with-that-step once. Output is
    * two rows.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
    val t1 = base.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val t2 = base.filter($"event_type" === "click")
      .join(t1, "user_id").filter($"us" >= $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"), first($"t1").as("t1"))
    val t3 = base.filter($"event_type" === "purchase")
      .join(t2.select($"user_id", $"t2"), "user_id").filter($"us" >= $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"), first($"t2").as("t2"))
    val lats = t2.select($"user_id", lit("view_to_click").as("step"),
        ($"t2" - $"t1").as("lat_us"))
      .unionByName(t3.select($"user_id", lit("click_to_purchase").as("step"),
        ($"t3" - $"t2").as("lat_us")))
    val byLat = Window.partitionBy($"step").orderBy($"lat_us", $"user_id")
    lats
      .withColumn("rn", row_number().over(byLat).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"step")))
      .groupBy($"step")
      .agg(max($"n").as("n_users"),
        round(min(when($"rn" === expr("(n * 25 + 99) div 100"), $"lat_us"))
          / 1000000.0, 3).as("p25_sec"),
        round(min(when($"rn" === expr("(n * 50 + 99) div 100"), $"lat_us"))
          / 1000000.0, 3).as("median_sec"),
        round(min(when($"rn" === expr("(n * 75 + 99) div 100"), $"lat_us"))
          / 1000000.0, 3).as("p75_sec"),
        round(avg($"lat_us") / 1000000.0, 4).as("mean_sec"))
  }

  /** Kaplan–Meier user-lifetime survival curve (q178): per user the
    * observed lifetime is last-event − first-event in whole days; a user
    * is CHURNED if their last event precedes the corpus end by more than
    * `censorDays` (they had time to come back and didn't) and CENSORED
    * otherwise (the observation window ended first — the whole point of
    * K-M is that those users still count as at-risk up to their cutoff
    * instead of being dropped or miscounted as churned). Output per
    * distinct lifetime t: the at-risk count n_t, churn/censor counts,
    * and the product-limit estimate S(t) = Π_{s≤t}(1 − d_s/n_s).
    *
    * Scale: one per-user aggregate (map-side combined), a one-row
    * broadcast of the corpus end, then everything operates on the
    * lifetime-bounded distinct-days table (≤ observation window in
    * days), where the global cumulative windows are O(days), not
    * O(users). The zero-survival tail (n_s = d_s) is handled explicitly:
    * Spark's ln(0) is NULL while DuckDB's is -inf, so the estimate is
    * pinned to 0.0 from the first exhausted risk set onward rather than
    * fed through the log.
    */
  def kaplanMeier(spark: SparkSession, dir: String,
      censorDays: Int = 1): DataFrame = {
    import spark.implicits._
    val dayNs = 86400000000000L
    val perUser = events(spark, dir)
      .groupBy($"user_id")
      .agg(min($"ts").as("first_ts"), max($"ts").as("last_ts"))
    val end = perUser.agg(max($"last_ts").as("corpus_end"))
    val lifetimes = perUser.crossJoin(broadcast(end))
      .select(
        // integer div: epoch-nano differences overflow double's mantissa
        expr(s"(last_ts - first_ts) div ${dayNs}L").as("t_days"),
        ($"last_ts" < $"corpus_end" - lit(censorDays * dayNs)).as("churned"))
    val byT = lifetimes
      .groupBy($"t_days")
      .agg(sum(when($"churned", 1L).otherwise(0L)).as("n_churned"),
        sum(when($"churned", 0L).otherwise(1L)).as("n_censored"))
    val cum = Window.orderBy($"t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_at_risk",
        sum($"n_churned" + $"n_censored").over(
          Window.orderBy($"t_days")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("exhausted",
        coalesce(max(when($"n_churned" === $"n_at_risk", 1L).otherwise(0L))
          .over(cum), lit(0L)))
      .withColumn("survival",
        when($"exhausted" === 1L, 0.0).otherwise(
          round(exp(sum(log(($"n_at_risk" - $"n_churned").cast("double")
            / $"n_at_risk")).over(cum)), 6)))
      .select($"t_days", $"n_at_risk", $"n_churned", $"n_censored",
        $"survival")
  }

  /** Lagged cross-correlation of the daily click and purchase series
    * (q188): Pearson r between clicks(day) and purchases(day + lag) for
    * lags −3..+3 — the "does engagement LEAD conversion, and by how
    * many days" question, and the empirical basis for choosing an
    * attribution window (q35/q36 assume one; this measures it). Days
    * with no events count as REAL zeros via a dense day spine — leaving
    * them out silently biases r toward busy days.
    *
    * Scale: one corpus scan to daily counts (map-side combined, day
    * keys); the spine, the 7-lag explode and the moment sums all run on
    * the days-sized table. Every moment (Σx, Σy, Σxy, Σx², Σy²) is an
    * exact i64 sum of event counts, so r is a single deterministic
    * double expression per lag — no float accumulation anywhere.
    */
  /** Attribution-window ladder (q204): for a ladder of candidate
    * windows (1 min → 24 h), the share of ALL clicks that convert —
    * reach their user's next at-or-after purchase (the q139 forward
    * as-of) — within that window. q35/q36 ASSUME an attribution window;
    * this is the query that picks one: the marginal conversion gained
    * per widening step is read straight off the table. Clicks with no
    * subsequent purchase count in every denominator (dropping them
    * inflates all rates).
    *
    * Scale: one q139-shaped pass (union + ONE user-keyed window) gives
    * every click's wait; the ladder is a constant-size conditional
    * aggregate — the window sweep costs one scan, not one per window.
    */
  def conversionWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ladder: Seq[(String, Long)] = Seq(
      "1m" -> 60000000L, "10m" -> 600000000L, "1h" -> 3600000000L,
      "6h" -> 21600000000L, "24h" -> 86400000000L)
    val base = events(spark, dir)
      .select($"event_id", $"user_id", expr("ts div 1000").as("us"),
        $"event_type")
    val clicks = base.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"us", lit(1).as("is_click"))
    val purchases = base.filter($"event_type" === "purchase")
      .select(lit(-1L).as("event_id"), $"user_id", $"us", lit(0).as("is_click"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"is_click".desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val waits = clicks.unionByName(purchases)
      .withColumn("purchase_us", min(when($"is_click" === 0, $"us")).over(w))
      .filter($"is_click" === 1)
      .select(($"purchase_us" - $"us").as("wait_us"))
    val agg = ladder.map { case (label, us) =>
      sum(when($"wait_us".isNotNull && $"wait_us" <= us, 1L).otherwise(0L))
        .as(s"c_$label")
    }
    val counted = waits.agg(count(lit(1)).as("n_clicks"), agg: _*)
    val rows = ladder.map { case (label, us) =>
      struct(lit(label).as("window_label"), lit(us).as("window_us"),
        col(s"c_$label").as("n_converting"))
    }
    counted
      .select($"n_clicks", explode(array(rows: _*)).as("e"))
      .select($"e.window_label".as("window_label"),
        $"e.window_us".as("window_us"), $"n_clicks",
        $"e.n_converting".as("n_converting"),
        round($"e.n_converting" / $"n_clicks".cast("double"), 6)
          .as("conversion_rate"))
  }

  /** Simpson's-paradox check on value-vs-hour correlation (q200): the
    * Pearson correlation of (event value, hour-of-day) per event type
    * AND for the pooled corpus, with a sign_flip flag on every segment
    * whose correlation disagrees in sign with the pooled one — the
    * aggregation-integrity alarm: a pooled trend that reverses inside
    * every segment is a statement about segment MIX, not behavior, and
    * dashboards that only show the pooled number ship the wrong
    * conclusion. Values are 2-dp, so all five moments are exact i64
    * sums of cents; the pooled moments are SUMS OF the per-segment
    * moments (exact), never a second scan.
    *
    * Scale: one map-side-combined aggregate per segment; the pooled
    * row and flags are segment-count-sized arithmetic.
    */
  def simpsonCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def corrCol = (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
      sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
        ($"n" * $"syy" - $"sy" * $"sy").cast("double")))
    val moments = events(spark, dir)
      .select($"event_type",
        expr("(ts div 3600000000000) % 24").as("hour"),
        round($"value" * 100).cast("long").as("vc"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"hour").as("sx"), sum($"vc").as("sy"),
        sum($"hour" * $"vc").as("sxy"), sum($"hour" * $"hour").as("sxx"),
        sum($"vc" * $"vc").as("syy"))
      .localCheckpoint(true)
    val pooled = moments.agg(sum($"n").as("n"), sum($"sx").as("sx"),
        sum($"sy").as("sy"), sum($"sxy").as("sxy"), sum($"sxx").as("sxx"),
        sum($"syy").as("syy"))
      .select(round(corrCol, 6).as("pooled_r"))
    moments
      .select($"event_type".as("segment"), $"n",
        round(corrCol, 6).as("r"))
      .unionByName(
        moments.agg(sum($"n").as("n"), sum($"sx").as("sx"),
            sum($"sy").as("sy"), sum($"sxy").as("sxy"),
            sum($"sxx").as("sxx"), sum($"syy").as("syy"))
          .select(lit("__pooled__").as("segment"), $"n",
            round(corrCol, 6).as("r")))
      .crossJoin(broadcast(pooled))
      .select($"segment", $"n", $"r", $"pooled_r",
        ($"segment" =!= "__pooled__" && signum($"r") =!= signum($"pooled_r"))
          .as("sign_flip"))
  }

  /** SAX symbolization of the daily event series (q193): per-day event
    * counts z-normalized against the series' own moments and quantized
    * into a 4-letter alphabet at the standard normal breakpoints
    * (−0.6745, 0, 0.6745) — the symbolic-aggregate-approximation step
    * that turns a numeric series into a string, enabling motif/anomaly
    * search with plain string operators downstream. Breakpoints are
    * LITERALS and the moments are exact integer sums of counts, so the
    * z-scores (and hence every symbol) are bit-identical across
    * engines.
    *
    * Scale: one corpus scan to day counts; the z-window and
    * symbolization run on the days-sized table.
    */
  def saxSymbols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n_events"))
    val tot = Window.partitionBy(lit(1))
    daily
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("s", sum($"n_events").over(tot))
      .withColumn("q", sum($"n_events" * $"n_events").over(tot))
      .withColumn("mu", $"s" / $"n".cast("double"))
      .withColumn("sd", sqrt(greatest(
        $"q" / $"n".cast("double") - $"mu" * $"mu", lit(1e-12))))
      .withColumn("z", round(($"n_events" - $"mu") / $"sd", 6))
      .select($"day", $"n_events", $"z",
        when($"z" < -0.6745, "a").when($"z" < 0.0, "b")
          .when($"z" < 0.6745, "c").otherwise("d").as("symbol"))
  }

  def laggedXcorr(spark: SparkSession, dir: String,
      maxLag: Int = 3): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"), $"event_type")
      .groupBy($"day")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
    val bounds = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
    // days-sized barrier: both join sides and the bounds row re-derive
    // from the corpus scan otherwise (three scans for one)
    val spine = bounds
      .select(explode(sequence($"lo", $"hi")).as("day"))
      .join(daily, Seq("day"), "left")
      .select($"day", coalesce($"c", lit(0L)).as("c"),
        coalesce($"p", lit(0L)).as("p"))
      .localCheckpoint(true)
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
    spine.as("a").crossJoin(broadcast(lags))
      .join(spine.as("b"), col("b.day") === col("a.day") + $"lag")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_days"),
        sum(col("a.c")).as("sx"), sum(col("b.p")).as("sy"),
        sum(col("a.c") * col("b.p")).as("sxy"),
        sum(col("a.c") * col("a.c")).as("sxx"),
        sum(col("b.p") * col("b.p")).as("syy"))
      .select($"lag", $"n_days",
        round(($"n_days" * $"sxy" - $"sx" * $"sy").cast("double") /
          sqrt(($"n_days" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n_days" * $"syy" - $"sy" * $"sy").cast("double")), 6)
          .as("r"))
  }

  /** Position-based (U-shaped) conversion attribution (q258): every
    * purchase distributes EXACTLY 1e6 credit units over the user's
    * click/view touches in the preceding `lookbackSec` window — 40% to
    * the first touch, 40% to the last, the middle 20% split evenly with
    * the integer remainder assigned to the last touch (a deterministic
    * rule, so the split is exact on both engines: n=1 → 1e6, n=2 →
    * 5e5+5e5, n≥3 → 4e5 / 200000 div (n−2) each / 4e5+remainder).
    * Rolled up by (touch_type, position) — which channel earns credit
    * and WHERE in the journey it sits, the report first/last-touch
    * attribution (q35) cannot answer.
    *
    * Scale: the touch⋈conversion pairing is a user-keyed equi-join with
    * a time-range predicate (per-user pair volume, never cross-user);
    * the position rank is a per-conversion window (touches-per-
    * conversion partitions); the rollup is ≤ |touch types| × 4 rows.
    * All weights are exact i64 — no float credit can drift.
    */
  def positionAttribution(spark: SparkSession, dir: String,
      lookbackSec: Long = 7L * 86400L): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        expr("ts div 1000000000").as("sec"))
    val convs = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("conv_id"), $"sec".as("conv_sec"))
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_id".as("touch_id"),
        $"event_type".as("touch_type"), $"sec".as("touch_sec"))
    val w = Window.partitionBy($"conv_id").orderBy($"touch_sec", $"touch_id")
    val paired = touches.join(convs, Seq("user_id"))
      .filter($"touch_sec" < $"conv_sec" &&
        $"touch_sec" >= $"conv_sec" - lookbackSec)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy($"conv_id")).cast("long"))
    val midW = expr("200000 div (n - 2)")
    val credited = paired.withColumn("credit_e6",
      when($"n" === 1, lit(1000000L))
        .when($"n" === 2, lit(500000L))
        .when($"rn" === 1, lit(400000L))
        .when($"rn" === $"n",
          lit(400000L) + (lit(200000L) - ($"n" - 2) * midW))
        .otherwise(midW))
      .withColumn("touch_position",
        when($"n" === 1, "only")
          .when($"rn" === 1, "first")
          .when($"rn" === $"n", "last")
          .otherwise("middle"))
    credited.groupBy($"touch_type", $"touch_position")
      .agg(count(lit(1)).as("n_touches"),
        sum($"credit_e6").as("credit_e6"))
      .withColumn("credit", round($"credit_e6".cast("double") / 1e6, 6))
  }
}
