package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series monitoring operators over the `events` table — the
  * drift/trend/robust-stats battery a training-data pipeline runs on its
  * ingest telemetry: rolling actives, changepoint screening, exponential
  * smoothing, robust outliers and distribution drift. All share
  * [[Tables.eventsNs]] (epoch-nanos BIGINT `ts`, any physical encoding)
  * and integer day bucketing, so the DuckDB oracle can mirror every
  * bucket boundary exactly.
  */
object Series {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsNs(spark, dir)

  private val dayNs = 86400000000000L

  /** Trailing-window distinct active users per calendar day (q122) — the
    * WAU/DAU-style engagement series. Day d counts users with ≥1 event in
    * [d−w+1, d]; the grid covers every day between the corpus' first and
    * last active day, gap days included (reported as their trailing
    * count, 0 only when the whole window is quiet).
    *
    * Scale: the corpus-sized work is two (user, day)-keyed distincts with
    * map-side partial dedup; the window is applied by exploding each
    * DISTINCT (user, day) row into w grid days — a constant ×w fan-out of
    * the already-deduplicated activity table, NOT of raw events — and the
    * final count groups on ~calendar-many keys. No per-day window over
    * raw events, no day×user matrix materialized. The grid itself comes
    * from a one-row bounds aggregate broadcast-joined at the end.
    */
  def rollingActive(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    import spark.implicits._
    val userDays = events(spark, dir)
      .select($"user_id", expr(s"ts div $dayNs").as("day"))
      .distinct()
    val grid = userDays.agg(min($"day").as("lo"), max($"day").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("day"))
    val counts = userDays
      .select($"user_id",
        explode(sequence($"day", $"day" + (windowDays - 1))).as("gday"))
      .distinct()
      .groupBy($"gday").agg(count(lit(1)).as("active"))
    grid.join(counts, grid("day") === counts("gday"), "left")
      .select($"day", coalesce($"active", lit(0L)).as(s"active_${windowDays}d"))
  }

  /** Mean-split changepoint screen per event type (q123): for every
    * candidate split point k in the daily-count series, the absolute gap
    * |mean(days ≤ k) − mean(days > k)|; report the split maximizing the
    * gap (ties → earliest day). The cheap screen run before fitting any
    * segmented model — a level shift in ingest volume shows up as a
    * sharp max; flat series score near 0.
    *
    * One shuffle: the (type, day) count aggregate; every window below it
    * (cumulative sums, per-type totals, the final argmax rank) shares the
    * type partitioning, and the series length is calendar-bounded.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy($"event_type").orderBy($"day")
    val whole = Window.partitionBy($"event_type")
    val scored = daily
      .withColumn("rn", row_number().over(byDay))
      .withColumn("cs", sum($"n").over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", count(lit(1)).over(whole))
      .withColumn("s", sum($"n").over(whole))
      .filter($"rn" < $"t")
      .withColumn("stat",
        abs($"cs".cast("double") / $"rn" -
          ($"s" - $"cs").cast("double") / ($"t" - $"rn")))
    scored
      .withColumn("pick", row_number().over(
        Window.partitionBy($"event_type").orderBy($"stat".desc, $"day")))
      .filter($"pick" === 1)
      .select($"event_type", $"day".as("split_day"),
        round($"stat", 4).as("split_stat"), $"t".as("n_days"))
  }

  /** Exponentially-weighted moving average of daily counts per event type
    * (q124): the standard recursive smoother ewma_k = (1−α)·ewma_{k−1} +
    * α·x_k, seeded ewma_1 = x_1 — order-dependent, so it cannot be a
    * plain window sum. The per-type daily series is CALENDAR-bounded
    * (days, not events — the q117 argument), so each series is collected
    * into one array and folded by a higher-order `aggregate` lambda
    * entirely inside codegen: no UDF, no driver loop, one (type, day)
    * aggregate plus one per-type shuffle of day-sized rows. The DuckDB
    * oracle runs the same recurrence as a recursive CTE — two engines,
    * two recursion mechanisms, identical doubles (same fold order).
    */
  def ewmaDaily(spark: SparkSession, dir: String, alpha: Double = 0.2): DataFrame = {
    import spark.implicits._
    val a = alpha
    val daily = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    daily
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"n"))).as("s"))
      .select($"event_type", explode(expr(
        s"""aggregate(
           |  s,
           |  named_struct(
           |    'prev', cast(null as double),
           |    'out', cast(array() as array<struct<day:bigint,ewma:double>>)),
           |  (acc, e) -> named_struct(
           |    'prev',
           |      if(acc.prev is null, cast(e.n as double),
           |         ${1.0 - a}d * acc.prev + ${a}d * e.n),
           |    'out', array_append(acc.out, named_struct(
           |      'day', e.day,
           |      'ewma',
           |        if(acc.prev is null, cast(e.n as double),
           |           ${1.0 - a}d * acc.prev + ${a}d * e.n)))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select($"event_type", $"r.day".as("day"), round($"r.ewma", 4).as("ewma"))
  }

  /** First-order Markov transition matrix over per-user event streams
    * (q129): P(next event type | current) with counts, read off each
    * user's time-ordered stream by ONE `lead` per row — no per-user
    * collect_list (a power user's whole history in one task), no
    * self-join on adjacency. One user-keyed window shuffle; the
    * (type, next) aggregate and its per-type normalizing window are
    * type²-bounded. The q116 trigram miner's pairwise sibling, with
    * probabilities instead of a top-k.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round($"n".cast("double") /
        sum($"n").over(Window.partitionBy($"event_type")), 6))
  }

  /** Robust outliers by median absolute deviation per event type (q125):
    * |v − median| > k·MAD — the z-score screen (q62) rerun with
    * estimators a heavy tail can't drag. Exact interpolating medians
    * (Spark `percentile` == DuckDB `median`/quantile_cont), so the two
    * engines agree to the bit before rounding.
    *
    * Three scans — median, MAD, flag counts — each a map-side-combined
    * aggregate on the handful of event types, stitched by broadcast
    * joins of the per-type constants. Exact medians need a sorted buffer
    * per (type) partial; at 100 TB swap `percentile` for
    * `percentile_approx` (the q58 pattern) and keep the plan.
    */
  def madOutliers(spark: SparkSession, dir: String, k: Double = 3.0): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select($"event_type", $"value")
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val stats = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(first($"med").as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(stats), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        first($"med").as("m"), first($"mad").as("d"),
        sum(when(abs($"value" - $"med") > lit(k) * $"mad", 1L).otherwise(0L))
          .as("n_outliers"))
      .select($"event_type", $"n", round($"m", 6).as("med"),
        round($"d", 6).as("mad"), $"n_outliers",
        round($"n_outliers".cast("double") / $"n", 6).as("outlier_frac"))
  }

  /** Per-type daily-count trend line (q136): ordinary-least-squares
    * slope/intercept/R² of count vs day offset — "is this source
    * growing, and how fast", the number capacity planning reads off the
    * ingest dashboard. Day offsets are rebased to each type's first day
    * (small integers), so every co-moment (Σx, Σy, Σxy, Σx², Σy²) is an
    * EXACT integer sum on both engines; division happens once at the
    * end. One (type, day) aggregate, one per-type co-moment aggregate —
    * the q115 one-pass regression shape, per group.
    */
  def dailyTrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
      .withColumn("x", $"day" - min($"day").over(Window.partitionBy($"event_type")))
    val mom = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("m"), sum($"x").as("sx"), sum($"n").as("sy"),
        sum($"x" * $"n").as("sxy"), sum($"x" * $"x").as("sx2"),
        sum($"n" * $"n").as("sy2"))
      .select($"event_type", $"m",
        ($"m" * $"sxy" - $"sx" * $"sy").as("cov"),
        ($"m" * $"sx2" - $"sx" * $"sx").as("vx"),
        ($"m" * $"sy2" - $"sy" * $"sy").as("vy"),
        $"sx", $"sy")
    mom.select($"event_type", $"m".as("n_days"),
      when($"vx" > 0, round($"cov".cast("double") / $"vx", 6)).as("slope"),
      when($"vx" > 0, round(($"sy" - $"cov".cast("double") / $"vx" * $"sx")
        / $"m", 6)).as("intercept"),
      when($"vx" > 0 && $"vy" > 0,
        round($"cov".cast("double") * $"cov" / ($"vx".cast("double") * $"vy"), 6))
        .as("r2"))
  }

  /** Anomalous-day report per event type (q133): residual = daily count
    * − centered 7-day trend − day-of-week effect, flagged when the
    * absolute residual exceeds `zK`·σ of the type's residuals — the
    * composed screen (trend + seasonality + robustness) an ingest
    * monitor actually pages on, where q117/q118/q123 each measure one
    * factor in isolation. Every window (trend frame, dow means, residual
    * moments) shares the per-type partitioning of the one (type, day)
    * aggregate; series lengths are calendar-bounded. Averages are
    * exact-integer-sum-then-divide on both engines, and the residual is
    * rounded before the σ fold so the engines sum identical values.
    */
  def anomalyDays(spark: SparkSession, dir: String, zK: Double = 2.0): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy($"event_type").orderBy($"day")
    val whole = Window.partitionBy($"event_type")
    val scored = daily
      .withColumn("trend", avg($"n").over(byDay.rowsBetween(-3, 3)))
      .withColumn("dow_mean", avg($"n").over(
        Window.partitionBy($"event_type", pmod($"day", lit(7L)))))
      .withColumn("type_mean", avg($"n").over(whole))
      .withColumn("resid",
        round($"n" - $"trend" - ($"dow_mean" - $"type_mean"), 4))
    scored
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("s1", sum($"resid").over(whole))
      .withColumn("s2", sum($"resid" * $"resid").over(whole))
      // greatest(0, var): FP cancellation can push a zero variance a few
      // ulps negative, and Spark/DuckDB disagree on NaN comparisons
      .withColumn("std",
        when($"m" >= 2, sqrt(greatest(lit(0.0),
          ($"s2" - $"s1" * $"s1" / $"m") / ($"m" - 1)))))
      .select($"event_type", $"day", $"n", round($"trend", 4).as("trend"),
        $"resid",
        ($"std".isNotNull && abs($"resid") > lit(zK) * $"std").as("is_anomaly"))
  }

  /** Population stability index of the value distribution, first half of
    * the time range vs second (q126) — the drift monitor run before a
    * model trained on last month's data scores this month's. Values are
    * bucketed into `nBins` fixed-width bins over the GLOBAL [min, max]
    * (one-row bounds aggregate folded into the scan projection — a
    * per-half ntile would total-sort the corpus); PSI = Σ_b (p_b −
    * q_b)·ln(p_b/q_b) with +0.5 Laplace smoothing so empty bins stay
    * finite. The per-(type, bin, half) counts are one map-side-combined
    * aggregate; the bin grid join is constant-sized.
    */
  def psiDrift(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"), $"value")
    val bounds = ev.agg(min($"day").as("lo"), max($"day").as("hi"),
      min($"value").as("vlo"), max($"value").as("vhi"))
    val counts = ev.crossJoin(broadcast(bounds))
      .select($"event_type",
        // integer midpoint (days are positive, so truncating div ==
        // DuckDB's floor //)
        ($"day" <= expr("(lo + hi) div 2")).as("first_half"),
        least(lit(nBins - 1L),
          floor(($"value" - $"vlo") * nBins / ($"vhi" - $"vlo"))).as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(sum(when($"first_half", 1L).otherwise(0L)).as("ca"),
        sum(when($"first_half", 0L).otherwise(1L)).as("cb"))
    val grid = counts.select($"event_type").distinct()
      .select($"event_type", explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"))
    val filled = grid.join(counts, Seq("event_type", "bin"), "left")
      .select($"event_type", $"bin",
        coalesce($"ca", lit(0L)).as("ca"), coalesce($"cb", lit(0L)).as("cb"))
    val half = lit(0.5)
    filled
      .withColumn("na", sum($"ca").over(Window.partitionBy($"event_type")))
      .withColumn("nb", sum($"cb").over(Window.partitionBy($"event_type")))
      .withColumn("p", ($"ca" + half) / ($"na" + half * nBins))
      .withColumn("q", ($"cb" + half) / ($"nb" + half * nBins))
      .groupBy($"event_type")
      .agg(first($"na").as("n_first"), first($"nb").as("n_second"),
        round(sum(($"p" - $"q") * log($"p" / $"q")), 6).as("psi"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift per event type (q153):
    * sup |F_first(v) − F_second(v)| between the value distributions of
    * the first and second halves of the time range — q126's PSI without
    * the binning approximation: sensitive to ANY distributional change,
    * not just mass moving between 10 fixed bins. The halves share q126's
    * integer midpoint split. CDFs are cumulative windows over the
    * per-(type, value) count table — exact integer sums divided once, so
    * both engines produce identical doubles before the round(6).
    *
    * Scale: the corpus-sized work is one map-side-combined
    * (type, value) count; the cumulative pass runs over DISTINCT values
    * per type, which exact KS irreducibly needs sorted — at 100 TB
    * either accept that per-type range-sort or fall back to q126's
    * binned drift (the approximate twin in this battery).
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_type", expr(s"ts div $dayNs").as("day"), $"value")
    val bounds = ev.agg(min($"day").as("lo"), max($"day").as("hi"))
    val counts = ev.crossJoin(broadcast(bounds))
      .select($"event_type",
        ($"day" <= expr("(lo + hi) div 2")).as("first_half"), $"value")
      .groupBy($"event_type", $"value")
      .agg(sum(when($"first_half", 1L).otherwise(0L)).as("ca"),
        sum(when($"first_half", 0L).otherwise(1L)).as("cb"))
    val byVal = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"event_type")
    counts
      .withColumn("na", sum($"ca").over(whole))
      .withColumn("nb", sum($"cb").over(whole))
      .withColumn("gap", abs(
        sum($"ca").over(byVal).cast("double") / $"na" -
          sum($"cb").over(byVal).cast("double") / $"nb"))
      .groupBy($"event_type")
      .agg(first($"na").as("n_first"), first($"nb").as("n_second"),
        round(max($"gap"), 6).as("ks_stat"))
  }

  /** Daily content-novelty curve (q160): per calendar day the event
    * volume, distinct payload count, FIRST-SEEN payload count and the
    * cumulative distinct total — the "is my crawl still finding new
    * content or re-fetching the same pages" monitor. First-seen day per
    * payload is one min() aggregate keyed by the payload itself (the
    * same shape as exact dedup q13 — scales to any corpus); everything
    * after runs on the DAY table. The cumulative window is ordered by
    * day with no partition key — a calendar-bounded few-thousand-row
    * frame, the same boundedness argument as q122's day grid, NOT a
    * corpus-sized global sort.
    */
  def noveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select(expr(s"ts div $dayNs").as("day"), $"props")
    val daily = ev.groupBy($"day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"props").as("n_distinct"))
    val novel = ev.groupBy($"props").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n_novel"))
    daily.join(novel, Seq("day"), "left")
      .withColumn("n_novel", coalesce($"n_novel", lit(0L)))
      .withColumn("cum_distinct", sum($"n_novel").over(Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"day", $"n_events", $"n_distinct", $"n_novel",
        $"cum_distinct",
        round($"n_novel".cast("double") / $"n_distinct", 6)
          .as("novelty_rate"))
  }

  /** Stationary distribution of the per-user event-type Markov chain
    * (q161): where does a user's behavior settle long-run? Transition
    * probabilities come from q129's (type → next type) counts; `iters`
    * synchronous power-iteration rounds of πᵀ ← πᵀP from the uniform
    * start. Types never observed as a transition SOURCE get an explicit
    * self-loop so P stays stochastic (no silent mass leak); types with
    * no INBOUND edges converge to π = 0 and are restored by the final
    * left join.
    *
    * Scale: the corpus-sized work is the one user-partitioned lead()
    * window building transition pairs (shared shape with q129) and its
    * (src, dst) count — both distributed. The matrix itself is bounded
    * by the event-type VOCABULARY squared, so the power iteration folds
    * on the DRIVER over the collected matrix — the q74 Lloyd pattern
    * (small iterative state as driver values), chosen over `iters`
    * distributed joins of 5-row frames whose 20 sequential tiny shuffle
    * stages cost more scheduler latency than the whole query (measured
    * 7.5 s → ~1 s at sf0.1). The fold visits transitions in sorted
    * (src, dst) order so the summation is deterministic.
    */
  def markovStationary(spark: SparkSession, dir: String,
      iters: Int = 20): DataFrame = {
    import spark.implicits._
    markovCore(spark, dir, iters) match {
      case None => Seq.empty[(String, Double)].toDF("state", "pi")
      case Some((states, _, pi)) =>
        // the final round() runs through Spark so rounding semantics
        // cannot drift from every other oracle-gated query
        states.map(s => (s, pi(s))).toDF("state", "pi0")
          .select($"state", round($"pi0", 6).as("pi"))
    }
  }

  /** Shared q161/q208 driver fold: (sorted states, stochastic matrix
    * rows sorted by (src, dst) with self-loops for source-less states,
    * stationary distribution after `iters` uniform-start power rounds).
    * Bounded collects: |types|² transition counts + the |types| state
    * vocabulary (the q74 centroid / moment-table boundedness argument).
    */
  private def markovCore(spark: SparkSession, dir: String, iters: Int)
      : Option[(IndexedSeq[String], Seq[(String, String, Double)],
        Map[String, Double])] = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("src"), $"next_type".as("dst"))
      .agg(count(lit(1)).as("n"))
    val obs = counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val states = events(spark, dir).select($"event_type").distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    if (states.isEmpty) return None
    val outTotals = obs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // observed rows normalized per source; source-less states self-loop
    // so the matrix stays stochastic (same definition as the oracle)
    val trans: Seq[(String, String, Double)] =
      obs.map { case (s, d, n) => (s, d, n.toDouble / outTotals(s)) } ++
        states.filterNot(outTotals.contains).map(s => (s, s, 1.0))
    var pi = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      trans.foreach { case (s, d, p) => next(d) += p * pi.getOrElse(s, 0.0) }
      pi = states.map(s => s -> next(s)).toMap
    }
    Some((states, trans, pi))
  }

  /** Markov entropy rate (q208): H = Σ_s π_s · H_s with
    * H_s = −Σ_d p(s→d)·ln p(s→d), over the q129 transition matrix and
    * the q161 stationary distribution — the bits-per-event
    * predictability of user behavior: ~0 means journeys are scripted
    * (or the event stream is broken and repeating), ln(|states|) means
    * white noise. Composes [[markovCore]] verbatim, so the chain scored
    * is exactly the one q161 reports.
    *
    * Scale: the corpus pass is q129's pair count; everything after is
    * |states|-sized driver arithmetic (the q161 precedent).
    */
  def entropyRate(spark: SparkSession, dir: String,
      iters: Int = 20): DataFrame = {
    import spark.implicits._
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    markovCore(spark, dir, iters) match {
      case None =>
        Seq.empty[(String, Double, Double, Double, Double)]
          .toDF("state", "pi", "h_state", "contribution", "entropy_rate")
      case Some((states, trans, pi)) =>
        val bySrc = trans.groupBy(_._1)
        val rows = states.map { s =>
          val h = r6(-bySrc.getOrElse(s, Nil).sortBy(_._2)
            .foldLeft(0.0) { case (acc, (_, _, p)) =>
              if (p > 0) acc + p * math.log(p) else acc })
          val pis = r6(pi(s))
          (s, pis, h, r6(pis * h))
        }
        val total = r6(rows.foldLeft(0.0)(_ + _._4))
        rows.map { case (s, p, h, c) => (s, p, h, c, total) }
          .toDF("state", "pi", "h_state", "contribution", "entropy_rate")
    }
  }

  /** Delete-one-block jackknife CI for the mean value per event type
    * (q167): rows land in one of `blocks` deterministic md5 buckets
    * (the q47/q128 hash-split trick — no RNG, identical assignment on
    * both engines and on any re-run); the leave-one-block-out means
    * θᵢ = (S−sᵢ)/(C−cᵢ) come straight from block sums, and
    * SE = √((b−1)·var_pop(θ)) with the ±1.96·SE normal band. The error
    * bar a telemetry dashboard can actually ship — block-based, so it
    * is ONE aggregation pass no matter the corpus size.
    *
    * Scale: the corpus-sized work is a single map-side-combined
    * (type, block) sum/count; everything after runs on the b·|types|
    * block table. No per-row resampling (a Poisson bootstrap would be
    * B× the work for the same confidence statement).
    */
  def jackknifeCI(spark: SparkSession, dir: String,
      blocks: Int = 20): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_type", $"value",
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 4)," +
          s" 16, 10) as bigint) % $blocks").as("blk"))
    val blockSums = ev.groupBy($"event_type", $"blk")
      .agg(sum($"value").as("s"), count(lit(1)).as("c"))
    val totals = blockSums.groupBy($"event_type")
      .agg(sum($"s").as("st"), sum($"c").as("ct"),
        count(lit(1)).as("b"))
    blockSums.join(broadcast(totals), "event_type")
      .select($"event_type", $"st", $"ct", $"b",
        (($"st" - $"s") / ($"ct" - $"c")).as("loo_mean"))
      .groupBy($"event_type")
      .agg(max($"ct").as("n"), max($"b").as("n_blocks"),
        round(max($"st") / max($"ct"), 6).as("mean"),
        round(sqrt((max($"b") - lit(1.0)) * var_pop($"loo_mean")), 6)
          .as("se_jack"),
        round(max($"st") / max($"ct") -
          lit(1.96) * sqrt((max($"b") - lit(1.0)) * var_pop($"loo_mean")), 4)
          .as("ci_lo"),
        round(max($"st") / max($"ct") +
          lit(1.96) * sqrt((max($"b") - lit(1.0)) * var_pop($"loo_mean")), 4)
          .as("ci_hi"))
  }

  /** Hash-armed A/B report per event type (q168): users split into two
    * arms by md5 parity (deterministic, user-level so a user's events
    * never straddle arms), then per type the arm means, absolute and
    * relative lift, and the two-sample z statistic
    * (μ_b−μ_a)/√(σ²_a/n_a + σ²_b/n_b) — the experimentation readout.
    * One conditional aggregate per type (var_samp over each arm's
    * events via null-skipping when()); no window, no second pass.
    */
  def abLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_type", $"value",
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 4)," +
          " 16, 10) as bigint) % 2").as("arm"))
    ev.groupBy($"event_type")
      .agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
        round(avg(when($"arm" === 0, $"value")), 6).as("mean_a"),
        round(avg(when($"arm" === 1, $"value")), 6).as("mean_b"),
        round(avg(when($"arm" === 1, $"value"))
          - avg(when($"arm" === 0, $"value")), 6).as("lift"),
        // degenerate guards (ANSI mode): zero control mean → no relative
        // lift; zero pooled variance (constant arms) → no z statistic
        round(when(avg(when($"arm" === 0, $"value")) =!= 0.0,
          (avg(when($"arm" === 1, $"value"))
            - avg(when($"arm" === 0, $"value")))
            / avg(when($"arm" === 0, $"value"))), 6).as("rel_lift"),
        round(when(var_samp(when($"arm" === 0, $"value"))
            / sum(when($"arm" === 0, 1L).otherwise(0L))
            + var_samp(when($"arm" === 1, $"value"))
              / sum(when($"arm" === 1, 1L).otherwise(0L)) > 0.0,
          (avg(when($"arm" === 1, $"value"))
            - avg(when($"arm" === 0, $"value")))
            / sqrt(var_samp(when($"arm" === 0, $"value"))
                / sum(when($"arm" === 0, 1L).otherwise(0L))
              + var_samp(when($"arm" === 1, $"value"))
                / sum(when($"arm" === 1, 1L).otherwise(0L)))), 4).as("z_stat"))
  }

  /** Winsorized moments per event type (q163): values clipped at the
    * exact empirical p05/p95 ORDER STATISTICS — rank-selected, not
    * interpolated, so both engines pick the identical clip bounds by
    * integer comparison (rn == 5n÷100+1 and rn == 95n÷100 in (value,
    * event_id) order) — then the clipped mean/std beside the raw mean
    * and the clip counts. The robust-moments companion to q125's MAD
    * screen: MAD flags outliers, winsorization measures what the
    * distribution looks like with them pinned to the fences.
    *
    * Scale: one event_type-partitioned rank window (a per-type sort —
    * the exact-order-statistic cost, same as q153's CDF; at 100 TB swap
    * in approx quantile fences via q58's sketch and keep the rest), one
    * broadcast of the per-type fence table, one map-side-combined
    * moment aggregate.
    */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select($"event_type", $"event_id", $"value")
    val byVal = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val fences = ev
      .withColumn("rn", row_number().over(byVal).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        min(when($"rn" === expr("n * 5 div 100 + 1"), $"value")).as("v_lo"),
        min(when($"rn" === expr("n * 95 div 100"), $"value")).as("v_hi"))
    ev.join(broadcast(fences), "event_type")
      .withColumn("w", when($"value" < $"v_lo", $"v_lo")
        .when($"value" > $"v_hi", $"v_hi").otherwise($"value"))
      .groupBy($"event_type")
      .agg(max($"n").as("n"), first($"v_lo").as("v_lo"),
        first($"v_hi").as("v_hi"),
        round(avg($"value"), 6).as("mean_raw"),
        round(avg($"w"), 6).as("mean_winsor"),
        round(stddev_samp($"w"), 6).as("std_winsor"),
        sum(when($"value" < $"v_lo", 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when($"value" > $"v_hi", 1L).otherwise(0L)).as("n_clipped_hi"))
  }
}
