package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe per-group top-k: the two-phase salted ranking every
  * "best k per stratum" query needs once strata outnumber rows-per-
  * stratum by orders of magnitude. A single `row_number` window over
  * `group` sends EVERY row of a group to one task — with 5 languages on
  * a 1000-executor cluster that is 5 working tasks and 995 idle ones,
  * plus one task eating a fifth of the corpus.
  *
  * Phase 1 ranks within (group, salt) — `saltBuckets`× the parallelism,
  * bounded skew — and keeps each bucket's local top-k, which provably
  * contains the global top-k (any global top-k row is top-k within its
  * own bucket). Phase 2 re-ranks the ≤ saltBuckets·k survivors per
  * group — a few-KB shuffle — so the emitted `rn` is exactly the
  * single-window result. `order` must be a total order (tie-broken) for
  * the two plans to agree row-for-row.
  */
object Ranking {

  def topKPerGroup(df: DataFrame, group: Seq[String], order: Seq[Column],
      saltKey: Column, k: Int, saltBuckets: Int = 32): DataFrame = {
    // both names are written unconditionally; overwriting a caller's
    // column of the same name would silently corrupt its data
    require(!df.columns.contains("rn"),
      "topKPerGroup emits an `rn` column; input already has one")
    require(!df.columns.contains("__local_rn"),
      "topKPerGroup uses `__local_rn` internally; input already has it")
    val groupCols = group.map(col)
    val w1 = Window
      .partitionBy(groupCols :+ pmod(hash(saltKey), lit(saltBuckets)): _*)
      .orderBy(order: _*)
    val survivors = df
      .withColumn("__local_rn", row_number().over(w1))
      .filter(col("__local_rn") <= k)
      .drop("__local_rn")
    val w2 = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    survivors
      .withColumn("rn", row_number().over(w2).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Global top-k WITHOUT a global rank window: `orderBy(...).limit(k)`
    * plans as TakeOrderedAndProject — every partition keeps its local
    * top-k and the driver merges k-row heaps — where the
    * `row_number().over(Window.orderBy(...))` spelling funnels the WHOLE
    * input through one `Exchange SinglePartition` task before discarding
    * all but k rows. On a web-scale type table (10⁸–10⁹ distinct tokens)
    * that single task sorts tens of GB to emit 10 rows.
    *
    * The rank is then assigned on the k survivors only, and still with
    * no window: rk(x) = 1 + |rows strictly before x|, counted by a
    * broadcast self-join over the ≤ k² pairs (k is 10–100 here — the
    * pair table is smaller than one shuffle block). `order` is
    * (column-name, descending?) pairs and must be a TOTAL order over the
    * input's rows with non-null keys — the same contract row_number
    * needs for a deterministic result, enforced here because equal-key
    * rows would also merge in the rank groupBy.
    *
    * `eager` (default) checkpoints the k survivors so the input subtree
    * runs ONCE (both join sides read the materialized k rows); tests
    * pass eager=false to walk the un-checkpointed physical plan.
    */
  def topKGlobal(df: DataFrame, order: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rk", eager: Boolean = true): DataFrame = {
    require(order.nonEmpty, "topKGlobal needs at least one order column")
    require(!df.columns.contains(rankCol),
      s"topKGlobal emits `$rankCol`; input already has it")
    require(!df.columns.exists(_.startsWith("__tk_")),
      "topKGlobal reserves the __tk_ prefix; input collides")
    val sortCols = order.map { case (c, desc) =>
      if (desc) col(c).desc else col(c).asc
    }
    val top0 = df.orderBy(sortCols: _*).limit(k)
    val top = if (eager) top0.localCheckpoint(true) else top0
    val keyNames = order.map(_._1)
    val other = top
      .select(keyNames.map(c => col(c).as(s"__tk_$c")) :+
        lit(1).as("__tk_one"): _*)
    // lexicographic strictly-before: OR over prefixes of (equal on the
    // first i keys, strictly before on key i); null-safe equality so a
    // null key cannot silently drop comparisons
    val before = order.indices.map { i =>
      val eqPrefix = (0 until i)
        .map { j => col(s"__tk_${keyNames(j)}") <=> col(keyNames(j)) }
        .foldLeft(lit(true))(_ && _)
      val (ci, desc) = order(i)
      val cmp =
        if (desc) col(s"__tk_$ci") > col(ci) else col(s"__tk_$ci") < col(ci)
      eqPrefix && cmp
    }.reduce(_ || _)
    top.join(broadcast(other), before, "left")
      .groupBy(top.columns.map(col): _*)
      .agg((count(col("__tk_one")) + 1).cast("long").as(rankCol))
  }

  /** Skew-free EXCLUSIVE prefix sum: appends `cum_before` = Σ `weight`
    * over the rows that sort STRICTLY BEFORE each row in `order`, within
    * each `part` group — the distributed-rank primitive behind exact
    * midranks, equal-count bins and order-statistic lookups. The naive
    * spelling (`sum/row_number over Window.orderBy`) funnels the whole
    * input through ONE task (an `Exchange SinglePartition` feeding the
    * Window) — a 100×-scale killer. This is the textbook two-level
    * construction instead:
    *
    *  1. rows land in ≤ `buckets` RANGE buckets of `bucketKey` (a numeric
    *     column that must be monotone non-decreasing in `order`'s leading
    *     column, with equal order-values mapping to equal keys — usually
    *     the leading column itself); bucket bounds come from one global
    *     min/max aggregate broadcast back, so bucketing is a scan-stage
    *     projection;
    *  2. per-(part, bucket) totals — an aggregate table ≤ |part|·buckets
    *     rows — get an exclusive cross-bucket prefix: per part via a
    *     ≤`buckets`-row window partitioned BY part (never SinglePartition),
    *     or for the global case via a broadcast self-join over ≤ buckets²
    *     constant-bounded pairs;
    *  3. the within-bucket running sum is a window partitioned by
    *     (part, bucket) — each partition holds ~1/buckets of its group, so
    *     a hot group splits across `buckets` tasks instead of one.
    *
    * `cum_before` = cross-bucket prefix + within-bucket running sum − own
    * weight; with `weight = lit(1L)` this is `row_number − 1` exactly.
    * Requirements: `order` must be a TOTAL order within `part` (tie-broken
    * — otherwise the running sum is nondeterministic per row), `weight`
    * integral (sums stay exact i64), `part`/`bucketKey` non-null.
    */
  def prefixCum(df: DataFrame, part: Seq[String], bucketKey: Column,
      order: Seq[Column], weight: Column, buckets: Int = 1024): DataFrame = {
    val reserved = Seq("cum_before", "__pb", "__bw", "__cum_b", "__w",
      "__lo", "__hi")
    require(!df.columns.exists(reserved.contains),
      s"prefixCum reserves ${reserved.mkString(",")}; input collides")
    val partCols = part.map(col)
    // one extra pass over the (already-projected) input for the range
    // bounds; broadcast back so bucket assignment never shuffles
    val stats = broadcast(df.agg(
      min(bucketKey).cast("double").as("__lo"),
      max(bucketKey).cast("double").as("__hi")))
    val withB = df.crossJoin(stats)
      .withColumn("__pb",
        when(col("__hi") > col("__lo"),
          least(lit(buckets - 1),
            floor((bucketKey.cast("double") - col("__lo"))
              / (col("__hi") - col("__lo")) * buckets)))
          .otherwise(lit(0)).cast("int"))
      .drop("__lo", "__hi")
      .withColumn("__w", weight.cast("long"))
    val bt = withB.groupBy((partCols :+ col("__pb")): _*)
      .agg(sum(col("__w")).as("__bw"))
    val cumB =
      if (part.isEmpty) {
        // ≤ buckets rows: the buckets²/2 pair join is constant-bounded
        val lower = bt.select(col("__pb").as("__pb2"), col("__bw").as("__bw2"))
        bt.join(broadcast(lower), col("__pb2") < col("__pb"), "left")
          .groupBy(col("__pb"))
          .agg(coalesce(sum(col("__bw2")), lit(0L)).as("__cum_b"))
      } else {
        // window partitions are ≤ buckets rows per part key — tiny, and
        // partitioned by part so no SinglePartition exchange
        val wb = Window.partitionBy(partCols: _*).orderBy(col("__pb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bt.withColumn("__cum_b", sum(col("__bw")).over(wb) - col("__bw"))
          .select((partCols :+ col("__pb") :+ col("__cum_b")): _*)
      }
    val wWin = Window.partitionBy((partCols :+ col("__pb")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // no forced broadcast: cumB is |occupied (part,bucket)| rows — small
    // for global ranks but potentially part-keys×buckets for keyed ones;
    // the equi-join shares the window's (part,__pb) partitioning, and AQE
    // broadcasts it when it is in fact tiny
    withB.join(cumB, part :+ "__pb")
      .withColumn("cum_before",
        col("__cum_b") + sum(col("__w")).over(wWin) - col("__w"))
      .drop("__pb", "__cum_b", "__w")
  }
}
