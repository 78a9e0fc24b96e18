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
}
