package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking.topKPerGroup must emit EXACTLY the single-window result —
  * including the rn values — on skewed group sizes, duplicate scores,
  * and groups smaller than k. The salt must never leak into the output.
  */
class RankingSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  test("two-phase salted top-k equals the single-window ranking exactly") {
    import spark.implicits._
    // skewed groups: g0 has 10k rows, g1 has 100, g2 has 3 (< k);
    // scores collide heavily so tie-breaking is actually exercised
    val df = spark.range(10103).select(
      when($"id" < 10000, "g0").when($"id" < 10100, "g1").otherwise("g2").as("g"),
      ($"id" % 7).as("score"),
      $"id")
    val single = df
      .withColumn("rn", row_number()
        .over(Window.partitionBy($"g").orderBy($"score".desc, $"id")).cast("long"))
      .filter($"rn" <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (buckets <- Seq(1, 4, 32)) {
      val two = Ranking.topKPerGroup(df, Seq("g"),
          Seq($"score".desc, $"id"), $"id", k = 5, saltBuckets = buckets)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(two == single, s"saltBuckets=$buckets diverged")
    }
  }

  test("no helper columns leak into the output schema") {
    import spark.implicits._
    val df = spark.range(10).select(lit("g").as("g"), $"id")
    val out = Ranking.topKPerGroup(df, Seq("g"), Seq($"id"), $"id", k = 3)
    assert(out.columns.toSet == Set("g", "id", "rn"))
  }

  test("prefixCum + 1 equals row_number exactly: global, keyed, tied, tiny buckets") {
    import spark.implicits._
    // heavy ties in the bucket key (v has 13 distinct values over 5k
    // rows) and a skewed part (g0 holds 96% of rows) — the shapes that
    // break naive bucketing; buckets=7 forces multi-row buckets and a
    // non-trivial cross-bucket prefix
    val df = spark.range(5000).select(
      when($"id" % 25 =!= 0, "g0").otherwise("g1").as("g"),
      ($"id" % 13).as("v"),
      $"id")
    // global rank (part = Nil)
    val globalExp = df.withColumn("rn",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    for (buckets <- Seq(1, 7, 1024)) {
      val got = Ranking.prefixCum(df, Nil, $"v", Seq($"v", $"id"),
          lit(1L), buckets = buckets)
        .collect().map(r => (r.getLong(2), r.getLong(3) + 1)).toMap
      assert(got == globalExp, s"global rank diverged at buckets=$buckets")
    }
    // keyed rank (part = g)
    val keyedExp = df.withColumn("rn",
        row_number().over(Window.partitionBy($"g").orderBy($"v", $"id"))
          .cast("long"))
      .collect().map(r => ((r.getString(0), r.getLong(2)), r.getLong(3))).toMap
    val keyedGot = Ranking.prefixCum(df, Seq("g"), $"v", Seq($"v", $"id"),
        lit(1L), buckets = 7)
      .collect().map(r => ((r.getString(0), r.getLong(2)), r.getLong(3) + 1))
      .toMap
    assert(keyedGot == keyedExp, "keyed rank diverged")
  }

  test("prefixCum weighted sums and degenerate inputs") {
    import spark.implicits._
    // weighted: cum_before must be the sum of earlier weights
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("v", "w")
    val got = Ranking.prefixCum(df, Nil, $"v", Seq($"v"), $"w", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 30L, 4L -> 60L))
    // all rows share one bucket-key value → single bucket, still exact
    val same = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("v", "id")
    val g2 = Ranking.prefixCum(same, Nil, $"v", Seq($"v", $"id"), lit(1L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(g2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // empty input → empty output, no crash on the null min/max stats row
    val empty = spark.range(0).select($"id".as("v"))
    assert(Ranking.prefixCum(empty, Nil, $"v", Seq($"v"), lit(1L)).count() == 0)
  }

  test("topKGlobal equals the global row_number window exactly") {
    import spark.implicits._
    // heavy score ties (id % 7) so the lexicographic tie-break matters;
    // mixed desc/asc order directions
    val df = spark.range(5000)
      .select(($"id" % 7).as("score"), concat(lit("t"), $"id").as("tok"))
    val exp = df.withColumn("rk", row_number()
        .over(Window.orderBy($"score".desc, $"tok")).cast("long"))
      .filter($"rk" <= 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    for (eager <- Seq(true, false)) {
      val got = Ranking
        .topKGlobal(df, Seq("score" -> true, "tok" -> false), 25,
          eager = eager)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == exp, s"eager=$eager diverged from the window ranking")
    }
    // k larger than the input: every row ranked, still exact
    val tiny = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("score", "tok")
    val all = Ranking.topKGlobal(tiny, Seq("score" -> false, "tok" -> false), 10)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(all == Set(("a", 1L), ("b", 2L), ("c", 3L)))
    // empty input → empty output
    assert(Ranking.topKGlobal(
      spark.range(0).select($"id".as("score"), $"id".cast("string").as("tok")),
      Seq("score" -> true, "tok" -> false), 5).count() == 0)
  }

  test("topKGlobal plans TakeOrderedAndProject and builds no Window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = spark.range(5000)
      .select(($"id" % 7).as("score"), concat(lit("t"), $"id").as("tok"))
    val out = Ranking.topKGlobal(df, Seq("score" -> true, "tok" -> false),
      10, eager = false)
    def strip(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val nodes = strip(out.queryExecution.executedPlan).collect {
      case n => n
    }
    assert(nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "the top-k must plan as TakeOrderedAndProject, not a global sort")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "topKGlobal must not introduce any Window")
  }
}
