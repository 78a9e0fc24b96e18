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
}
