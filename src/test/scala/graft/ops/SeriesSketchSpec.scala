package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q111-q115 batch: Morton interleave golden vectors,
  * the run-length gap-fill against an independent grid+ffill derivation,
  * the decay score against a driver-side recompute, and the bloom
  * sketch's no-false-negative guarantee.
  */
class SeriesSketchSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("interleave16 matches hand-computed Morton codes") {
    val rows = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (1L, 2L))
    // reference: bit-by-bit interleave in plain Scala
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val got = rows.toDF("x", "y")
      .select(graft.sources.Layouts.interleave16($"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == rows.map { case (x, y) => morton(x, y) })
    assert(morton(5L, 3L) == 27L) // 101 ⨯ 011 → 011011
  }

  test("zorder buckets bound BOTH dims by construction (>>20 leaves 10 bits/dim)") {
    // sf0.01: custkey range (1499) exceeds the 1024 zorder extent, so
    // the "z-order beats date-order on x" inequality is exercised
    val r = graft.sources.Layouts.zorderLocality(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(r.keySet == Set("zorder", "dateorder", "keyorder"))
    assert(r("zorder").getAs[Long]("max_x_span") <= 1023L)
    assert(r("zorder").getAs[Long]("max_y_span") <= 1023L)
    assert(r("dateorder").getAs[Long]("max_y_span") <= 15L) // y>>4 buckets
    // the x-dim win over date-sorted buckets only materializes once the
    // custkey range exceeds the 10-bit zorder extent (sf0.01+; at
    // sf0.001 custkey tops out at 149 and every layout is "tight")
    val custRange = spark.read.parquet(s"$sf/orders.parquet")
      .agg(max($"o_custkey")).head().getLong(0)
    if (custRange > 1024L)
      assert(r("dateorder").getAs[Long]("max_x_span") >
        r("zorder").getAs[Long]("max_x_span"))
  }

  test("eventGapfill equals the naive grid + forward-fill derivation") {
    val got = Sessionize.eventGapfill(spark, sf)
    // independent derivation: materialized grid, left join, last() ffill
    val daily = graft.ops.Tables.eventsNs(spark, sf)
      .select($"user_id", expr("ts div 86400000000000").as("day"), $"value")
      .groupBy($"user_id", $"day").agg(sum($"value").as("v"))
    val grid = daily.groupBy($"user_id")
      .agg(min($"day").as("lo"), max($"day").as("hi"))
      .select($"user_id", explode(sequence($"lo", $"hi")).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("carried", last($"v", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg((max($"day") - min($"day") + 1).as("span_days"),
        count($"v").as("active_days"),
        (count(lit(1)) - count($"v")).as("filled_days"),
        round(sum($"carried"), 4).as("filled_sum"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("decayedEngagement matches a driver-side recompute") {
    val rows = {
      graft.ops.Tables.eventsNs(spark, sf)
        .select($"user_id", expr("ts div 1000000000").as("sec"), $"value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val t0 = rows.map(_._2).max
    val want = rows.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong,
        BigDecimal(es.map { case (_, s, v) =>
          v * math.exp(-((t0 - s) / 86400.0) / 7.0)
        }.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = Sessionize.decayedEngagement(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("bloom probe admits every inserted key (no false negatives)") {
    graft.functions.SketchOps.register(spark)
    val hot = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
    val bf = hot.agg(call_function("bloom_agg", xxhash64($"o_orderkey"),
      lit(65536L), lit(1048576L))).head().getAs[Array[Byte]](0)
    val dropped = hot.filter(
      !call_function("bloom_contains", lit(bf), xxhash64($"o_orderkey")))
    assert(dropped.count() == 0)
    val row = Relational.bloomPrune(spark, sf).head()
    assert(row.getAs[Boolean]("superset_ok"))
    assert(row.getAs[Boolean]("fp_ok"))
  }
}
