package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** q231 [[Similarity.kmeansFixpoint]] and q230
  * [[TextAnalysis.kmvSourceDistinct]] behavioral contracts.
  *
  * The fixpoint's oracle argument is UNROLL EQUALITY: rounds after the
  * round-4 centroid matrix repeats are no-ops, so the early-stopped loop
  * must equal the fixed-cap run row for row — asserted here against
  * [[Similarity.kmeansAssign]] at the same cap, which is exactly what
  * the DuckDB oracle replays.
  */
class FixpointKmeansSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kmeansFixpoint equals the full-cap unroll row-for-row") {
    val (fix, iters) = Similarity.kmeansFixpointWithStats(spark, sf)
    assert(iters >= 1 && iters <= 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(fix) == rows(Similarity.kmeansAssign(spark, sf, 8, 8, dp = 3)))
  }

  test("kmeansFixpoint detects convergence before the cap on sf0.001") {
    // the observability hook: on this corpus the round-4 trajectory
    // settles early — if this starts failing the exit test broke
    val (_, iters) = Similarity.kmeansFixpointWithStats(spark, sf)
    assert(iters < 8, s"no early exit: ran all $iters rounds")
  }

  test("kmvSourceDistinct: under-full sketch estimate IS the exact count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmvdist")
    try {
      val text = (1 to 30).map(i => s"w$i").mkString(" ") // 28 shingles < 128
      Seq((1L, "s1", text)).toDF("doc_id", "source", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = TextAnalysis.kmvSourceDistinct(spark, tmp.toString).collect()
      assert(r.length == 1)
      assert(r.head.getAs[Long]("n_exact") == 28L)
      assert(r.head.getAs[Double]("est_distinct") == 28.0)
      assert(r.head.getAs[Boolean]("within_tol"))
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("kmvSourceDistinct: k=128 estimate lands within ±30% on sf0.001") {
    val rows = TextAnalysis.kmvSourceDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_tol"),
        s"${r.getAs[String]("source")}: est=${r.getAs[Double]("est_distinct")} " +
          s"exact=${r.getAs[Long]("n_exact")}")
    }
  }
}
