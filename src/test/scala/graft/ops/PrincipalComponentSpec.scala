package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Power iteration must recover the generating axis of rank-1 data: for
  * x_i = c_i·u the update is proportional to u after ONE round for any
  * start with u·v₀ ≠ 0, so the projections come back as ±c_i to rounding
  * precision — a ground-truth check no DuckDB replay can provide (the
  * oracle only proves both engines walk the same trajectory).
  */
class PrincipalComponentSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  test("rank-1 embeddings project back to their generating coefficients") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pc")
    try {
      val dim = 64
      // unit axis with positive mass on the all-equal start direction
      val u = Array.fill(dim)(0f)
      u(0) = 0.6f; u(1) = 0.8f
      val coefs = Seq(1.0f, -2.0f, 3.0f, 0.5f)
      val embSchema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val rows = new java.util.ArrayList[Row]()
      coefs.zipWithIndex.foreach { case (c, i) =>
        rows.add(Row(i.toLong, u.map(_ * c).toSeq, i))
      }
      spark.createDataFrame(rows, embSchema)
        .coalesce(1).write.parquet(s"$tmp/embeddings.parquet")

      val got = Similarity.principalComponent(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      coefs.zipWithIndex.foreach { case (c, i) =>
        assert(math.abs(got(i.toLong) - c.toDouble) < 1e-2,
          s"vec $i: got ${got(i.toLong)}, want ~$c")
      }
    } finally graft.TestFiles.rmrf(tmp)
  }
}
