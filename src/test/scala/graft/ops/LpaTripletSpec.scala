package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of q170/q171 on controlled geometry: two antipodal
  * clusters of identical vectors land in different SRP buckets (dot < 0
  * flips the plane bits), so the KNN closure has no cross-cluster edges
  * — label propagation must collapse each cluster onto its minimum id,
  * and triplet mining must pick hardest positives/negatives only among
  * bucket-mates, dropping anchors that lack a leg.
  */
class LpaTripletSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** ids 0-2: +e1 (labels 0,0,1); ids 3-5: −e1 (labels 2,2,3). */
  private def antipodalFixture(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("lpa").toString
    val plus = Array(1.0f) ++ Array.fill(63)(0.0f)
    val minus = Array(-1.0f) ++ Array.fill(63)(0.0f)
    Seq(
      (0L, plus.toSeq, 0), (1L, plus.toSeq, 0), (2L, plus.toSeq, 1),
      (3L, minus.toSeq, 2), (4L, minus.toSeq, 2), (5L, minus.toSeq, 3))
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id",
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))
      .coalesce(1).write.parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("labelPropagation collapses antipodal clusters onto their min ids") {
    val tmp = antipodalFixture()
    try {
      val r = Graph.labelPropagation(spark, tmp)
        .collect().map(x => x.getLong(0) -> x).toMap
      assert(r.keySet == Set(0L, 3L))
      assert(r(0L).getAs[Long]("n_members") == 3L)
      assert(r(0L).getAs[Long]("min_member") == 0L)
      assert(r(3L).getAs[Long]("n_members") == 3L)
      assert(r(3L).getAs[Long]("min_member") == 3L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("tripletMining: bucket-local legs, anchors without a leg drop out") {
    val tmp = antipodalFixture()
    try {
      val rows = Similarity.tripletMining(spark, tmp)
        .collect().map(x => x.getLong(0) -> x).toMap
      // anchors 2 and 5 have no same-label bucket-mate → no triplet
      assert(!rows.contains(2L) && !rows.contains(5L))
      val a0 = rows(0L)
      assert(a0.getAs[Long]("pos_id") == 1L)
      assert(a0.getAs[Double]("pos_cos") == 1.0)
      assert(a0.getAs[Long]("neg_id") == 2L)
      assert(a0.getAs[Double]("neg_cos") == 1.0)
      assert(a0.getAs[Double]("gap") == 0.0)
      assert(a0.getAs[Boolean]("margin_violation"))
      // negatives never cross buckets: anchor 3's negative is 5, not 2
      assert(rows(3L).getAs[Long]("neg_id") == 5L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }
}
