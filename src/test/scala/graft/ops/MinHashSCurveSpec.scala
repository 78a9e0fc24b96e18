package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the b×r banding math to its analytic collision probability: for a
  * doc pair with shingle-Jaccard j, each hash's min agrees with
  * probability j, a band of r rows matches with probability jʳ, and any
  * of b bands matches with probability 1 − (1 − jʳ)ᵇ. The test feeds
  * synthetic shingle sets with EXACT Jaccard through the real Spark
  * banding pipeline and checks the empirical candidate rate against the
  * formula. Deterministic: fixed salts, fixed element strings — the
  * "sampling" randomness is md5's behavior on distinct inputs, so the
  * measured rate is a constant of the implementation.
  */
class MinHashSCurveSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("banded signature collision rate follows 1-(1-j^r)^b at j=1/3, 0.6, 0.9") {
    val bands = 4
    val r = 4
    val nPairs = 300
    // (set size n, shared s) -> j = s / (2n - s)
    val cases = Seq((60, 30), (60, 45), (95, 90)) // j = 1/3, 0.6, 0.9
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var pairId = 0
    val pairsOfCase = Array.fill(cases.size)(List.empty[Int])
    cases.zipWithIndex.foreach { case ((n, s), ci) =>
      (0 until nPairs).foreach { _ =>
        val p = pairId; pairId += 1
        pairsOfCase(ci) ::= p
        val shared = (0 until s).map(k => s"p${p}_s$k")
        val aOnly = (0 until n - s).map(k => s"p${p}_a$k")
        val bOnly = (0 until n - s).map(k => s"p${p}_b$k")
        rows ++= (shared ++ aOnly).map(e => (2L * p, e))
        rows ++= (shared ++ bOnly).map(e => (2L * p + 1, e))
      }
    }
    val sigs = Dedup.bandSignatures(rows.toSeq.toDF("doc_id", "sh"), bands, r)
    val hits = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") + 1 === col("y.doc_id") && col("x.doc_id") % 2 === 0)
      .select((col("x.doc_id") / 2).cast("long").as("pair"))
      .distinct().collect().map(_.getLong(0)).toSet

    cases.zipWithIndex.foreach { case ((n, s), ci) =>
      val j = s.toDouble / (2 * n - s)
      val p = 1 - math.pow(1 - math.pow(j, r), bands)
      val pairs = pairsOfCase(ci)
      val rate = pairs.count(q => hits.contains(q.toLong)).toDouble / pairs.size
      val tol = math.max(4 * math.sqrt(p * (1 - p) / pairs.size), 0.04)
      assert(math.abs(rate - p) <= tol,
        f"j=$j%.3f empirical=$rate%.4f analytic=$p%.4f tol=$tol%.4f")
    }
  }
}
