package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The convergence-detected graph variants must equal their fixed-round
  * counterparts run to the same cap (converged rounds are provably
  * no-ops, so early exit can never change the answer), and the test
  * graph must actually converge below the cap — otherwise the spec is
  * only testing the cap, not the fixpoint.
  */
class GraphFixpointSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def coreRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("kCoreFixpoint equals the fixed-round peel at the cap, and converges below it") {
    val fix = coreRows(Graph.kCoreFixpoint(spark, sf, maxRounds = 12))
    assert(fix == coreRows(Graph.kCore(spark, sf, rounds = 12)),
      "early exit changed the answer")
    // stability: one more fixed round changes nothing — the peel
    // actually converged within the cap on this graph
    assert(fix == coreRows(Graph.kCore(spark, sf, rounds = 13)),
      "test graph did not converge within the cap")
    assert(fix.exists(_._2), "expected a non-empty 2-core")
    assert(fix.exists(!_._2), "expected pruned nodes")
  }

  test("BFS at the exhaustion cap is stable: deeper caps add nothing") {
    val lv20 = Graph.bfsLevels(spark, sf, maxDepth = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val lv25 = Graph.bfsLevels(spark, sf, maxDepth = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(lv20 == lv25, "frontier was not exhausted by depth 20")
    // the early-exit actually fired well below the cap: the deepest
    // reached level is far under 20 on the KNN graph
    assert(lv20.filter(_._1 >= 0).map(_._1).max < 20)
  }
}
