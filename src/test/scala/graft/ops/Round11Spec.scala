package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 batch: the PQ codebook operating sweep (q277), the
  * codegen'd pq_encode path it rides, and the q281-q292 TPC-H shape
  * completion (Q2/Q4/Q5/Q6/Q7/Q8/Q9/Q10/Q12/Q14/Q18/Q19).
  */
class Round11Spec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  /** Exact pinned curves assert only on the fixture they were measured
    * on (round-11 ADVICE: a value-preserving fixture regeneration must
    * skip the pins rather than fail them with no code defect; the
    * invariant assertions in the same tests stay unconditional). Hash
    * shared via [[graft.TestFixtures]].
    */
  private def assumePinnedFixture(dir: String): Unit =
    assume(graft.TestFixtures.embeddingsMd5(dir) ==
        graft.TestFixtures.pinnedEmbeddingsMd5,
      "embeddings fixture regenerated — exact pinned curves skipped " +
        "(invariants above still gated; re-pin from the oracle run)")

  test("q277 sweep: Lloyd law holds per arm; finer blocks + more codes reach recall 0.7") {
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.pqCodebookSweep(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getString(2)),
        (r.getLong(4), r.getLong(6)))).toMap
    assert(rows.size == 8, s"expected 4 configs x 2 phases, got ${rows.size}")
    // the Lloyd objective provably never increases: trained <= init in
    // EVERY arm, independent of what recall does
    for ((nb, cd) <- Seq((4L, 8L), (4L, 64L), (16L, 8L), (16L, 64L))) {
      val di = rows((nb, cd, "init"))._2
      val dt = rows((nb, cd, "trained"))._2
      assert(dt <= di, s"Lloyd violated at ($nb, $cd): trained $dt > init $di")
    }
    // more codes at fixed blocks, and finer blocks at fixed codes, both
    // strictly cut the INIT distortion on this corpus (the axis the
    // sweep exists to expose)
    assert(rows((4L, 64L, "init"))._2 < rows((4L, 8L, "init"))._2)
    assert(rows((16L, 8L, "init"))._2 < rows((4L, 8L, "init"))._2)
    assumePinnedFixture(dir)
    // the operating point: (16 blocks x 4 dims, 64 trained codes)
    // measures recall@10 = 0.7 on sf0.01 — the answer to q270/q271's
    // "recall is noise at (4, 8)". Pinned as >= so a better trajectory
    // can't fail the spec, with the exact value cross-checked by the
    // DuckDB oracle row.
    assert(rows((16L, 64L, "trained"))._1 >= 7L,
      s"operating point lost: n_overlap ${rows((16L, 64L, "trained"))._1}")
  }

  test("q186/q196 eval-tier guard: the full-corpus truth arm refuses above the bound") {
    val dir = "/root/testdata/sf0.001"
    val e1 = intercept[IllegalArgumentException] {
      Dedup.dedupEval(spark, dir, maxEvalDocs = 3L).collect()
    }
    assert(e1.getMessage.contains("eval-tier") &&
      e1.getMessage.contains("q222"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.sCurveCheck(spark, dir, maxEvalDocs = 3L).collect()
    }
    assert(e2.getMessage.contains("q223"), e2.getMessage)
    // the sampled twin path never trips the guard, whatever the bound
    assert(Dedup.dedupEval(spark, dir, sampleHexMax = "7f", maxEvalDocs = 3L)
      .count() >= 1L)
    // and at/below the bound the full arm runs as before
    assert(Dedup.dedupEval(spark, dir, maxEvalDocs = 100000L).count() == 1L)
  }

  test("q280 IVF-PQ: cost curve is exact cell accounting; full probe scans everything") {
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L))
    // n_scanned is strictly increasing in nProbe (cells are non-empty
    // on this corpus) and the all-cells arm scans the whole corpus
    // minus the query vector
    val scans = Seq(1L, 2L, 4L, 8L).map(np => rows(np)._1)
    assert(scans == scans.sorted && scans.distinct == scans,
      s"cost curve not strictly increasing: $scans")
    // full probe scans the corpus minus the query vector — derived
    // from the fixture, not pinned (round-12 review: the literal was a
    // fixture property asserting ahead of the fixture gate)
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(scans.last == corpus - 1,
      s"full probe scanned ${scans.last}, corpus minus query is ${corpus - 1}")
    // probing more cells never loses scanned rows (supersets) — the
    // recall VALUES are oracle-gated, not asserted monotone (ADC over a
    // candidate superset can displace true positives; measured and
    // documented in BASELINE.md)
  }

  test("trainedPqRecall is unchanged by the pq_encode rewrite (q271 regression pin)") {
    assumePinnedFixture("/root/testdata/sf0.01")
    val out = Similarity.trainedPqRecall(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(4)))).toMap
    // values pinned from the round-10 oracle-verified run
    assert(out("init") == ((1L, 625107575L)))
    assert(out("trained") == ((2L, 409110134L)))
  }

  // ---- q281-q292: the TPC-H 1..22 completion batch. The DuckDB oracle
  // is the value gate; these tests pin the INVARIANTS each shape owes
  // (the properties a later refactor is most likely to break).

  private val sfSmall = "/root/testdata/sf0.001"

  test("q281: every surviving (part, supplier) carries exactly its part's min cost") {
    val rows = Relational.minCostSupplier(spark, sfSmall).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getLong(0))
    byPart.foreach { case (pk, rs) =>
      val costs = rs.map(_.getLong(4)).distinct
      assert(costs.length == 1, s"part $pk kept non-min ties: ${costs.toSeq}")
    }
  }

  test("q282: five priority classes, each bounded by its order population") {
    val df = Relational.latePriorityCensus(spark, sfSmall)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.forall(Set("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")), rows.keySet)
    val spark2 = spark
    import spark2.implicits._
    val totals = spark.read.parquet(s"$sfSmall/orders.parquet")
      .groupBy($"o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (p, n) =>
      assert(n <= totals(p), s"$p: $n late > ${totals(p)} total")
    }
  }

  test("q289: the two lateness classes partition the 1998 joined lines exactly") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Relational.latenessPriorityCensus(spark, sfSmall).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val joined = spark.read.parquet(s"$sfSmall/lineitem.parquet")
      .filter($"l_shipdate" >= lit("1998-01-01") &&
        $"l_shipdate" < lit("1999-01-01"))
      .join(spark.read.parquet(s"$sfSmall/orders.parquet"),
        $"l_orderkey" === $"o_orderkey").count()
    val covered = rows.values.map(v => v._1 + v._2).sum
    assert(covered == joined, s"classes cover $covered of $joined lines")
  }

  test("q290/q286: conditional sums never exceed their totals; shares consistent") {
    val r = Relational.promoRevenueShare(spark, sfSmall).collect()(0)
    val (promo, total, share) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(promo >= 0L && promo <= total)
    // recompute with the semantics Spark's round(x, 6) actually has
    // (BigDecimal HALF_UP) — math.rint would round half-to-even and
    // split from the operator on an exact .xxxxxx5 boundary
    val expect = BigDecimal(100.0 * promo / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(share == expect, s"share $share != recomputed $expect")
    Relational.nationalMarketShare(spark, sfSmall).collect().foreach { row =>
      assert(row.getLong(1) <= row.getLong(2),
        s"year ${row.getLong(0)}: nation > total")
    }
  }

  test("q291: every large-volume order really exceeds 300 units (recomputed)") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Relational.largeVolumeCustomers(spark, sfSmall).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) > 300L))
    // recompute one order's quantity sum independently of the operator
    val probe = rows.head.getLong(2)
    val expect = spark.read.parquet(s"$sfSmall/lineitem.parquet")
      .filter($"l_orderkey" === probe)
      .agg(sum($"l_quantity".cast("long"))).collect()(0).getLong(0)
    assert(expect == rows.head.getLong(5), s"order $probe: $expect recomputed")
  }

  test("q288: at most 20 customers, revenue non-increasing under the tie-break") {
    val rows = Relational.returnedItemCustomers(spark, sfSmall).collect()
      .map(r => (r.getLong(3), r.getLong(0)))
      .sortBy { case (rev, ck) => (-rev, ck) }
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q293: routing never beats exact, hit iff landed on the NN, curve pinned") {
    val rows = Similarity.graphRouteAnn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 16, s"4 arms x 4 queries expected, got ${rows.length}")
    rows.foreach { r =>
      val (rd2, hops, rid, eid, ed2, hit) = (r.getLong(3), r.getLong(4),
        r.getLong(2), r.getLong(5), r.getLong(6), r.getBoolean(7))
      // greedy descent can stall but can never rank below the true NN
      assert(rd2 >= ed2, s"routed_d2 $rd2 < exact_d2 $ed2")
      assert(hops <= 6L)
      assert(hit == (rid == eid))
      if (hit) assert(rd2 == ed2)
    }
    // the measured operating curve on sf0.01 (oracle-verified): greedy
    // beam-1 stalls at low out-degree, k_out buys hit rate
    assumePinnedFixture("/root/testdata/sf0.01")
    val hitsByK = rows.groupBy(_.getLong(0))
      .view.mapValues(_.count(_.getBoolean(7))).toMap
    assert(hitsByK == Map(4L -> 0, 8L -> 0, 16L -> 2, 32L -> 3),
      s"operating curve moved: $hitsByK")
  }

  test("q294: beam-1 IS q293's greedy arm at the same out-degree; beams pinned") {
    val beam = Similarity.beamRouteAnn(spark, "/root/testdata/sf0.01").collect()
    assert(beam.length == 16, s"4 beams x 4 queries expected, got ${beam.length}")
    // the cross-query law: beam width 1 at k_out=16 must reproduce
    // q293's k_out=16 greedy arm row for row
    val greedy16 = Similarity.graphRouteAnn(spark, "/root/testdata/sf0.01")
      .collect().filter(_.getLong(0) == 16L)
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val b1 = beam.filter(_.getLong(0) == 1L)
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(b1 == greedy16, s"beam-1 $b1 diverged from greedy $greedy16")
    // the frontier keeps its own members as candidates, so the landed
    // distance can never rank below the true NN
    beam.foreach(r => assert(r.getLong(3) >= r.getLong(5)))
    assumePinnedFixture("/root/testdata/sf0.01")
    val hitsByB = beam.groupBy(_.getLong(0))
      .view.mapValues(_.count(_.getBoolean(6))).toMap
    assert(hitsByB == Map(1L -> 2, 2L -> 2, 4L -> 3, 8L -> 3),
      s"beam operating curve moved: $hitsByB")
  }

  test("q285: only the two pair orientations survive, years within the window") {
    val rows = Relational.nationPairVolume(spark, sfSmall).collect()
    rows.foreach { r =>
      val pair = (r.getString(0), r.getString(1))
      assert(pair == ("NATION_3", "NATION_7") || pair == ("NATION_7", "NATION_3"), pair)
      assert(r.getLong(2) == 1996L || r.getLong(2) == 1997L, r.getLong(2))
    }
  }
}
