package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 optimization gates: the in-session memo sharing must (a)
  * actually HIT — a second invocation may not persist new RDDs (the
  * Round12Spec index-memo discipline applied to the new dedup/KNN
  * memos) — and (b) preserve values against the UNCACHED spelling,
  * including the central threshold-filter law that lets q186/q16 serve
  * from the one τ=0.05 exact-pair table.
  */
class Round13OptSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("dedup memos hit: second candidate/pair/KNN invocations add no persisted RDDs") {
    // first calls build (and may persist the shared tables)
    val c1 = rows(Dedup.minhashCandidates(spark, sf))
    val p1 = rows(Dedup.jaccardPairs(spark, sf))
    val k1 = rows(Similarity.knnGraph(spark, sf))
    val before = persistedIds
    val c2 = rows(Dedup.minhashCandidates(spark, sf))
    val p2 = rows(Dedup.jaccardPairs(spark, sf))
    val k2 = rows(Similarity.knnGraph(spark, sf))
    assert(persistedIds == before,
      s"second invocations persisted new RDDs: " +
        s"${(persistedIds -- before).toSeq.sorted} — a memo missed")
    assert(c1 == c2 && p1 == p2 && k1 == k2)
  }

  test("threshold-filter law: jaccardPairs(τ) == uncached direct computation at τ, for τ above the memo's 0.05") {
    // the memo path serves pairs(τ) as pairs(0.05).filter(rounded j ≥ τ);
    // the law must hold against the UNCACHED spelling for a τ where the
    // prefix pruning genuinely differs (0.5 ⇒ much shorter PPJoin
    // prefixes than 0.05)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    for (tau <- Seq(0.05, 0.3, 0.5)) {
      val memoServed = rows(Dedup.jaccardPairs(spark, sf, tau))
      val direct = rows(Dedup.jaccardPairsOf(spark, d, tau))
      assert(memoServed == direct,
        s"pairs(τ=$tau) diverges between the memo-served filter and the " +
          s"direct computation: ${memoServed.size} vs ${direct.size} rows")
    }
  }

  test("keeper-table sharing: q39 and q88 values match their pre-sharing spellings") {
    // q39/q88 now project one memoized joined table; their values must
    // equal independent recomputations through the public API (which
    // hits the memo) AND stay internally consistent: every q88 pair's
    // jaccard appears identically in the unfiltered q39 view
    val j = Dedup.dedupedJaccardPairs(spark, sf, minJaccard = 0.0)
    val c = Dedup.containmentPairs(spark, sf, minContainment = 0.0)
    val jm = j.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    c.collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(jm.get(k).contains(r.getDouble(3)),
        s"pair $k: containment view jaccard ${r.getDouble(3)} != " +
          s"jaccard view ${jm.get(k)}")
    }
  }
}
