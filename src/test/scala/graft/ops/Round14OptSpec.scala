package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization gates.
  *
  *  1. The sampled-table subset laws: the q222/q223 tables over an md5
  *     doc sample are pure per-doc / per-pair functions of the member
  *     documents' shingle sets, so serving them by FILTERING the
  *     memoized ff tables must be value-identical to the uncached
  *     sampled build — checked on BOTH code paths (opportunistic serve
  *     with the ff memos hot; native build on a cold cache).
  *  2. The keeper-join skew split: the df-adaptive grid decomposition
  *     of the heavy shingles' pair blocks must emit exactly the plain
  *     self-join's rows (q39/q88 feed on the grouped counts).
  */
class Round14OptSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // the sampleDocs predicate, spelled independently of Dedup's helper
  private def sampled(d: org.apache.spark.sql.DataFrame, hexMax: String) =
    d.filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= lit(hexMax))

  test("sampled-table subset laws: ff-filtered serve equals the uncached sampled build") {
    import spark.implicits._
    // make the ff entries hot so the sampled accessors take the
    // opportunistic filter-serve branch
    Dedup.minhashSignatures(spark, sf).collect()
    Dedup.minhashCandidates(spark, sf).collect()
    Dedup.jaccardPairs(spark, sf).collect()
    val d7 = sampled(spark.read.parquet(s"$sf/documents.parquet"), "7f")
    // mins: doc-subset invariance
    val minsServed = rows(Dedup.minsTable16(spark, sf, "7f"))
    val minsDirect = rows(Dedup.rowMins(Dedup.shingleRowsOf(d7), 16))
    assert(minsServed == minsDirect,
      s"mins16/7f diverges: ${minsServed.size} vs ${minsDirect.size} rows")
    // candidates: pairwise subset law
    val candServed = rows(Dedup.bandCandidates44(spark, sf, "7f"))
    val candDirect = rows(Dedup.candidatePairs(
      Dedup.bandSignatures(Dedup.shingleRowsOf(d7), 4, 4)))
    assert(candServed == candDirect,
      s"bandCandidates44/7f diverges: ${candServed.size} vs ${candDirect.size}")
    // exact pairs: pairwise subset law against the uncached spelling
    val pairServed = rows(Dedup.exactPairTable(spark, sf, "7f"))
    val pairDirect = rows(Dedup.jaccardPairsOf(spark, d7, 0.05))
    assert(pairServed == pairDirect,
      s"exactPairTable/7f diverges: ${pairServed.size} vs ${pairDirect.size}")
  }

  test("sampled-table native path (cold cache) equals the uncached sampled build") {
    import spark.implicits._
    // fresh corpus dir → fresh fingerprint → cold memos: the sampled
    // accessors must take the native build (a sampled-only 100-TB
    // workload must never trigger a full-corpus build), with the same
    // values
    val tmp = java.nio.file.Files.createTempDirectory("r14_sampled_").toString
    spark.read.parquet(s"$sf/documents.parquet").write
      .mode("overwrite").parquet(s"$tmp/documents.parquet")
    val d7 = sampled(spark.read.parquet(s"$tmp/documents.parquet"), "7f")
    val pairNative = rows(Dedup.exactPairTable(spark, tmp, "7f"))
    val pairDirect = rows(Dedup.jaccardPairsOf(spark, d7, 0.05))
    assert(pairNative == pairDirect,
      s"native exactPairTable/7f diverges: ${pairNative.size} vs ${pairDirect.size}")
    val minsNative = rows(Dedup.minsTable16(spark, tmp, "7f"))
    val minsDirect = rows(Dedup.rowMins(Dedup.shingleRowsOf(d7), 16))
    assert(minsNative == minsDirect)
  }

  test("fixpoint rounds run ONE standalone driver action each (lazy checkpoint + count merge)") {
    // warm the KNN edge memo so only the loop's own jobs are counted,
    // then count Spark jobs across a full pagerank fixpoint: per round
    // the lazy local checkpoint must be materialized BY the convergence
    // count — ONE action per round. Under AQE every shuffle-stage
    // materialization is its own job, so the measured shape is ~8
    // jobs/round (measured 92 for 12 rounds on this fixture); the bound
    // pins against a recompute-chain regression (an un-cut lineage or a
    // lost cache re-runs prior rounds per action and multiplies the
    // count), with slack for stage-count variation.
    Graph.pageRankFixpoint(spark, sf).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val iters =
      try {
        val (df, it) = Graph.pageRankFixpointWithStats(spark, sf)
        df.collect()
        // listenerBus is private[spark] — the same reflective drain the
        // bench uses, degrading to a bounded sleep
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        } catch { case _: Throwable => Thread.sleep(500L) }
        it
      } finally spark.sparkContext.removeSparkListener(listener)
    val n = jobs.get
    info(s"pagerank fixpoint: $iters rounds, $n jobs")
    assert(n <= 11 * iters + 12,
      s"$n jobs for $iters rounds — a per-round recompute chain appeared")
  }

  test("keeper pair grid: heavy-shingle decomposition emits exactly the plain join's rows") {
    import spark.implicits._
    // 300 distinct docs sharing one boilerplate shingle (df = 300),
    // plus light shingles with small overlaps — both branches of
    // keeperPairRows must produce identical grouped counts. dfCap is
    // forced low so the grid branch runs on the fixture.
    val sh = spark.range(300).select($"id".as("doc_id"))
      .select($"doc_id", explode(array(
        lit(999999L),                         // the heavy shingle
        $"doc_id" % 7L,                        // light, df ≈ 43 > dfCap=8… also heavy at cap 8
        $"doc_id" + 10000L                     // unique, df = 1
      )).as("sh"))
    def grouped(pairs: org.apache.spark.sql.DataFrame): Seq[String] =
      rows(pairs.groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("c")))
    val plain = grouped(sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
    val grid = grouped(Dedup.keeperPairRows(sh, dfCap = 8, buckets = 4))
    assert(grid == plain,
      s"grid decomposition diverges: ${grid.size} vs ${plain.size} pair rows")
    // and the measured-statistic branch: a high cap keeps the plain plan
    val plainBranch = grouped(Dedup.keeperPairRows(sh, dfCap = 1000))
    assert(plainBranch == plain)
  }
}
