package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q161-q163 batch: power-iteration convergence on
  * hand-solvable chains (periodic two-cycle, absorbing dangler), TF-IDF
  * cosine identity/disjointness on tiny corpora, and winsorized fences,
  * clip counts and mean invariance on a symmetric fixture.
  */
class StationaryPairsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def eventsFixture(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("markov").toString
    rows.map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/events.parquet")
    tmp
  }

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("cospairs").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("markovStationary: symmetric two-cycle settles at (0.5, 0.5)") {
    // one user alternating a,b,a,b,... → P(a→b)=P(b→a)=1; uniform start
    // (0.5, 0.5) is already stationary despite the period-2 chain
    val tmp = eventsFixture((1L to 8L).map(i =>
      (i, i, 1L, if (i % 2 == 1) "a" else "b", 1.0)))
    try {
      val r = Series.markovStationary(spark, tmp)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      assert(r("a") == 0.5 && r("b") == 0.5)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("markovStationary: dangling state self-loops and absorbs all mass") {
    // a→b observed once; b never appears as a source → explicit self-loop
    // → b is absorbing: π = (0, 1) after the very first iteration
    val tmp = eventsFixture(Seq(
      (1L, 1L, 1L, "a", 1.0), (2L, 2L, 1L, "b", 1.0)))
    try {
      val r = Series.markovStationary(spark, tmp)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      assert(r("a") == 0.0 && r("b") == 1.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("tfidfCosinePairs: identical docs score 1.0, shingle-disjoint docs never pair") {
    val tmp = docsFixture(Seq(
      (1L, "spark table scan filter join"),
      (2L, "spark table scan filter join"),
      (3L, "totally different words here now")))
    try {
      val rows = Dedup.tfidfCosinePairs(spark, tmp).collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("doc_a") == 1L)
      assert(rows(0).getAs[Long]("doc_b") == 2L)
      assert(rows(0).getAs[Double]("cosine") == 1.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("tfidfCosinePairs: rare shared shingles outweigh common ones") {
    // docs 1,2 share a shingle that appears in EVERY doc (idf = ln(1) = 0
    // → weight 0) plus nothing else → dot = 0 → no pair emitted
    val tmp = docsFixture(Seq(
      (1L, "common run of words aaa"),
      (2L, "common run of words bbb"),
      (3L, "common run of words ccc"),
      (4L, "common run of words ddd")))
    try {
      // every pair shares only shingles present in all 4 docs ("common
      // run of", "run of words") with idf 0, or nothing; the per-doc
      // unique tail shingles never match → all cosines are NaN-free 0
      val rows = Dedup.tfidfCosinePairs(spark, tmp).collect()
      assert(rows.isEmpty)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("winsorizedStats pins rank fences, clip counts, and a symmetric mean") {
    // n=20 values 1..20: lo rank = 20·5÷100+1 = 2 → v_lo=2; hi rank =
    // 20·95÷100 = 19 → v_hi=19; one clip each side, and winsorizing a
    // symmetric sample must not move the mean (10.5)
    val tmp = eventsFixture((1L to 20L).map(i => (i, i, 1L, "e", i.toDouble)))
    try {
      val r = Series.winsorizedStats(spark, tmp).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n") == 20L)
      assert(r(0).getAs[Double]("v_lo") == 2.0)
      assert(r(0).getAs[Double]("v_hi") == 19.0)
      assert(r(0).getAs[Long]("n_clipped_lo") == 1L)
      assert(r(0).getAs[Long]("n_clipped_hi") == 1L)
      assert(r(0).getAs[Double]("mean_raw") == 10.5)
      assert(r(0).getAs[Double]("mean_winsor") == 10.5)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("datasetCard: dup rate counts exact text copies, top lang ties break lexicographically") {
    val tmp = java.nio.file.Files.createTempDirectory("card").toString
    try {
      Seq(
        (1L, "a b", "en", "s1"), (2L, "a b", "en", "s2"),
        (3L, "c d e", "de", "s1"), (4L, "f g", "de", "s2"))
        .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val r = PipelinePrep.datasetCard(spark, tmp).collect()(0)
      assert(r.getAs[Long]("n_docs") == 4L)
      assert(r.getAs[Long]("n_sources") == 2L)
      assert(r.getAs[Long]("n_unique_texts") == 3L)
      assert(r.getAs[Long]("n_tokens") == 9L)
      assert(r.getAs[Double]("dup_rate") == 0.25)
      // en and de both have 2 docs → lexicographic tie-break: de
      assert(r.getAs[String]("top_lang") == "de")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("audienceOverlap: hand-built user sets give exact jaccard and overlap") {
    // users by type: a={1,2,3}, b={2,3,4}, c={9}
    val tmp = eventsFixture(Seq(
      (1L, 1L, 1L, "a", 0.0), (2L, 2L, 2L, "a", 0.0), (3L, 3L, 3L, "a", 0.0),
      (4L, 4L, 2L, "b", 0.0), (5L, 5L, 3L, "b", 0.0), (6L, 6L, 4L, "b", 0.0),
      (7L, 7L, 2L, "b", 0.0), // duplicate (user 2, b) must not inflate
      (8L, 8L, 9L, "c", 0.0)))
    try {
      val r = Sessionize.audienceOverlap(spark, tmp)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
      val ab = r(("a", "b"))
      assert(ab.getAs[Long]("n_both") == 2L)
      assert(ab.getAs[Double]("jaccard") == 0.5) // 2 / (3+3-2)
      assert(ab.getAs[Double]("overlap_coef") == 0.666667) // round(2/3, 6)
      // disjoint sets never meet on user_id → no (a, c) row at all
      assert(!r.contains(("a", "c")))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("jackknifeCI: constant values collapse the CI onto the mean") {
    val tmp = eventsFixture((1L to 100L).map(i => (i, i, i, "e", 5.0)))
    try {
      val r = Series.jackknifeCI(spark, tmp).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n") == 100L)
      assert(r(0).getAs[Double]("mean") == 5.0)
      assert(r(0).getAs[Double]("se_jack") == 0.0)
      assert(r(0).getAs[Double]("ci_lo") == 5.0)
      assert(r(0).getAs[Double]("ci_hi") == 5.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("abLift: arm assignment matches driver-side md5 parity; lift is exact on constants") {
    // value = arm-dependent constant → mean_a/mean_b pin the assignment
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val users = (1L to 40L)
    val tmp = eventsFixture(users.map(u =>
      (u, u, u, "e", if (arm(u) == 0) 10.0 else 30.0)))
    try {
      val r = Series.abLift(spark, tmp).collect()(0)
      assert(r.getAs[Long]("n_a") == users.count(arm(_) == 0).toLong)
      assert(r.getAs[Long]("n_b") == users.count(arm(_) == 1).toLong)
      assert(r.getAs[Double]("mean_a") == 10.0)
      assert(r.getAs[Double]("mean_b") == 30.0)
      assert(r.getAs[Double]("lift") == 20.0)
      assert(r.getAs[Double]("rel_lift") == 2.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("funnelLatency: rank-selected quartiles on hand-built stage times") {
    val s = 1000000L // one second in microseconds... ts is NANOS here
    val ns = 1000000000L
    // user 1: view@0, click@10s, purchase@70s; user 2: view@0, click@30s
    val tmp = eventsFixture(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 10 * ns, 1L, "click", 0.0),
      (3L, 70 * ns, 1L, "purchase", 0.0),
      (4L, 0L, 2L, "view", 0.0), (5L, 30 * ns, 2L, "click", 0.0)))
    try {
      val r = Sessionize.funnelLatency(spark, tmp)
        .collect().map(x => x.getString(0) -> x).toMap
      val vc = r("view_to_click")
      assert(vc.getAs[Long]("n_users") == 2L)
      assert(vc.getAs[Double]("p25_sec") == 10.0) // rank ⌈0.5⌉ = 1
      assert(vc.getAs[Double]("median_sec") == 10.0) // lower median
      assert(vc.getAs[Double]("p75_sec") == 30.0) // rank ⌈1.5⌉ = 2
      assert(vc.getAs[Double]("mean_sec") == 20.0)
      val cp = r("click_to_purchase")
      assert(cp.getAs[Long]("n_users") == 1L)
      assert(cp.getAs[Double]("median_sec") == 60.0)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }
}
