package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q127-q132 batch: OOV accounting against a
  * hand-ranked vocabulary, split-assignment determinism and range
  * discipline, Markov transition rows against a hand-walked stream,
  * frame-manifest values against a byte-level recompute, vocabulary
  * growth rungs, and LSH purity invariants vs a direct recount.
  */
class CurationOpsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def docsFixture(rows: Seq[(Long, String, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("vocabOov: rank-k boundary is deterministic; OOV occurrences and types add up") {
    // counts: a=4, b=3, c=2, d=1 → k=2 vocab {a, b}
    val tmp = docsFixture(Seq(
      (1L, "a a b c", "en", "s"),
      (2L, "a b c d", "en", "s"),
      (3L, "a b", "fr", "s")))
    try {
      val r = TextAnalysis.vocabOov(spark, tmp, k = 2)
        .collect().map(x => x.getString(0) -> x).toMap
      assert(r("en").getAs[Long]("n_tokens") == 8L)
      assert(r("en").getAs[Long]("n_oov") == 3L) // c, c, d
      assert(r("en").getAs[Long]("n_oov_types") == 2L)
      assert(r("en").getAs[Double]("oov_rate") == 0.375)
      assert(r("fr").getAs[Long]("n_oov") == 0L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("splitAssign: buckets honor split ranges, totals partition the corpus, re-run identical") {
    val a = PipelinePrep.splitAssign(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == total)
    for (row <- a) {
      val (lo, hi) = (row.getAs[Long]("lo_bucket"), row.getAs[Long]("hi_bucket"))
      row.getAs[String]("split") match {
        case "train" => assert(lo >= 0 && hi < 80)
        case "val"   => assert(lo >= 80 && hi < 90)
        case "test"  => assert(lo >= 90 && hi < 100)
      }
    }
    // determinism: the whole point of hash-based splits
    val b = PipelinePrep.splitAssign(spark, sf).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("transitionMatrix matches a hand-walked stream; probabilities sum to 1 per type") {
    val dayNs = 86400000000000L
    val tmp = java.nio.file.Files.createTempDirectory("trans").toString
    try {
      // user 1: v -> c -> v -> p ; user 2: v -> c  (transitions: v→c ×2, c→v, v→p)
      Seq((1L, 1L, 1L, "v", 1.0, "{}"), (2L, 2L, 1L, "c", 1.0, "{}"),
        (3L, 3L, 1L, "v", 1.0, "{}"), (4L, 4L, 1L, "p", 1.0, "{}"),
        (5L, dayNs, 2L, "v", 1.0, "{}"), (6L, dayNs + 1, 2L, "c", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$tmp/events.parquet")
      val got = Series.transitionMatrix(spark, tmp)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got == Map(
        ("v", "c") -> (2L, 0.666667), ("v", "p") -> (1L, 0.333333),
        ("c", "v") -> (1L, 1.0)))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("frameManifest equals a byte-level recompute of chunks and signatures") {
    // doc_id 2 -> video; 200 chars -> chunks 0..3 (64,64,64,8), stride 2 keeps 0,2
    val text = ("spark " * 40).trim.take(200)
    val tmp = docsFixture(Seq((2L, text, "en", "s"), (3L, "not video", "en", "s")))
    try {
      val r = graft.multimodal.Multimodal.frameManifest(spark, tmp).collect()
      assert(r.length == 1 && r.head.getAs[Long]("media_id") == 2L)
      assert(r.head.getAs[Long]("n_frames") == 2L)
      assert(r.head.getAs[Long]("frame_bytes") == 128L) // 64 + 64
      assert(r.head.getAs[Long]("last_idx") == 2L)
      val md = java.security.MessageDigest.getInstance("MD5")
      def sig(s: String): Long = java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
      val want = sig(text.substring(0, 64)) + sig(text.substring(128, 192))
      assert(r.head.getAs[Long]("sig_sum") == want)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("vocabGrowth: rungs accumulate to the full vocabulary; docs_seen is 2^(c+1)-1") {
    val tmp = docsFixture(Seq(
      (0L, "a b", "en", "s"),      // first_doc+1 = 1 → rung 0: a, b
      (1L, "a c", "en", "s"),      // c → rung 1
      (2L, "d", "en", "s"),        // d → rung 1 (first_doc+1 = 3)
      (6L, "e", "en", "s")))       // e → rung 2 (first_doc+1 = 7)
    try {
      val r = TextAnalysis.vocabGrowth(spark, tmp)
        .collect().map(x => x.getLong(0) ->
          (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
      assert(r == Map(
        0L -> (2L, 2L, 1L), 1L -> (2L, 4L, 3L), 2L -> (1L, 5L, 7L)))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("lshLabelPurity: buckets partition the corpus; majority recount agrees") {
    val got = Similarity.lshLabelPurity(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == total)
    for (r <- got) {
      assert(r.getAs[Long]("majority_n") <= r.getAs[Long]("n_vecs"))
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
    }
    assert(got.map(_.getAs[Long]("bucket")).distinct.length == got.length)
  }

  test("tokenEntropy: run-length fold matches closed forms and a naive recompute") {
    val tmp = docsFixture(Seq(
      (1L, "a a a a", "en", "s"),          // all same → entropy 0
      (2L, "a b c d", "en", "s"),          // uniform over 4 → ln 4
      (3L, "a a b", "en", "s"),            // 2/3, 1/3 mix
      (4L, "x", "en", "s")))               // single token → 0, norm null
    try {
      val r = Mapped(TextAnalysis.tokenEntropy(spark, tmp))
      assert(r(1L)._3 == 0.0)
      assert(math.abs(r(2L)._3 - math.log(4)) < 1e-4)
      val expected3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
      assert(math.abs(r(3L)._3 - expected3) < 1e-4)
      assert(r(3L)._1 == 3L && r(3L)._2 == 2L)
      assert(r(4L)._3 == 0.0 && r(4L)._4.isEmpty)
      // normalized entropy: uniform doc hits exactly 1
      assert(math.abs(r(2L)._4.get - 1.0) < 1e-6)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
    // corpus-wide invariants at sf0.001: 0 ≤ H ≤ ln(types) + eps
    for (x <- TextAnalysis.tokenEntropy(spark, sf).collect()) {
      val h = x.getAs[Double]("entropy")
      val types = x.getAs[Long]("n_types")
      assert(h >= 0.0 && h <= math.log(types.toDouble) + 1e-4, s"doc ${x.getLong(0)}")
    }
  }

  private def Mapped(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Double, Option[Double])] =
    df.collect().map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getDouble(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap

  test("vocabGini: uniform frequencies score 0; extreme skew approaches 1; bounded") {
    val tmp = docsFixture(Seq(
      (1L, "a b c d", "en", "flat"),       // every type once → gini 0
      (2L, ("x " * 99).trim + " y", "en", "skew"))) // 99 vs 1
    try {
      val g = TextAnalysis.vocabGini(spark, tmp).collect()
        .map(x => x.getString(0) -> x.getAs[Double]("gini")).toMap
      assert(g("flat") == 0.0)
      // two types, f = (1, 99): gini = 2*(1*1+2*99)/(2*100) - 3/2 = 0.49
      assert(math.abs(g("skew") - 0.49) < 1e-9)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
    for (x <- TextAnalysis.vocabGini(spark, sf).collect()) {
      val gini = x.getAs[Double]("gini")
      assert(gini >= 0.0 && gini < 1.0, s"source ${x.getString(0)}")
      assert(x.getAs[Long]("n_tokens") >= x.getAs[Long]("n_types"))
    }
  }
}
