package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The six retrieval/corpus-statistics operators added after the q85
  * baseline (BM25, source KL divergence, containment pairs, char
  * profile, cross-source dup matrix, winnowing fingerprints) checked
  * against naive in-JVM references on synthetic corpora with known
  * structure — subset-copies for containment, skewed vocabularies for
  * divergence, repeated spans for winnowing. The DuckDB oracle gates
  * the real corpus; this gates the SEMANTICS on adversarial shapes.
  */
class RetrievalStatsPropSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def corpusDir(docs: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rsprop").toString
    docs.toDF("doc_id", "text", "source")
      .select($"doc_id", $"text", org.apache.spark.sql.functions.lit("en").as("lang"),
        $"source",
        org.apache.spark.sql.functions.length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(s: String): Seq[String] = s.split(" ", -1).toSeq

  private def shingles(s: String): Set[String] = {
    val t = toks(s)
    if (t.length < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
  }

  // a tiny vocabulary corpus with a subset-copy pair and a skewed source
  private val corpus: Seq[(Long, String, String)] = {
    val big = (1 to 40).map(i => s"w${i % 7} common text block unit ${i % 5}")
      .mkString(" ")
    val small = big.split(" ", -1).take(18).mkString(" ") // prefix ⊂ big
    Seq(
      (1L, big, "srcA"),
      (2L, small, "srcB"),
      (3L, "spark join window spark join filter group table spark", "srcA"),
      (4L, "join window join window join window join table scan", "srcB"),
      (5L, "rare vocabulary entirely disjoint tokens here appear once only", "srcC"),
      (6L, big, "srcC"), // byte-identical to 1 → collapsed by exact dedup
      (7L, "spark spark spark spark spark join join join window window", "srcA"))
  }

  test("bm25: scores match the textbook formula; ranking is score-desc") {
    val dir = corpusDir(corpus)
    try {
      val terms = Seq("spark", "join", "window")
      val docsT = corpus.map { case (id, tx, _) => id -> toks(tx) }
      val n = docsT.size
      val avgdl = docsT.map(_._2.length).sum.toDouble / n
      val dfm = terms.map(t => t -> docsT.count(_._2.contains(t))).toMap
      def score(t: Seq[String]): Double = terms.map { term =>
        val tf = t.count(_ == term).toDouble
        if (tf == 0) 0.0
        else math.log((n - dfm(term) + 0.5) / (dfm(term) + 0.5) + 1.0) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * t.length / avgdl))
      }.sum
      val expect = docsT.map { case (id, t) => id -> score(t) }.toMap
      val got = TextAnalysis.bm25TopK(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val positives = expect.count(_._2 > 0)
      assert(got.length == math.min(15, positives))
      got.foreach { case (id, nt, s) =>
        assert(nt == docsT.toMap.apply(id).length.toLong)
        assert(math.abs(s - expect(id)) < 1e-6, s"doc $id: $s vs ${expect(id)}")
      }
      // descending by rounded score, doc_id tie-break
      val keys = got.map { case (id, _, s) => (-s, id) }
      assert(keys.sameElements(keys.sorted), got.mkString(", "))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("source divergence: KL(source ‖ corpus) matches the naive sum; identical-mix source ≈ 0") {
    val dir = corpusDir(corpus)
    try {
      val words = corpus.flatMap { case (_, tx, src) => toks(tx).map(src -> _) }
      val corpusCounts = words.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val tc = words.size.toDouble
      val bySrc = words.groupBy(_._1)
      val expect = bySrc.map { case (src, ws) =>
        val cnt = ws.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
        val ts = ws.size.toDouble
        val kl = cnt.map { case (w, c) =>
          (c / ts) * math.log((c / ts) / (corpusCounts(w) / tc))
        }.sum
        src -> (ws.size.toLong, cnt.size.toLong, kl)
      }
      val got = TextAnalysis.sourceDivergence(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got.keySet == expect.keySet)
      expect.foreach { case (src, (nt, ntyp, kl)) =>
        val (gnt, gntyp, gkl) = got(src)
        assert(gnt == nt && gntyp == ntyp, s"$src counts")
        assert(math.abs(gkl - kl) < 5e-4, s"$src kl: $gkl vs $kl")
      }
      // a synthetic corpus where one source IS the corpus mix: KL must be 0
      val uniform = Seq(
        (1L, "a b c d", "s1"), (2L, "a b c d", "s2"))
      val udir = corpusDir(uniform)
      try {
        val ukl = TextAnalysis.sourceDivergence(spark, udir)
          .collect().map(r => r.getDouble(3))
        ukl.foreach(v => assert(math.abs(v) < 1e-9, v))
      } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(udir))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("containment: prefix-subset doc scores containment ≈ 1 with low jaccard; partial_dup fires") {
    val dir = corpusDir(corpus)
    try {
      // naive reference over exact-dedup keepers (min doc_id per text)
      val keepers = corpus.groupBy(_._2).map { case (_, xs) => xs.minBy(_._1) }
        .map { case (id, tx, _) => id -> shingles(tx) }.toMap
      val expect = (for {
        (a, sa) <- keepers; (b, sb) <- keepers if a < b
        common = (sa & sb).size if common > 0
        ca = common.toDouble / sa.size
        cb = common.toDouble / sb.size
        if math.max(ca, cb) >= 0.5
      } yield (a, b) -> (common.toLong, common.toDouble / (sa.size + sb.size - common),
        ca, cb)).toMap
      val got = Dedup.containmentPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
        .toMap
      assert(got.keySet == expect.keySet, s"${got.keySet} vs ${expect.keySet}")
      expect.foreach { case (k, (common, j, ca, cb)) =>
        val (gc, gj, gca, gcb, gpd) = got(k)
        assert(gc == common, s"$k common")
        assert(math.abs(gj - j) < 1e-6 && math.abs(gca - ca) < 1e-6 &&
          math.abs(gcb - cb) < 1e-6, s"$k values")
        assert(gpd == (math.max(gca, gcb) >= 0.9 && gj < 0.8), s"$k flag")
      }
      // the engineered prefix-subset pair must be present and flagged
      val sub = got((1L, 2L))
      assert(sub._4 >= 0.9 && sub._2 < 0.8 && sub._5,
        s"subset pair not flagged: $sub")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("char profile: ratios and entropy match naive; uniform text maxes entropy") {
    val astral = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    val dir = corpusDir(Seq(
      (1L, "aabb 1199", "s"),
      (2L, "abcdefgh", "s"), // 8 distinct chars → H = ln 8
      (3L, "zzzzzzzz", "s"), // 1 char → H = 0
      (4L, "", "s"), // empty: zero counts, null ratios/entropy
      (5L, astral + astral, "s"))) // surrogate pairs count as ONE char
    try {
      // getDouble throws on null fields — collect the non-empty docs
      // here, the all-null empty-doc row separately below
      val got = TextAnalysis.charClassProfile(spark, dir)
        .filter("n_chars > 0")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6))).toMap
      def ref(s: String) = {
        val cnt = s.groupBy(identity).view.mapValues(_.length).toMap
        val n = s.length.toDouble
        val h = math.log(n) - cnt.values.map(c => c * math.log(c.toDouble)).sum / n
        (s.length.toLong, cnt.size.toLong,
          cnt.getOrElse(' ', 0) / n, s.count(c => c >= '0' && c <= '9') / n,
          s.count(c => c >= 'a' && c <= 'z') / n, h)
      }
      Seq(1L -> "aabb 1199", 2L -> "abcdefgh", 3L -> "zzzzzzzz").foreach {
        case (id, s) =>
          val (n, d, sp, dg, al, h) = ref(s)
          val (gn, gd, gsp, gdg, gal, gh) = got(id)
          assert(gn == n && gd == d, s"doc $id counts")
          assert(math.abs(gsp - sp) < 1e-6 && math.abs(gdg - dg) < 1e-6 &&
            math.abs(gal - al) < 1e-6, s"doc $id ratios")
          assert(math.abs(gh - h) < 5e-4, s"doc $id entropy $gh vs $h")
      }
      assert(math.abs(got(2L)._6 - math.log(8.0)) < 5e-4)
      assert(got(3L)._6 == 0.0)
      // the empty doc is EMITTED with zero counts and null stats (the
      // oracle totals over documents identically)
      val emptyRow = TextAnalysis.charClassProfile(spark, dir)
        .filter("doc_id = 4").collect().head
      assert(emptyRow.getLong(1) == 0L && emptyRow.getLong(2) == 0L)
      (3 to 6).foreach(i => assert(emptyRow.isNullAt(i), s"field $i"))
      // code-point iteration: two identical astral chars are n_chars=2,
      // one distinct key, entropy exactly 0 — never the negative value
      // UTF-16-unit counting would produce
      assert(got(5L)._1 == 2L && got(5L)._2 == 1L && got(5L)._6 == 0.0, got(5L))
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("cross-source dups: rollup equals candidates joined to sources") {
    val dir = corpusDir(corpus)
    try {
      val srcOf = corpus.map { case (id, _, s) => id -> s }.toMap
      val cand = Dedup.minhashCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cand.nonEmpty, "corpus engineered to produce candidates")
      val expect = cand.map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val got = Dedup.crossSourceDups(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expect, s"$got vs $expect")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("perplexity buckets: thresholds are per-lang quartiles; buckets partition each lang") {
    // two "languages" with disjoint score profiles via distinct vocab mix
    // rare-word count strictly increases per doc, so every doc in a lang
    // has a distinct score and the quartiles genuinely partition
    val docs = (0 until 12).map { i =>
      val rare = Seq.fill(i)("rareword").mkString(" ")
      (i.toLong, s"common tokens shared by all docs $rare".trim, s"s")
    }
    val dir = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ppx").toString
      import org.apache.spark.sql.functions.{length, lit, when => w}
      docs.toDF("doc_id", "text", "source")
        .select($"doc_id", $"text",
          w($"doc_id" % 2 === 0, "en").otherwise("de").as("lang"),
          $"source", length($"text").cast("long").as("n_chars"))
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      tmp
    }
    try {
      val rows = TextAnalysis.perplexityBuckets(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      assert(rows.length == docs.length)
      // within each lang: every head score <= every middle score <= every
      // tail score, and head/tail are nonempty (quartiles partition)
      rows.groupBy(_._2).foreach { case (lang, rs) =>
        val by: Map[String, Seq[Double]] =
          rs.groupBy(_._4).view.mapValues(_.map(_._3).toSeq).toMap
        assert(by.contains("head") && by.contains("tail"), s"$lang: $by")
        for (h <- by.getOrElse("head", Seq.empty); m <- by.getOrElse("middle", Seq.empty))
          assert(h <= m, s"$lang head $h > middle $m")
        for (m <- by.getOrElse("middle", Seq.empty); t <- by.getOrElse("tail", Seq.empty))
          assert(m <= t, s"$lang middle $m > tail $t")
        // head is the bottom quartile: at most half the lang's docs
        // (ties can inflate it past the exact 25%)
        assert(by("head").size <= rs.length / 2 + 1, s"$lang head too big")
      }
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("winnowing candidates: pairs equal the naive shared-fingerprint counts; long overlap is caught") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared four five six", "s"),
      (2L, s"seven eight nine $shared ten eleven twelve", "s"),
      (3L, "totally unrelated content with no overlap at all here", "s"))
    val dir = corpusDir(docs)
    try {
      def fpSet(s: String): Set[Long] = {
        val t = toks(s)
        if (t.length < 3) return Set.empty
        val gh = t.sliding(3).map(g => java.lang.Long.parseLong(
          md5hex(g.mkString(" ")).take(8), 16)).toSeq
        if (gh.length < 4) Set.empty else gh.sliding(4).map(_.min).toSet
      }
      val sets = docs.map { case (id, tx, _) => id -> fpSet(tx) }.toMap
      val expect = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        shared = (sa & sb).size if shared >= 2
      } yield (a, b) -> shared.toLong).toMap
      val got = TextAnalysis.winnowingCandidates(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expect, s"$got vs $expect")
      assert(got.contains((1L, 2L)), "10-token shared span must produce a candidate")
      assert(!got.exists(k => k._1._1 == 3L || k._1._2 == 3L),
        "unrelated doc must not pair")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("source vocab overlap: jaccard matches naive sets; disjoint sources score 0 pairs") {
    val dir = corpusDir(Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta epsilon zeta", "s2"),
      (3L, "unrelated vocabulary entirely different", "s3")))
    try {
      val vocab = Map(
        "s1" -> Set("alpha", "beta", "gamma", "delta"),
        "s2" -> Set("alpha", "beta", "epsilon", "zeta"),
        "s3" -> Set("unrelated", "vocabulary", "entirely", "different"))
      val expect = (for {
        (a, va) <- vocab; (b, vb) <- vocab if a < b
        common = (va & vb).size if common > 0
      } yield (a, b) -> (common.toLong,
        common.toDouble / (va.size + vb.size - common))).toMap
      val got = TextAnalysis.sourceVocabOverlap(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == expect.keySet, s"$got vs $expect")
      expect.foreach { case (k, (c, j)) =>
        assert(got(k)._1 == c && math.abs(got(k)._2 - j) < 1e-6, s"$k")
      }
      assert(got(("s1", "s2"))._1 == 2L &&
        math.abs(got(("s1", "s2"))._2 - 2.0 / 6) < 1e-6, "engineered overlap")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("user burstiness: peak-to-mean matches naive; a burst-scripted user flags") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-burst").toString
    try {
      val hourNs = 3600000000000L
      // user 1: one event per hour for 6 hours (flat, ratio 1)
      // user 2: 9 events in one hour + 1 in another (ratio 9*2/10 = 1.8)
      // user 3: 12 in one hour, 1 in each of 3 others (ratio 12*4/15 = 3.2)
      // user 4: one event just before and one just after the epoch —
      // FLOOR division puts them in hours -1 and 0 (truncation would
      // collapse both into hour 0 and report n_hours = 1)
      val rows = Seq.tabulate(6)(h => (1L, h * hourNs + 1)) ++
        (Seq.fill(9)((2L, 10 * hourNs + 5)) :+ (2L, 11 * hourNs + 5)) ++
        (Seq.fill(12)((3L, 20 * hourNs + 7)) ++ Seq(
          (3L, 21 * hourNs + 7), (3L, 22 * hourNs + 7), (3L, 23 * hourNs + 7))) ++
        Seq((4L, -1L), (4L, 1L))
      rows.zipWithIndex.map { case ((u, ts), i) =>
        (i.toLong, ts, u, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$tmp/events.parquet")
      val got = Sessionize.userBurstiness(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
        .toMap
      assert(got(1L) == ((6L, 6L, 1L, 1.0, false)))
      assert(got(2L) == ((10L, 2L, 9L, 1.8, false)))
      assert(got(3L) == ((15L, 4L, 12L, 3.2, true)))
      assert(got(4L) == ((2L, 2L, 1L, 1.0, false)), s"floor-div: ${got(4L)}")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("bigram logprob: scores match the naive add-one model; short docs emit null") {
    val docs = Seq(
      (1L, "a b a b a c", "s"),
      (2L, "a b a b", "s"),
      (3L, "c a b", "s"),
      (4L, "solo", "s")) // one token → 0 pairs, null score
    val dir = corpusDir(docs)
    try {
      val allPairs = docs.flatMap { case (_, tx, _) =>
        toks(tx).sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
      }
      val cb = allPairs.groupBy(identity).view.mapValues(_.size).toMap
      val cctx = allPairs.groupBy(_._1).view.mapValues(_.size).toMap
      val v = allPairs.map(_._2).distinct.size
      def score(tx: String): Option[Double] = {
        val ps = toks(tx).sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
        if (ps.isEmpty) None
        else Some(ps.map(p =>
          -math.log((cb(p) + 1.0) / (cctx(p._1) + v))).sum / ps.length)
      }
      val got = TextAnalysis.bigramLogprob(spark, dir).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      docs.foreach { case (id, tx, _) =>
        val nPairs = math.max(toks(tx).length - 1, 0).toLong
        assert(got(id)._1 == nPairs, s"doc $id n_pairs")
        (got(id)._2, score(tx)) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) < 5e-4, s"doc $id: $g vs $e")
          case (None, None) =>
          case other => fail(s"doc $id: $other")
        }
      }
      // the repeated "a b" transition is more probable than the rare
      // "b c"-style ones: doc 2 (all high-prob transitions) must score
      // lower than doc 3 (novel transitions)
      assert(got(2L)._2.get < got(3L)._2.get)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("knn label vote: votes equal a direct majority over the graph's train edges") {
    val sf = "/root/testdata/sf0.001"
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def isTrain(id: Long) = md5hex(id.toString).take(2) <= "7f"
    val knn = Similarity.knnGraph(spark, sf)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = knn.filter { case (v, n) => !isTrain(v) && isTrain(n) }
      .groupBy(_._1).view.mapValues { es =>
        val counts = es.map(e => labels(e._2)).groupBy(identity)
          .view.mapValues(_.size).toMap
        val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        (es.size.toLong, best)
      }.toMap
    val got = Similarity.knnLabelVote(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getInt(1))).toMap
    assert(got.keySet == labels.keySet.filterNot(isTrain), "every eval vec, exactly once")
    got.foreach { case (v, (n, pred, trueLabel)) =>
      expected.get(v) match {
        case Some((en, ebest)) =>
          assert(n == en && pred.contains(ebest), s"vec $v: ($n, $pred) vs ($en, $ebest)")
        case None =>
          assert(n == 0L && pred.isEmpty, s"vec $v without train neighbors: ($n, $pred)")
      }
      assert(trueLabel == labels(v))
    }
    assert(expected.nonEmpty)
  }

  test("minhash estimate: identical docs score 1.0; exact column matches naive sets; tolerance is honest") {
    val dir = corpusDir(corpus) // docs 1 and 6 are byte-identical
    try {
      val sets = corpus.map { case (id, tx, _) => id -> shingles(tx) }.toMap
      val got = Dedup.minhashEstimateVsExact(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
      assert(got.nonEmpty)
      got.foreach { case ((a, b), (nAgree, est, j, tol)) =>
        // candidates share a band = 4 consecutive equal mins
        assert(nAgree >= 4L, s"($a,$b) agree $nAgree")
        assert(est == math.round(est * 16) / 16.0, s"est is a multiple of 1/16")
        val (sa, sb) = (sets(a), sets(b))
        val nj = (sa & sb).size.toDouble / (sa | sb).size
        assert(math.abs(j - nj) < 1e-6, s"($a,$b) exact: $j vs $nj")
        assert(tol == (math.abs(est - j) <= 0.35), s"($a,$b) tolerance flag")
      }
      val idPair = got((1L, 6L))
      assert(idPair._2 == 1.0 && idPair._3 == 1.0 && idPair._4,
        s"identical pair: $idPair")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("source health: report rows equal the three signal operators joined") {
    val dir = corpusDir(corpus)
    try {
      val rep = PipelinePrep.sourceReputation(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
      val div = TextAnalysis.sourceDivergence(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val pairs = Dedup.crossSourceDups(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      def selfOf(s: String) = pairs.collect {
        case (a, b, n) if a == s && b == s => n }.sum
      def crossOf(s: String) = pairs.collect {
        case (a, b, n) if a != b && (a == s || b == s) => n }.sum
      val got = PipelinePrep.sourceHealthReport(spark, dir)
        .collect().map { r =>
          r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getBoolean(4), r.getLong(5), r.getLong(6), r.getDouble(7),
            r.getLong(8), r.getLong(9))
        }.toMap
      assert(got.keySet == rep.keySet)
      got.foreach { case (s, (nd, ttr, dup, keep, nt, ntyp, kl, sp, cp)) =>
        assert((nd, ttr, dup, keep) == rep(s), s"$s reputation")
        assert((nt, ntyp, kl) == div(s), s"$s divergence")
        assert(sp == selfOf(s) && cp == crossOf(s), s"$s pair counts")
      }
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("inverted index and phrase search match naive references; index route misses nothing") {
    val dir = corpusDir(Seq(
      (1L, "alpha beta gamma alpha beta gamma tail", "s"),
      (2L, "alpha beta gamma prefix and more words", "s"),
      (3L, "unrelated words only here today", "s"),
      (4L, "monkeyalpha beta gamma embedded mid token case", "s")))
    try {
      // index: df over distinct (term, doc), digest over sorted ids
      val naiveIdx = Seq(1L -> "alpha beta gamma alpha beta gamma tail",
        2L -> "alpha beta gamma prefix and more words",
        3L -> "unrelated words only here today",
        4L -> "monkeyalpha beta gamma embedded mid token case")
        .flatMap { case (id, tx) => toks(tx).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        .filter(_._2.size >= 2)
      val gotIdx = TextAnalysis.invertedIndex(spark, dir)
        .collect().map(r => r.getAs[String]("term") ->
          (r.getAs[Long]("df"), r.getAs[String]("posting_digest"),
            r.getAs[Long]("posting_xor"))).toMap
      assert(gotIdx.keySet == naiveIdx.keySet)
      naiveIdx.foreach { case (term, ids) =>
        assert(gotIdx(term)._1 == ids.size.toLong, s"$term df")
        assert(gotIdx(term)._2 == md5hex(ids.mkString(",")), s"$term digest")
        // xor digest: order-independent fold of per-id md5 prefixes
        val xorRef = ids.map(id =>
          java.lang.Long.parseLong(md5hex(id.toString).take(15), 16))
          .reduce(_ ^ _)
        assert(gotIdx(term)._3 == xorRef, s"$term xor")
      }
      // phrase search: docs 1 (×2) and 2 (×1) contain the word phrase;
      // doc 4's "monkeyalpha beta gamma" is a substring hit but NOT a
      // word-gram occurrence and must be excluded
      val got = TextAnalysis.phraseSearch(spark, dir, "alpha beta gamma")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 2L, 2L -> 1L), got)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }

  test("shard manifest: digest is row-order independent; totals partition the corpus") {
    val docs = (0 until 40).map(i => (i.toLong, s"doc number $i with tokens " * (1 + i % 3), "s"))
    val dirA = corpusDir(docs)
    val dirB = corpusDir(docs.reverse) // same corpus, reversed write order
    try {
      def manifest(dir: String) = PipelinePrep.shardManifest(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))).toMap
      val (ma, mb) = (manifest(dirA), manifest(dirB))
      assert(ma == mb, "manifest must not depend on row order")
      // shards partition the corpus: doc counts and token totals sum up
      assert(ma.values.map(_._1).sum == docs.length.toLong)
      val totalToks = docs.map(_._2.split(" ", -1).length.toLong).sum
      assert(ma.values.map(_._2).sum == totalToks)
      // a one-doc content change flips exactly its shard's digest
      val mutated = docs.updated(7, (7L, "entirely different content", "s"))
      val dirC = corpusDir(mutated)
      try {
        val mc = manifest(dirC)
        val shard7 = java.lang.Long.parseLong(md5hex("7").take(8), 16) % 16
        assert(mc(shard7)._4 != ma(shard7)._4, "mutated shard digest must flip")
        ma.keys.filter(_ != shard7).foreach { s =>
          assert(mc.get(s).map(_._4) == ma.get(s).map(_._4),
            s"untouched shard $s digest changed")
        }
      } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dirC))
    } finally {
      graft.TestFiles.rmrf(java.nio.file.Paths.get(dirA))
      graft.TestFiles.rmrf(java.nio.file.Paths.get(dirB))
    }
  }

  test("winnowing: fingerprints equal the naive window-min construction; coverage property holds") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = corpusDir(Seq(
      (1L, s"unique one two $shared three four five six", "s"),
      (2L, s"different prefix tokens $shared and a longer suffix tail", "s"),
      (3L, "tiny doc", "s"))) // fewer than n tokens → zero everything
    try {
      def ref(s: String): (Long, Long, Long, String) = {
        val t = toks(s)
        val grams = if (t.length < 3) Seq.empty
          else t.sliding(3).map(_.mkString(" ")).toSeq
        val gh = grams.map(g => java.lang.Long.parseLong(md5hex(g).take(8), 16))
        val fps = if (gh.length < 4) Seq.empty
          else gh.sliding(4).map(_.min).toSeq.distinct
        (gh.length.toLong, math.max(gh.length - 3, 0).toLong, fps.length.toLong,
          md5hex(fps.sorted.mkString(",")))
      }
      val got = TextAnalysis.winnowingFingerprints(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
      Seq(1L -> s"unique one two $shared three four five six",
        2L -> s"different prefix tokens $shared and a longer suffix tail",
        3L -> "tiny doc").foreach { case (id, s) =>
        assert(got(id) == ref(s), s"doc $id: ${got(id)} vs ${ref(s)}")
      }
      // guarantee: docs sharing a ≥ n+w−1 = 6-token span share a fingerprint
      def fpSet(s: String): Set[Long] = {
        val t = toks(s)
        val gh = t.sliding(3).map(g => java.lang.Long.parseLong(
          md5hex(g.mkString(" ")).take(8), 16)).toSeq
        gh.sliding(4).map(_.min).toSet
      }
      assert(fpSet(s"unique one two $shared three four five six")
        .intersect(fpSet(s"different prefix tokens $shared and a longer suffix tail"))
        .nonEmpty, "shared 8-token span must share a winnowing fingerprint")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(dir))
  }
}
