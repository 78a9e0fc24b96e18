package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-data-prep operators (value-level parity
  * with DuckDB is the driver's gate; these pin the algebraic properties a
  * refactor could silently break).
  */
class PipelinePrepSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("docChunks: chunk token counts sum back to the doc token count and " +
      "concatenated chunks reassemble the document") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", size(split($"text", " ")).cast("long").as("n"))
    val chunks = PipelinePrep.docChunks(spark, sf)
    val bySum = chunks.groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("total"))
    val joined = docs.join(bySum, "doc_id")
    assert(joined.filter($"total" =!= $"n").count() == 0)
    // reassembly: order chunks by idx and re-join with single spaces
    val reassembled = chunks
      .groupBy($"doc_id")
      .agg(array_join(transform(sort_array(collect_list(
        struct($"chunk_idx", $"chunk_text"))), s => s("chunk_text")), " ")
        .as("rejoined"))
    val cmp = docs.join(reassembled, "doc_id")
    assert(cmp.filter($"rejoined" =!= $"text").count() == 0)
    // every chunk except a doc's last is exactly chunkSize tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
    val nonLast = chunks
      .withColumn("max_idx", max($"chunk_idx").over(w))
      .filter($"chunk_idx" < $"max_idx")
    assert(nonLast.filter($"n_chunk_tokens" =!= 32L).count() == 0)
  }

  test("manifest digests: AdHash sum sees the duplicated pair XOR is blind to") {
    import spark.implicits._
    def manifest(rows: Seq[(Long, String)]) =
      PipelinePrep.manifestAgg(
        PipelinePrep.withShardCols(rows.toDF("doc_id", "text"), nShards = 1))
        .collect().head
    // base corpus vs the same corpus plus TWO byte-identical docs: the
    // duplicated pair XORs to nothing (the documented corruption the
    // xor digest cannot see) while the AdHash sum shifts by 2h mod p
    val base = manifest(Seq((1L, "alpha beta"), (2L, "gamma delta")))
    val dup = manifest(Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (3L, "cloned text"), (4L, "cloned text")))
    val xorIdx = base.fieldIndex("content_digest")
    val sumIdx = base.fieldIndex("content_digest_sum")
    assert(base.getLong(xorIdx) == dup.getLong(xorIdx),
      "expected the xor digest to be blind to the duplicated pair")
    assert(base.getLong(sumIdx) != dup.getLong(sumIdx),
      "the sum digest must detect the duplicated pair")
    // golden vector: the sum digest equals an independent JVM md5 fold
    def h60(text: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.take(15), 16)
    }
    val p = BigInt(PipelinePrep.adhashP)
    val exp = Seq("alpha beta", "gamma delta", "cloned text", "cloned text")
      .map(h60).sum.mod(p).toLong
    assert(dup.getLong(sumIdx) == exp,
      s"sum digest ${dup.getLong(sumIdx)} != independent fold $exp")
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    // docs 5/6: null<->non-null transitions ARE changes (null-safe
    // digest compare); doc 7: null on both sides is unchanged
    val old = Seq((1L, "same text"), (2L, "old body"), (3L, "going away"),
        (5L, null), (6L, "had a body"), (7L, null))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "same text"), (2L, "new body"), (4L, "brand new"),
        (5L, "recovered body"), (6L, null), (7L, null))
      .toDF("doc_id", "text")
    val got = PipelinePrep.snapshotDiff(old, nw)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "changed", 6L -> "changed"))
  }

  test("blocklistScrub counts match a naive scrub and digests the filtered text") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-scrub")
    try {
      val corpus = Seq(
        (1L, "customer order slow fast"),
        (2L, "no listed words here"),
        (3L, "order order order"))
      corpus.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val bl = Set("customer", "order", "slow")
      val got = PipelinePrep.blocklistScrub(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      corpus.foreach { case (id, tx) =>
        val toks = tx.split(" ", -1)
        val kept = toks.filterNot(bl)
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(got(id) == ((toks.length - kept.length).toLong, digest), s"doc $id")
      }
      // doc 3 scrubs to empty — the digest must be md5("") on both engines
      assert(got(3L)._1 == 3L)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("docChunks: a 0-token corpus row yields no chunks, not an error") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk-empty")
    try {
      Seq((1L, ""), (2L, "exactly thirty-two is not needed here"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = PipelinePrep.docChunks(spark, tmp.toString)
      // split("", " ") yields [""] (1 token) — doc 1 still chunks cleanly
      assert(out.filter($"doc_id" === 1L).count() == 1)
      assert(out.filter($"doc_id" === 2L).count() == 1)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("qualityTopKPerLang: at most k rows per lang, ranked without gaps") {
    val out = PipelinePrep.qualityTopKPerLang(spark, sf, k = 10).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    assert(byLang.forall(_._2.length <= 10))
    byLang.foreach { case (_, rows) =>
      val rns = rows.map(_.getAs[Long]("rn")).sorted
      assert(rns.toSeq == (1L to rns.length).toSeq)
    }
  }

  test("stratifiedSample: deterministic across runs and ~10% rate") {
    val a = PipelinePrep.stratifiedSample(spark, sf).collect().map(_.getLong(0)).sorted
    val b = PipelinePrep.stratifiedSample(spark, sf).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "hash sampling must be reproducible")
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val rate = a.length.toDouble / total
    assert(rate > 0.02 && rate < 0.25, s"rate $rate wildly off 26/256")
  }

  test("textCleaning: no digits survive and whitespace is collapsed") {
    val out = PipelinePrep.textCleaning(spark, sf)
    assert(out.filter($"clean_text".rlike("[0-9]")).count() == 0)
    assert(out.filter($"clean_text".rlike("  ")).count() == 0)
    assert(out.filter($"n_chars_clean" > $"n_chars_raw").count() == 0)
  }

  test("charBigramProfile: every bigram is 2 chars, counts rank-ordered per lang") {
    val out = PipelinePrep.charBigramProfile(spark, sf, k = 5).collect()
    assert(out.forall(_.getAs[String]("bigram").length == 2))
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("n"))
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("labelCentroidStats: one row per label, cosines in [-1, 1], " +
      "vector counts sum to the table size") {
    val out = PipelinePrep.labelCentroidStats(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(out.length == emb.select($"label").distinct().count())
    assert(out.map(_.getAs[Long]("n_vecs")).sum == emb.count())
    assert(out.forall { r =>
      val c = r.getAs[Double]("avg_cosine"); c >= -1.0 && c <= 1.0
    })
    assert(out.forall(_.getAs[Double]("centroid_norm") >= 0.0))
  }

  test("weightedSystematicSample: picks telescope to exactly k per source; weights dominate") {
    val rows = PipelinePrep.weightedSystematicSample(spark, sf).collect()
    assert(rows.nonEmpty)
    // telescoping: Σ n_picks per source = ⌊W·k/W⌋ − ⌊0⌋ = k
    for ((src, rs) <- rows.groupBy(_.getString(0)))
      assert(rs.map(_.getAs[Long]("n_picks")).sum == 20L, s"source $src")
    assert(rows.forall(_.getAs[Long]("n_picks") >= 1))
    // a doc holding over 2/k of its source's weight must be picked ≥ 2
    // times wherever it lands (n_picks ≥ ⌊wt·k/W⌋ for any alignment)
    val tmp = java.nio.file.Files.createTempDirectory("wsys").toString
    try {
      import spark.implicits._
      (Seq((1L, "x" * 900, "en", "s"), (2L, "y" * 50, "en", "s"),
        (3L, "z" * 50, "en", "s"))).map { case (id, t, l, s0) =>
        (id, t, l, s0, t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val r = PipelinePrep.weightedSystematicSample(spark, tmp)
        .collect().map(x => x.getLong(1) -> x.getAs[Long]("n_picks")).toMap
      assert(r(1L) >= 18, s"900/1000 weight doc got ${r(1L)}/20 picks")
      assert(r.values.sum == 20L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("dsirWeights: per-doc mean log-ratio matches an independent driver " +
      "derivation; flag is the rounded-weight sign") {
    val buckets = 256
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      // first 8 hex chars == first 4 bytes, big-endian unsigned
      val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
        ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
      v % buckets
    }
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val cr = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ct = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, lang, ts) <- rows; t <- ts) {
      val b = bucket(t)
      cr(b) += 1
      if (lang == "en") ct(b) += 1
    }
    val nr = cr.values.sum
    val nt = ct.values.sum
    def ratio(b: Long): Double =
      math.log((ct(b) + 1).toDouble / (nt + buckets)) -
        math.log((cr(b) + 1).toDouble / (nr + buckets))
    val expected = rows.map { case (id, lang, ts) =>
      val w = ts.map(t => ratio(bucket(t))).sum / ts.length
      val rounded = BigDecimal(w)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, lang, ts.length.toLong, rounded, rounded > 0.0)
    }.toSet
    val got = PipelinePrep.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got == expected)
    // the flag must split the corpus, not degenerate to one class
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("domainCap: per-source keep-count <= cap, ranks contiguous from 1, " +
      "and keepers are exactly the quality top-cap of their source") {
    val cap = 5
    val out = PipelinePrep.domainCap(spark, sf, cap = cap)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    val bySource = out.groupBy(_._1)
    assert(bySource.nonEmpty)
    for ((src, rows) <- bySource) {
      assert(rows.length <= cap, s"$src kept ${rows.length} > $cap")
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
        s"$src ranks not contiguous")
    }
    // independent naive derivation: sort each source's scored docs by
    // (score desc, doc_id) on the driver and take the first cap
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id",
        round(size(array_distinct(split($"text", " "))).cast("double") /
          size(split($"text", " ")), 6).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val naive = scored.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(cap).zipWithIndex
        .map { case ((s0, id, sc), i) => (s0, id, sc, i + 1L) }
    }.toSet
    assert(out.toSet == naive)
  }
}
