package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The round-7 Σdf² cuts and their contract corners: the PPJoin prefix
  * must starve boilerplate shingles of candidates, the tf-idf/weighted
  * pair ops must exclude zero-norm (all-universal-gram) documents on
  * BOTH plans (the naive 0/0 there is engine-dependent NaN), and a
  * NULL-label vector must never pair (the naive `===` join semantics).
  */
class PrefixPairsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("a corpus-universal shingle generates ZERO prefix candidates") {
    // 20 docs, 5 private shingles each plus one shared boilerplate
    // shingle (999): the naive equi-join pairs every doc with every
    // other through 999 — C(20,2) = 190 pairs — while the prefix at
    // t=0.6 (rarest 3 of 6) excludes the df=20 shingle from every
    // prefix, so no candidate survives
    val reps = spark.range(20).select($"id".as("doc_id"),
        array_sort(array(
          ($"id" * 10 + 1000) +: (1 to 4).map(j => $"id" * 10 + 1000 + j)
            :+ lit(999L): _*)).as("shs"))
      .select($"doc_id", $"shs", size($"shs").as("n"))
    assert(Dedup.prefixCandidates(spark, reps, 0.6).count() == 0)
    // contrast: at t=0 the prefix is the whole set and the boilerplate
    // block reappears in full
    assert(Dedup.prefixCandidates(spark, reps, 0.0).count() == 190)
    // the naive join really would have paired everything
    val sh = reps.select($"doc_id", explode($"shs").as("sh"))
    val naive = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(naive == 190)
  }

  test("PPJoin+ positional bound prunes a prefix-matched pair that cannot reach τ") {
    // Four 8-shingle docs engineered so every token of docs 1/3 and 2/4
    // has df=2 (ties order by sh). Docs 1 and 2 share EXACTLY token 13,
    // which ranks 4th in doc 1 (plen at τ=0.6 is 8−⌈4.8⌉+1 = 4, so it
    // IS in both prefixes — the plain prefix lemma admits the pair) but
    // the positional bound 1 + min(8−4, 8−1) = 5 is below the overlap
    // floor ⌈τ/(1+τ)·16⌉ = 6, so PPJoin+ prunes it before the verify.
    // True J(1,2) = 1/15 < 0.6, so pruning it is sound; the genuinely
    // similar pairs (1,3) and (2,4) (J = 7/9) must survive.
    val docTokens = Map(
      1L -> Seq(10L, 11L, 12L, 13L, 14L, 15L, 16L, 17L),
      2L -> Seq(13L, 20L, 21L, 22L, 23L, 24L, 25L, 26L),
      3L -> Seq(10L, 11L, 12L, 14L, 15L, 16L, 17L, 99L),
      4L -> Seq(20L, 21L, 22L, 23L, 24L, 25L, 26L, 98L))
    val reps = docTokens.toSeq.toDF("doc_id", "shs")
      .select($"doc_id", array_sort($"shs").as("shs"), size($"shs").as("n"))
    val cands = Dedup.prefixCandidates(spark, reps, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.contains((1L, 2L)),
      s"positional bound failed to prune the 1-common pair: $cands")
    assert(cands == Set((1L, 3L), (2L, 4L)), cands.toString)
    // and the verified output keeps exactly the two true near-dup pairs
    val pairs = Dedup.prefixVerifiedRepPairs(spark, reps, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 4L)), pairs.toString)
  }

  private lazy val univDir: String = {
    val dir = "/tmp/graft_prefix_pairs_univ"
    // every doc opens with "aa bb cc", so that trigram is UNIVERSAL
    // (df == n_docs, tf-idf weight exactly 0); doc 0 consists of ONLY
    // it (zero norm / zero weight-sum); docs 3 and 4 are byte-identical
    Seq(
      (0L, "aa bb cc"),
      (1L, "aa bb cc p q r"),
      (2L, "aa bb cc p q s"),
      (3L, "aa bb cc x y z"),
      (4L, "aa bb cc x y z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q162: zero-norm docs excluded, universal grams re-enter n_shared, no NaN") {
    // dfCap default → fast branch (max df = 5); dfCap = 1 → every gram
    // heavy, the Bayardo branch — both must produce the identical row
    for (cap <- Seq(256, 1)) {
      val rows = Dedup.tfidfCosinePairs(spark, univDir, 0.6, dfCap = cap)
        .collect()
      // only the identical pair (3,4) qualifies: docs 1-2 share the
      // universal gram plus two df=2 grams but their cosine is
      // 2·ln(2.5)²/(2·ln(2.5)²+ln(5)²) ≈ 0.39; doc 0 is zero-norm and
      // excluded by the positive-norm contract (naive would emit NaN
      // pairs for it); cross pairs through ONLY the universal gram have
      // cosine 0
      assert(rows.length == 1, s"dfCap=$cap: ${rows.mkString(", ")}")
      val r = rows.head
      assert((r.getLong(0), r.getLong(1)) == (3L, 4L))
      assert(r.getLong(2) == 4L, "n_shared must count the universal gram")
      assert(r.getDouble(3) == 1.0)
    }
    // contract is enforced, not just documented
    intercept[IllegalArgumentException] {
      Dedup.tfidfCosinePairs(spark, univDir, 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.tfidfCosinePairs(spark, univDir, 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(spark, univDir, 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.prefixJaccardJoin(spark, univDir, -0.1)
    }
  }

  test("q215: zero-weight-sum docs excluded, identical pair scores 1.0, no NaN") {
    val rows = Dedup.weightedJaccard(spark, univDir).collect()
    assert(rows.nonEmpty)
    val ids = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(0L),
      "the all-universal (sw == 0) doc must not pair — naive divides 0/0")
    val wj = rows.map(r => r.getDouble(4))
    assert(wj.forall(v => !v.isNaN))
    val p34 = rows.find(r => r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(p34.exists(r => r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0),
      s"identical pair (3,4) missing or mis-scored: ${rows.mkString(", ")}")
  }

  test("q16 hybrid: heavy branch equals fast branch pair-for-pair") {
    // 3×-replicated real corpus (exercises dedup groups) at thresholds
    // spanning sparse and dense outputs; dfCap = 2 forces nearly every
    // shingle down the heavy path (light/heavy split + heavy-only
    // prefix candidates), whose output must equal the naive-join fast
    // branch exactly
    val src = "/root/testdata/sf0.001"
    val dir = "/tmp/graft_prefix_pairs_rep3"
    val reps = spark.range(3).select($"id".as("rep"))
    val d = spark.read.parquet(s"$src/documents.parquet")
    val shift = d.agg(max($"doc_id")).head().getLong(0) + 1
    d.crossJoin(reps).withColumn("doc_id", $"doc_id" + $"rep" * shift)
      .drop("rep").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (t <- Seq(0.05, 0.6)) {
      val fast = Dedup.jaccardPairs(spark, dir, t, dfCap = Int.MaxValue)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val heavy = Dedup.jaccardPairs(spark, dir, t, dfCap = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(heavy == fast,
        s"t=$t: heavy-branch diff ±${(heavy diff fast).take(3)} / ${(fast diff heavy).take(3)}")
    }
  }

  test("q18: NULL-label vectors never pair (naive === join semantics)") {
    val dir = "/tmp/graft_prefix_pairs_nulllabel"
    Seq(
      (0L, Seq(1.0f, 0.0f), None: Option[Int]),
      (1L, Seq(1.0f, 0.0f), None: Option[Int]),
      (2L, Seq(1.0f, 0.0f), Some(7)),
      (3L, Seq(1.0f, 0.0f), Some(7)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = Similarity.cosineNearDupPairs(spark, dir, 0.3)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)),
      s"null-label rows leaked into the pair output: $pairs")
  }
}
