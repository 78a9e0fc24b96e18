package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Empty-corpus degradation: every documents/embeddings operator must
  * plan and run on 0-row tables (fresh tenant, all-filtered partition,
  * dry replay) and return 0 rows — not throw. The guards under test:
  * n-gram sequence() underflow, LSH plane collection on an empty head,
  * window/agg over nothing, quantization max over empty arrays.
  */
class EmptyInputSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // long ts — the shape the nanosAsLong readers see
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](), docSchema)
      .write.parquet(s"$tmp/documents.parquet")
    spark.createDataFrame(new java.util.ArrayList[Row](), embSchema)
      .write.parquet(s"$tmp/embeddings.parquet")
    spark.createDataFrame(new java.util.ArrayList[Row](), eventSchema)
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  private val underTest: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "q13 exact dedup" -> (() => Dedup.exactDuplicates(spark, emptyDir)),
    "q14 minhash signatures" -> (() => Dedup.minhashSignatures(spark, emptyDir)),
    "q15 minhash candidates" -> (() => Dedup.minhashCandidates(spark, emptyDir)),
    "q16 jaccard pairs" -> (() => Dedup.jaccardPairs(spark, emptyDir)),
    "q27 simhash" -> (() => Dedup.simhash(spark, emptyDir)),
    "q41 dedup clusters" -> (() => Dedup.dedupClusters(spark, emptyDir)),
    "q46 quality topk" -> (() => PipelinePrep.qualityTopKPerLang(spark, emptyDir)),
    "q49 bigram profile" -> (() => PipelinePrep.charBigramProfile(spark, emptyDir)),
    "q52 repetition ratio" -> (() => TextAnalysis.repetitionRatio(spark, emptyDir)),
    "q53 boilerplate phrases" -> (() => TextAnalysis.boilerplatePhrases(spark, emptyDir)),
    "q55 quantization error" -> (() => Similarity.quantizationError(spark, emptyDir)),
    "q56 training mix" -> (() => PipelinePrep.trainingMix(spark, emptyDir)),
    // LSH/IVF operators collect head vectors as planes/centroids: an
    // empty corpus has none, and the fold must degrade, not NPE
    "q17 cosine topk" -> (() => Similarity.cosineTopK(spark, emptyDir)),
    "q51 lsh near-dups" -> (() => Similarity.cosineNearDupPairsLsh(spark, emptyDir)),
    "q54 knn graph" -> (() => Similarity.knnGraph(spark, emptyDir)),
    "q19 ivf topk" -> (() => Similarity.annIvfTopK(spark, emptyDir)),
    "q63 decontamination" -> (() => TextAnalysis.decontamination(spark, emptyDir)),
    "q64 unigram logprob" -> (() => TextAnalysis.unigramLogprob(spark, emptyDir)),
    "q61 retention cohorts" -> (() => Sessionize.retentionCohorts(spark, emptyDir)),
    "q62 value outliers" -> (() => Sessionize.valueOutliers(spark, emptyDir)),
    "q67 tfidf top terms" -> (() => TextAnalysis.tfidfTopTerms(spark, emptyDir)),
    "q68 sequence packing" -> (() => PipelinePrep.sequencePacking(spark, emptyDir)),
    "q69 semantic dedup" -> (() => Similarity.semanticDedup(spark, emptyDir)),
    "q70 pagerank knn" -> (() => Graph.pageRankKnn(spark, emptyDir)),
    "q72 embedding decontamination" -> (() =>
      Similarity.embeddingDecontamination(spark, emptyDir)),
    "q73 quality classifier" -> (() =>
      TextAnalysis.qualityClassifierScores(spark, emptyDir)),
    "q74 kmeans assign" -> (() => Similarity.kmeansAssign(spark, emptyDir)),
    // round-4 additions: window-over-nothing rollups (q75/q76), eager
    // checkpoint of empty results (q75/q77/q79/q81/q82), the per-token
    // coverage mask over no docs (q80)
    "q75 source reputation" -> (() => PipelinePrep.sourceReputation(spark, emptyDir)),
    "q76 temperature mix" -> (() => PipelinePrep.temperatureMix(spark, emptyDir)),
    "q77 duplicated windows" -> (() => Dedup.duplicatedWindowFraction(spark, emptyDir)),
    "q78 gopher rules" -> (() => TextAnalysis.gopherRules(spark, emptyDir)),
    "q79 incremental dedup" -> (() => Dedup.incrementalDedup(spark, emptyDir)),
    "q80 substring dedup cut" -> (() => Dedup.substringDedupCut(spark, emptyDir)),
    "q81 gram novelty" -> (() => Dedup.gramNovelty(spark, emptyDir)),
    "q82 knn triangles" -> (() => Graph.knnTriangles(spark, emptyDir)),
    "q83 balanced sample" -> (() => PipelinePrep.balancedSample(spark, emptyDir)),
    "q84 bigram pmi" -> (() => TextAnalysis.bigramPmi(spark, emptyDir)),
    "q85 contamination report" -> (() =>
      TextAnalysis.contaminationReport(spark, emptyDir)),
    // retrieval/corpus-statistics additions: one-row stats over no docs
    // (q86), vocabulary aggregates of nothing (q87), keeper self-join
    // on empty (q88), per-doc map/array math over no rows (q89/q91),
    // candidate rollup of an empty pair table (q90)
    "q86 bm25 topk" -> (() => TextAnalysis.bm25TopK(spark, emptyDir)),
    "q87 source divergence" -> (() => TextAnalysis.sourceDivergence(spark, emptyDir)),
    "q88 containment pairs" -> (() => Dedup.containmentPairs(spark, emptyDir)),
    "q89 char profile" -> (() => TextAnalysis.charClassProfile(spark, emptyDir)),
    "q90 cross-source dups" -> (() => Dedup.crossSourceDups(spark, emptyDir)),
    "q91 winnowing" -> (() => TextAnalysis.winnowingFingerprints(spark, emptyDir)),
    "q92 perplexity buckets" -> (() => TextAnalysis.perplexityBuckets(spark, emptyDir)),
    "q93 winnowing candidates" -> (() => TextAnalysis.winnowingCandidates(spark, emptyDir)),
    "q94 shard manifest" -> (() => PipelinePrep.shardManifest(spark, emptyDir)),
    "q95 source vocab overlap" -> (() => TextAnalysis.sourceVocabOverlap(spark, emptyDir)),
    "q96 user burstiness" -> (() => Sessionize.userBurstiness(spark, emptyDir)),
    "q97 bigram logprob" -> (() => TextAnalysis.bigramLogprob(spark, emptyDir)),
    "q98 knn label vote" -> (() => Similarity.knnLabelVote(spark, emptyDir)),
    "q99 minhash estimate" -> (() => Dedup.minhashEstimateVsExact(spark, emptyDir)),
    "q100 source health" -> (() => PipelinePrep.sourceHealthReport(spark, emptyDir)),
    "q101 inverted index" -> (() => TextAnalysis.invertedIndex(spark, emptyDir)),
    "q102 phrase search" -> (() => TextAnalysis.phraseSearch(spark, emptyDir)),
    "q103 snapshot diff" -> (() => PipelinePrep.snapshotDiffQuery(spark, emptyDir)),
    "q104 blocklist scrub" -> (() => PipelinePrep.blocklistScrub(spark, emptyDir)),
    "q105 principal component" -> (() => Similarity.principalComponent(spark, emptyDir)))

  for ((name, fn) <- underTest)
    test(s"$name returns 0 rows on an empty corpus") {
      assert(fn().count() == 0L)
    }

  test("q60 funnel on an empty event stream: three stages, zero users, no throw") {
    val rows = Sessionize.funnelStages(spark, emptyDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getLong(2) == 0L))
  }
}
