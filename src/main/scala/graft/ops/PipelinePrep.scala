package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorOps

/** Training-data preparation operators (north-star surface): the steps a
  * large-scale LLM pipeline runs AFTER dedup/quality scoring — chunking
  * documents into training samples, per-stratum sampling, text cleaning,
  * per-language n-gram profiling, and embedding-space diagnostics.
  *
  * Scale shapes: chunking/cleaning are single narrow scans (no shuffle);
  * sampling is a scan + filter on a deterministic hash (no RNG, so retries
  * and re-runs are stable — rand() would break exactly-once semantics);
  * profiles and centroid stats aggregate to tiny keyed outputs (langs ×
  * bigrams, labels × dims) with map-side partial aggregation, so the
  * shuffle is constant-size regardless of corpus size.
  */
object PipelinePrep {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def toks: Column = split(col("text"), " ")

  /** The canonical cleaning expression (digit-run masking + whitespace
    * collapse) — ONE definition shared by textCleaning (q48),
    * trainingMix (q56) and the streaming DocStreams.prepDocs, so the
    * batch and streaming pipelines cannot drift apart (and the DuckDB
    * oracles mirror exactly this shape).
    */
  private[graft] def cleanTextCol(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "[0-9]+", "#"), " +", " "))

  /** Fixed-size token chunking: each document becomes ceil(n/chunkSize)
    * training samples of up to `chunkSize` tokens. One narrow scan, rows
    * explode 1→(n/chunkSize) — no shuffle, so at 100 TB this is purely
    * map-side and the output partitioning follows the input files.
    */
  def docChunks(spark: SparkSession, dir: String, chunkSize: Int = 32): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id", $"t", size($"t").cast("long").as("n"))
      // guard like shinglesOf: a 0-token doc yields no chunks, not a
      // descending-sequence error
      .select($"doc_id", $"t", $"n",
        explode(when($"n" >= 1,
            sequence(lit(0L), floor(($"n" - 1) / chunkSize)))
          .otherwise(array().cast("array<bigint>"))).as("chunk_idx"))
      .select($"doc_id", $"chunk_idx",
        concat_ws(" ", slice($"t", ($"chunk_idx" * chunkSize + 1).cast("int"),
          lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize.toLong), $"n" - $"chunk_idx" * chunkSize)
          .as("n_chunk_tokens"))
  }

  /** Top-k documents per language by lexical diversity (type-token
    * ratio) — the "keep the best slice of each stratum" selection step.
    * Ranks via [[Ranking.topKPerGroup]]: a plain lang-partitioned window
    * would funnel a fifth of a 100-TB corpus through each of 5 tasks;
    * the salted two-phase ranking bounds every task at corpus/(5·32)
    * and re-ranks only the ≤32·k survivors per language. Ties broken by
    * doc_id (total order), so the output is the single-window result
    * exactly.
    */
  def qualityTopKPerLang(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val scored = docs(spark, dir)
      .select($"doc_id", $"lang", toks.as("t"))
      .select($"doc_id", $"lang",
        round(size(array_distinct($"t")).cast("double") / size($"t"), 6)
          .as("type_token_ratio"))
    Ranking.topKPerGroup(scored, Seq("lang"),
      Seq($"type_token_ratio".desc, $"doc_id"), $"doc_id", k)
  }

  /** Deterministic ~10% stratified sample: keep a doc iff the first two
    * hex chars of md5(doc_id) fall in [00, 19] (26/256 ≈ 10.2%). Hash
    * sampling (vs rand()) is reproducible across retries, executors and
    * engines — the property a training-data pipeline needs for exactly-
    * once sample manifests. Scan + filter; no shuffle.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string")), 1, 2).as("bucket"))
      .filter($"bucket" <= "19")
  }

  /** Text cleaning: digit-run masking + whitespace collapapse — the
    * scrub-normalize step before tokenization. Single codegen'd scan;
    * emits the cleaned text plus the change counters quality dashboards
    * aggregate.
    */
  def textCleaning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id",
        cleanTextCol($"text").as("clean_text"),
        size(regexp_extract_all($"text", lit("[0-9]+"), lit(0)))
          .cast("long").as("n_digit_runs"),
        length($"text").cast("long").as("n_chars_raw"))
      .withColumn("n_chars_clean", length($"clean_text").cast("long"))
  }

  /** Per-language character-bigram profile (top `k` bigrams): the
    * classic n-gram language-ID model's training step. The codegen'd
    * `bigram_counts` expression folds each document into ONE map row of
    * per-doc counts, so the generator emits distinct-bigrams-per-doc
    * rows (≈ hundreds) instead of one row per character of the corpus
    * (~50-100× fewer rows — the earlier explode(zip_with) plan spent
    * 24% of the whole bench here). The (lang, bigram) aggregation keeps
    * map-side partial aggregation; the shuffle is bounded by the
    * alphabet, not the corpus.
    */
  def charBigramProfile(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    graft.functions.TextOps.register(spark)
    val grams = docs(spark, dir)
      .select($"lang",
        explode(call_function("bigram_counts", $"text")).as(Seq("bigram", "cnt")))
    val counts = grams.groupBy($"lang", $"bigram").agg(sum($"cnt").as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
    counts.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
  }

  /** The end-to-end training-data manifest — the production composition
    * of the whole prep surface in ONE distributed DAG: clean (q48's
    * normalization) → exact-dedup on the cleaned content hash (keeper =
    * min doc_id) → quality gate (length + lexical diversity) →
    * deterministic hash sample (~50%) → fixed-size chunk accounting →
    * per-(lang, source) manifest rollup. The shapes compose exactly as
    * documented on the individual operators: one narrow scan feeds a
    * single content-hash shuffle (dedup), everything after is map-side
    * until the final tiny (lang, source) aggregate. Chunk counts use
    * integer math ((n + size − 1) div size), not doubles, so the oracle
    * comparison is exact.
    */
  def trainingMix(spark: SparkSession, dir: String, chunkSize: Int = 64): DataFrame = {
    import spark.implicits._
    val cleaned = docs(spark, dir)
      .select($"doc_id", $"lang", $"source", cleanTextCol($"text").as("clean_text"))
    // keeper = min doc_id per cleaned-content hash; min over a struct
    // ordered by the unique doc_id is deterministic and gets map-side
    // partial aggregation (same shape as q13)
    val keepers = cleaned
      .groupBy(sha2($"clean_text", 256).as("content_hash"))
      .agg(min(struct($"doc_id", $"lang", $"source", $"clean_text")).as("r"))
      .select($"r.doc_id".as("doc_id"), $"r.lang".as("lang"),
        $"r.source".as("source"), $"r.clean_text".as("clean_text"))
    val scored = keepers
      .select($"doc_id", $"lang", $"source", split($"clean_text", " ").as("t"))
      .select($"doc_id", $"lang", $"source",
        size($"t").cast("long").as("n_tokens"),
        (size(array_distinct($"t")).cast("double") / size($"t")).as("ttr"))
    val selected = scored
      .filter($"n_tokens" >= 30 && $"ttr" >= 0.45)
      .filter(substring(md5($"doc_id".cast("string")), 1, 2) <= "7f")
    selected
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        sum(expr(s"(n_tokens + ${chunkSize - 1}) div $chunkSize")).as("total_chunks"))
  }

  /** Embedding-space diagnostics: per-label centroid norm and mean
    * cosine-to-centroid (cluster tightness). The centroid is the only
    * part that needs a shuffle — (label, dim) keyed partial aggregation,
    * output bounded by labels×dims regardless of corpus size. The
    * centroid matrix is then collapsed to one array row per label and
    * broadcast back, so the per-vector cosine is a single scan with the
    * codegen'd vec_dot/vec_norm expressions (graft.functions.VectorOps)
    * — no N×dims re-explosion, no driver-side vector math.
    */
  def labelCentroidStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val cent = e
      .select($"label", posexplode($"embedding").as(Seq("i", "xf")))
      .groupBy($"label", $"i").agg(avg($"xf".cast("double")).as("c"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"i", $"c"))),
        s => s("c")).as("centroid"))
      .withColumn("nc", VectorOps.vecNorm(spark, $"centroid"))
    e.join(broadcast(cent), Seq("label"))
      .select($"label",
        VectorOps.vecDot(spark, $"embedding", $"centroid").as("d"),
        VectorOps.vecNorm(spark, $"embedding").as("nv"),
        $"nc")
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        round(max($"nc"), 4).as("centroid_norm"),
        round(avg($"d" / ($"nv" * $"nc")), 4).as("avg_cosine"))
  }

  /** Concat-and-chunk sequence packing: docs are concatenated in doc_id
    * order within a packing stream — (lang, source) here — and the token
    * stream is cut into fixed `chunkTokens` context windows, exactly the
    * GPT-style pretraining layout. Emits, per doc, the chunk its first
    * token lands in and the offset inside that chunk (a doc may straddle
    * a boundary; chunk_id is where it STARTS).
    *
    * One running-sum window per stream. Streams are the unit of
    * parallelism, which is how packing works at 100 TB too: you never
    * pack one global sequence — you pack per shard, and the window
    * partitions on the shard key. With heavier per-stream volume, shard
    * finer (e.g. (lang, source, day)); the running sum stays exact
    * within each stream and no cross-stream coordination exists to
    * bottleneck on.
    */
  def sequencePacking(spark: SparkSession, dir: String,
      chunkTokens: Int = 256): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(spark, dir)
      .select($"doc_id", $"lang", $"source",
        size(toks).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      // start offset of this doc in the stream = cum - n; integer div /
      // mod give the window index and in-window offset exactly
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"cum_tokens",
        floor(($"cum_tokens" - $"n_tokens") / lit(chunkTokens)).cast("long").as("chunk_id"),
        (($"cum_tokens" - $"n_tokens") % lit(chunkTokens)).as("chunk_off"))
  }
}
