package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star surface): exact
  * content-hash dedup, MinHash banding for near-dup candidates, and n-gram
  * Jaccard verification.
  *
  * Scale shape: exact dedup is one hash-groupBy (shuffle on a 64-hex key).
  * MinHash banding shuffles (band, signature) pairs — O(docs × bands) tiny
  * rows — then joins only within buckets, which is the standard way to
  * avoid the quadratic all-pairs comparison at 100 TB. The Jaccard join
  * here verifies candidates; it is never run all-pairs.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def toks: Column = split(col("text"), " ")

  /** Word n-gram shingles over a PRE-MATERIALIZED token array column.
    * The array must be a plain column reference: inlining `split(text)`
    * here would re-split the whole text inside every element_at of every
    * lambda iteration (n × positions × docs full splits — measured 4-5×
    * slowdown on the shingle queries). Shared with TextAnalysis's
    * repetition/boilerplate signals.
    */
  private[ops] def ngramsOf(t: Column, n: Int): Column =
    // docs with <n tokens have no n-grams; unguarded, sequence(0, -k)
    // is descending and element_at(t, 0) throws
    when(size(t) >= n,
      transform(
        sequence(lit(0), size(t) - lit(n)),
        i => concat_ws(" ", (1 to n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  private def shinglesOf(t: Column): Column = ngramsOf(t, 3)

  /** (doc_id, shingle) rows WITH per-doc multiplicity — the MinHash
    * input (min over salted hashes is multiplicity-invariant, so no
    * distinct is needed; the Jaccard pipelines use [[hashedShingleSet]]
    * instead, which distincts AFTER hashing).
    */
  private[ops] def shingleRows(spark: SparkSession, dir: String): DataFrame =
    shingleRowsOf(docs(spark, dir))

  private[ops] def shingleRowsOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(shinglesOf(col("t"))).as("sh"))

  /** Deterministic md5-bucket corpus sample (the q47 idiom): keep a doc
    * iff the first two hex chars of md5(doc_id) are ≤ `hexMax` —
    * fraction (0xMAX+1)/256, reproducible across retries, executors and
    * engines, and composable in the DuckDB oracle by the same
    * expression. "ff" keeps everything.
    */
  private def sampleDocs(d: DataFrame, hexMax: String): DataFrame = {
    // an uppercase or short value would silently change the fraction via
    // raw string comparison against lowercase md5 hex — fail loudly
    require(hexMax.matches("[0-9a-f]{2}"),
      s"hexMax must be two lowercase hex chars, got '$hexMax'")
    if (hexMax == "ff") d
    else d.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) <= lit(hexMax))
  }

  // ====================================================================
  // Shared in-session tables (the kmvSketchTable / edge-index / trained-
  // codebook discipline, round-13 optimization): the dedup family re-
  // derived the SAME deterministic intermediates query by query — the
  // 16-permutation row-mins (q14/q15/q99/q212), the 4×4 banding
  // candidates (q15/q41/q90/q145/q186/q196), the exact Jaccard pair
  // table (q16/q186/q196 truth arms and their q222/q223 sampled twins),
  // the keeper intersection table (q39/q88) and the cluster assignment
  // (q41/q106/q206). Each is now computed ONCE per (session, corpus
  // fingerprint, sample) and served from a bounded Memo: at 100 TB these
  // are exactly the artifacts a dedup pipeline materializes once and
  // reads many times (the sketch, the candidate set, the truth table for
  // eval, the cluster map), so the sharing is the production shape, not
  // a bench trick. Values are unchanged by construction — every consumer
  // reads the identical frame it previously derived itself; thresholded
  // consumers filter the ROUNDED jaccard exactly as jaccardOf's own
  // final filter does, so pairs(τ) ≡ pairs(0.05).filter(j ≥ τ) for every
  // τ ≥ 0.05 (the suite's lowest threshold).
  // ====================================================================

  private def docsFingerprint(spark: SparkSession, dir: String): Long =
    Memo.fingerprint(spark, s"$dir/documents.parquet")

  /** The [[sampleDocs]] predicate over an arbitrary doc-id column —
    * shared by the sampled-table subset serves below so the filter can
    * never drift from the sampling definition.
    */
  private def samplePred(id: Column, hexMax: String): Column =
    substring(md5(id.cast("string")), 1, 2) <= lit(hexMax)

  // Sampled-table subset serves (round-14 optimization): every shared
  // dedup table over an md5 doc sample is a pure per-doc or per-pair
  // function of the member documents' shingle sets —
  //   mins:        rowMins groups per doc_id; a doc's 16 mins depend on
  //                ITS shingle set only (multiplicity- and doc-subset-
  //                invariant — the q215 rep-semi-join law, already
  //                relied on at the weighted-jaccard call site);
  //   candidates:  (a, b) is a candidate iff a and b share a band
  //                signature and a < b — a pairwise predicate of the
  //                two docs' signatures;
  //   exact pairs: (a, b, common, jaccard) at τ are pure functions of
  //                the two docs' shingle sets.
  // Hence table(sample) ≡ table(full).filter(member ∈ sample) VALUE FOR
  // VALUE, and the q222/q223 sampled twins can ride the ff memos their
  // full-corpus siblings (q14-q16/q186/q196) already built instead of
  // re-running the whole shingle-explode pipeline over the sample. The
  // serve is OPPORTUNISTIC — only when the ff entry is already memoized
  // in this session: a sampled-only workload (the 100-TB recipe, where
  // the sample is the only affordable truth arm) must never trigger a
  // full-corpus build it didn't ask for.

  /** LAZY persist for memoized shared tables — deliberately NOT
    * materialized at build time: an eager count() flips the
    * InMemoryRelation's statistics from plan estimates to actual bytes,
    * which re-plans the BUILDING query's own joins (measured on q148:
    * the reps-fetch broadcasts became sort-merge joins, +8 s cold). The
    * first consumer materializes the cache mid-pipeline exactly as the
    * un-shared code did; later consumers read it populated.
    */
  private def lazyPersist(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private val minsTableCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), DataFrame]

  /** The 16-permutation row-mins table over the `hexMax` md5 doc sample
    * — ONE shingle explode + Kirsch–Mitzenmacher mins pass per (corpus,
    * sample) serving the signature/candidate/estimate/planner family.
    */
  private[ops] def minsTable16(spark: SparkSession, dir: String,
      hexMax: String = "ff"): DataFrame =
    Memo.cached(minsTableCache,
        (spark, dir, hexMax, docsFingerprint(spark, dir)),
        onEvict = (df: DataFrame) => df.unpersist(),
        label = s"mins16/$hexMax") {
      val fromFf =
        if (hexMax == "ff") None
        else minsTableCache.get(
          (spark, dir, "ff", docsFingerprint(spark, dir)))
      fromFf match {
        // doc-subset invariance: a doc's row-mins depend on its own
        // shingle set only, so the sampled table IS the memoized full
        // table filtered to sampled ids — no second shingle explode
        case Some(full) =>
          lazyPersist(full.filter(samplePred(col("doc_id"), hexMax)))
        case None =>
          lazyPersist(
            rowMins(shingleRowsOf(sampleDocs(docs(spark, dir), hexMax)), 16))
      }
    }

  private val candTableCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), DataFrame]

  /** The 4×4-banding candidate pairs over the `hexMax` sample — the q15
    * shape, folded from the memoized mins table and itself memoized (it
    * has six consumers across the suite).
    */
  private[ops] def bandCandidates44(spark: SparkSession, dir: String,
      hexMax: String = "ff"): DataFrame =
    Memo.cached(candTableCache,
        (spark, dir, hexMax, docsFingerprint(spark, dir)),
        onEvict = (df: DataFrame) => df.unpersist(),
        label = s"bandCandidates44/$hexMax") {
      val fromFf =
        if (hexMax == "ff") None
        else candTableCache.get(
          (spark, dir, "ff", docsFingerprint(spark, dir)))
      fromFf match {
        // pairwise subset law: (a, b) is a candidate of the sampled
        // corpus iff it is a candidate of the full corpus with both
        // endpoints sampled — no sampled band self-join at all
        case Some(full) =>
          lazyPersist(full.filter(
            samplePred(col("doc_a"), hexMax) &&
              samplePred(col("doc_b"), hexMax)))
        case None =>
          lazyPersist(candidatePairs(
            bandSignaturesFromMins(minsTable16(spark, dir, hexMax), 4, 4)))
      }
    }

  private val pairTableCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), DataFrame]

  /** The exact shingle-Jaccard pair table at the suite's LOWEST
    * threshold (τ = 0.05, q16's default) over the `hexMax` sample —
    * already eager (jaccardPairsOf localCheckpoints). Consumers at any
    * τ ≥ 0.05 filter the rounded jaccard, which is exactly the filter
    * jaccardPairsOf itself applies last, so the served values are
    * identical to a direct computation at τ.
    */
  private[ops] def exactPairTable(spark: SparkSession, dir: String,
      hexMax: String = "ff"): DataFrame =
    Memo.cached(pairTableCache,
        (spark, dir, hexMax, docsFingerprint(spark, dir)),
        onEvict = Memo.releaseOnEvict,
        label = s"exactPairTable/$hexMax") {
      val fromFf =
        if (hexMax == "ff") None
        else pairTableCache.get(
          (spark, dir, "ff", docsFingerprint(spark, dir)))
      fromFf match {
        // pairwise subset law: (doc_a, doc_b, common, jaccard) are pure
        // functions of the two docs' shingle sets, so the sampled pair
        // table IS the full (already checkpointed) table filtered to
        // pairs with both members sampled — the whole sampled truth-arm
        // build (rep tables + hybrid pair join) disappears
        case Some(full) =>
          full.filter(
            samplePred(col("doc_a"), hexMax) &&
              samplePred(col("doc_b"), hexMax))
        case None =>
          // the dir-keyed scaffold rides the memoized repTables, so the
          // identity tables are shared with q148's PPJoin
          shingleSetPairsDedupFirstAt(spark, dir, hexMax)(
            hybridJaccardRepPairs(spark, _, 0.05, 256))
      }
    }

  /** Per-doc distinct SET of 64-bit shingle hashes: xxhash64 applied
    * BEFORE array_distinct, so two distinct shingle strings colliding to
    * one hash count once everywhere (intersections stay set-exact over
    * the hashed domain — ADVICE r2) and the dedup compares 8-byte longs
    * instead of ~25-byte strings.
    */
  private[ops] def hashedShingleSet(t: Column): Column =
    array_distinct(transform(shinglesOf(t), s => xxhash64(s)))

  /** Exact dedup via content hash: sha256 groups, keeper = min doc_id.
    * Reuses the engine's hashing idea relationally (the reference's F3
    * machinery as a groupBy key — SURVEY.md §2.12).
    */
  def exactDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .groupBy(sha2($"text", 256).as("content_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("copies"))
  }

  /** MinHash signatures, standard b×r banding: k = bands × rowsPerBand
    * hash "permutations", band B's signature = md5 of the concatenated
    * row-mins for hashes B·r .. B·r+r−1. Two docs share band B's
    * signature iff ALL r row-mins agree, so for Jaccard j the candidate
    * probability follows the S-curve P = 1 − (1 − jʳ)ᵇ — steep around
    * j ≈ (1/b)^(1/r) ≈ 0.71 at the default 4×4, which is what makes
    * precision/recall TUNABLE (r=1 banding degenerates to "any shared
    * min", flooding candidates with low-j pairs). Banding turns near-dup
    * search into an equi-join on (band, sig).
    *
    * The k permutations come from Kirsch–Mitzenmacher double hashing:
    * ONE md5 per shingle splits into two 32-bit words (h1, h2) and
    * permutation i is (h1 + i·h2) mod 2³² — the published construction
    * for simulating k independent hash functions from two. Measured on
    * the 10×-replicated corpus this cut the signature stage ~10×: k
    * salted md5's per shingle made hashing, not the shuffle, the
    * bottleneck (md5 allocates; the derived permutations are three long
    * ops each and stay inside codegen).
    */
  def minhashSignatures(spark: SparkSession, dir: String, bands: Int = 4,
      rowsPerBand: Int = 4): DataFrame =
    // the pipeline-default 4×4 geometry folds its bands from the shared
    // memoized mins table (identical values — bandSignatures IS this
    // fold over a freshly-derived mins frame); other geometries keep the
    // direct path
    if (bands == 4 && rowsPerBand == 4)
      bandSignaturesFromMins(minsTable16(spark, dir), bands, rowsPerBand)
    else bandSignatures(shingleRows(spark, dir), bands, rowsPerBand)

  /** Per-doc MinHash row-mins m0..m(k−1) — the Kirsch–Mitzenmacher
    * permutation mins before any banding. Shared by [[bandSignatures]]
    * and the estimate-vs-exact gate so the two read identical sketches.
    * All k row-mins aggregate in ONE groupBy (k min-columns with
    * map-side combine).
    */
  private[ops] def rowMins(sh: DataFrame, k: Int): DataFrame = {
    import sh.sparkSession.implicits._
    // one md5, materialized once, then k derived permutations; operands
    // stay < 2³⁶ so the long arithmetic can't overflow (ANSI mode)
    val hashed = sh
      .select($"doc_id", md5($"sh").as("h"))
      .select($"doc_id",
        conv(substring($"h", 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring($"h", 9, 8), 16, 10).cast("long").as("h2"))
    val mins = (0 until k).map(i =>
      min(($"h1" + lit(i.toLong) * $"h2") % lit(4294967296L)).as(s"m$i"))
    hashed.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
  }

  /** The banding core over pre-exploded (doc_id, sh) rows: the
    * [[rowMins]] table unpivots to b (band, sig) rows — one scan + one
    * shuffle instead of a per-band union chain's b of each.
    * Package-private so the S-curve property test can feed synthetic
    * shingle sets with exact Jaccard.
    */
  private[ops] def bandSignatures(sh: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    bandSignaturesFromMins(rowMins(sh, bands * rowsPerBand), bands, rowsPerBand)

  /** The band fold alone, over a pre-computed (possibly cached) row-mins
    * table — split out so the estimate gate can derive candidates and
    * agreement from ONE cached sketch.
    */
  private[ops] def bandSignaturesFromMins(mins: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    import mins.sparkSession.implicits._
    mins
      .select($"doc_id", explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i")): _*))
            .as("sig"))
      }: _*)).as("bs"))
      .select($"doc_id", $"bs.band".as("band"), $"bs.sig".as("sig"))
  }

  /** Near-dup candidate pairs: docs sharing any band signature. The
    * bucket join keys on xxhash64(band, sig) — one 8-byte long instead
    * of an (int, 32-char md5) composite — plus residual exact (band, sig)
    * equality so a 64-bit hash collision across distinct signatures can
    * never emit a false pair: the result is exact by construction, not
    * merely exact-with-probability-1-2⁻⁶⁴. The signature table is
    * docs × bands rows, so carrying the md5 through this one small
    * shuffle is noise; the savings of the 8-byte key matter in the
    * shingle joins below, which keep it.
    */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    bandCandidates44(spark, dir)

  /** The bucket self-join over a (doc_id, band, sig) signature table —
    * shared by [[minhashCandidates]] and the estimate gate (which feeds
    * it signatures derived from a cached mins table) so the candidate
    * semantics cannot drift between the two.
    */
  private[ops] def candidatePairs(signatures: DataFrame): DataFrame = {
    import signatures.sparkSession.implicits._
    val sigs = signatures
      .select($"doc_id", $"band", $"sig", xxhash64($"band", $"sig").as("bucket"))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash Jaccard ESTIMATE vs ground truth on the candidate pairs —
    * the sketch-accuracy gate for the dedup pipeline (the q65/q29/q58
    * estimate-vs-exact pattern applied to MinHash): est = fraction of
    * the 16 permutation mins two docs agree on, exact = hashed
    * shingle-set Jaccard via array_intersect on the per-doc sets, and
    * `within_tol` pins |est − exact| ≤ 0.35 (slightly tighter than the
    * 3σ binomial bound at j ≈ 0.5, which is 3·√(0.25/16) = 0.375).
    * The banding geometry is PINNED to the pipeline's 4×4 default — a
    * knob here would desync the gate from the sketch q15/q41 actually
    * use (and from the oracle's range(16)). Everything is integer
    * agreement counts and exact rationals — no float fold anywhere —
    * so the oracle recomputes the identical values from the same md5
    * double-hashing construction.
    *
    * Scale: candidates are the banded q15 output (never all-pairs) and
    * derive from the SAME cached row-mins table the agreement reads —
    * one corpus scan for the sketch, one for the exact sets (cached:
    * two candidate-side consumers each), instead of rebuilding the
    * shingle pipeline per consumer (the q39/q88 lesson). The exact
    * re-score joins each candidate to two bounded per-doc arrays.
    */
  def minhashEstimateVsExact(spark: SparkSession, dir: String,
      tol: Double = 0.35): DataFrame = {
    import spark.implicits._
    val bands = 4
    val rowsPerBand = 4
    val k = bands * rowsPerBand
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the mins come from the shared memoized table (the memo owns the
    // persist lifetime); only the per-doc exact sets are query-local
    val mins = minsTable16(spark, dir)
    val sets = docs(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id", hashedShingleSet($"t").as("set"))
      .select($"doc_id", $"set", size($"set").cast("long").as("n"))
      .persist(lvl)
    try {
      val cand = candidatePairs(bandSignaturesFromMins(mins, bands, rowsPerBand))
      val agree = (0 until k)
        .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      cand
        .join(mins.as("a"), $"doc_a" === col("a.doc_id"))
        .join(mins.as("b"), $"doc_b" === col("b.doc_id"))
        .select($"doc_a", $"doc_b", agree.as("n_agree"))
        .join(sets.select($"doc_id".as("doc_a"), $"set".as("sa"), $"n".as("na")), "doc_a")
        .join(sets.select($"doc_id".as("doc_b"), $"set".as("sb"), $"n".as("nb")), "doc_b")
        .select($"doc_a", $"doc_b", $"n_agree",
          round($"n_agree".cast("double") / k, 6).as("est_jaccard"),
          size(array_intersect($"sa", $"sb")).cast("long").as("common"),
          $"na", $"nb")
        .select($"doc_a", $"doc_b", $"n_agree", $"est_jaccard",
          round($"common".cast("double") / ($"na" + $"nb" - $"common"), 6)
            .as("jaccard"))
        .withColumn("within_tol",
          abs($"est_jaccard" - $"jaccard") <= tol)
        .localCheckpoint(true)
    } finally {
      sets.unpersist()
    }
  }

  /** Dedup clusters: connected components over the MinHash candidate
    * graph, labels = min doc_id per component — the step that turns
    * pairwise near-dup candidates into keep/drop groups. The DuckDB
    * oracle computes the same components with a recursive CTE, so an
    * entirely different algorithm must agree. Above the driver tier,
    * components come from alternating large-star/small-star contraction
    * over the edge set (see [[connectedComponents]]) — rounds operate on
    * the shrinking edge set instead of joining the full vertex table
    * every hop.
    */
  private val clusterTableCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Long, Long), DataFrame]

  def dedupClusters(spark: SparkSession, dir: String, maxIters: Int = 50,
      driverEdgeLimit: Long = 2000000L): DataFrame =
    // memoized (round-13 optimization): the cluster assignment is read
    // by q41 AND recomputed inside q106 (quality keeper) and q206
    // (cluster profile) — the docs-sized (doc_id, cluster_id) map is
    // exactly the artifact a dedup pipeline materializes once
    Memo.cached(clusterTableCache,
        (spark, dir, maxIters, driverEdgeLimit,
          docsFingerprint(spark, dir)),
        onEvict = (df: DataFrame) => df.unpersist(),
        label = "dedupClusters") {
      lazyPersist(
        dedupClustersUncached(spark, dir, maxIters, driverEdgeLimit))
    }

  private def dedupClustersUncached(spark: SparkSession, dir: String,
      maxIters: Int, driverEdgeLimit: Long): DataFrame = {
    import spark.implicits._
    // persisted: the edge set feeds count + collect (driver path) or
    // count + the propagation loop (distributed path) — without caching
    // the whole shingle->minhash->band-join pipeline runs per action
    val edges = minhashCandidates(spark, dir).select($"doc_a".as("s"), $"doc_b".as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Tiered: LSH banding leaves a candidate graph orders of magnitude
    // smaller than the corpus, so up to `driverEdgeLimit` edges a driver
    // union-find (path compression, O(E α)) beats O(log D) distributed
    // rounds of per-job scheduling overhead — the same bounded-collect
    // the dirhash digest fold relies on. Larger graphs take the
    // distributed propagation below.
    val edgeCount = edges.count()
    if (edgeCount <= driverEdgeLimit) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val collected = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      collected.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // immutable roots for every node that appears in an edge (bounded
      // by 2·E); everything else is its own singleton cluster
      val roots = collected.iterator.flatMap(e => Iterator(e._1, e._2))
        .toSet[Long].map(x => x -> find(x)).toMap
      edges.unpersist()
      // broadcast LEFT JOIN + coalesce, not a lookup UDF: stays inside
      // whole-stage codegen and keeps the doc scan column-pruned
      val rootRows = spark.createDataset(roots.toSeq)
        .toDF("edge_node", "root")
      return docs(spark, dir)
        .join(broadcast(rootRows), $"doc_id" === $"edge_node", "left")
        .select($"doc_id", coalesce($"root", $"doc_id").as("cluster_id"))
    }

    val (stars, _) = connectedComponents(edges, maxIters)
    edges.unpersist()
    // star edges cover only nodes that appear in some edge; everything
    // else is its own singleton cluster
    docs(spark, dir)
      .join(stars.select($"s".as("edge_node"), $"d".as("root")),
        $"doc_id" === $"edge_node", "left")
      .select($"doc_id", coalesce($"root", $"doc_id").as("cluster_id"))
  }

  /** Quality-aware keeper selection per near-dup cluster: instead of
    * q13/q41's "keeper = min doc_id", keep the HIGHEST-quality member of
    * each [[dedupClusters]] cluster (score = type-token ratio, the q22
    * lexical-diversity signal; ties break to min doc_id). This is the
    * policy real pretraining dedup runs — near-duplicates differ
    * slightly, and dropping the cleaner copy to keep the boilerplate one
    * throws away exactly the data the pipeline wanted.
    *
    * Scale: the cluster assignment is the q41 pipeline (LSH-bounded);
    * the score is a narrow projection; the argmax is one groupBy with a
    * min(struct) — map-side combinable, no window, no second pass.
    * Singleton clusters are dropped (they have nothing to decide).
    */
  def qualityKeeperDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = docs(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id",
        round(size(array_distinct($"t")).cast("double") / size($"t"), 6)
          .as("score"))
    dedupClusters(spark, dir)
      .join(scored, "doc_id")
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        // deterministic argmax: lowest (-score, doc_id) = highest score,
        // ties to the smallest id — same trick as the centroid assign
        min(struct((-$"score").as("neg_score"), $"doc_id".as("kid"))).as("kb"))
      .filter($"n_docs" >= 2)
      .select($"cluster_id", $"kb.kid".as("keeper"),
        (-$"kb.neg_score").as("keeper_score"), $"n_docs")
  }

  /** Distributed connected components via alternating large-star /
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): each round is two groupBy-shuffles over the CURRENT edge
    * set — which contracts toward one star per component — rather than a
    * join against the full vertex set per hop, and converges in
    * O(log² n) rounds (O(log n) observed) versus O(log diameter) hops of
    * label propagation whose every round pays the full |V| join.
    *
    * large-star: for each node u, every strictly-larger neighbor re-points
    * to m = min(N(u) ∪ {u}) — (v, m) for v ∈ N(u), v > u.
    * small-star: over parent-pointer edges (u → v, v ≤ u), u and its
    * smaller neighbors all re-point to the minimum — (v, m) for
    * v ∈ N(u) ∪ {u}, v ≠ m.
    *
    * Each star step is a groupBy(min) re-joined to the edge rows on the
    * same key — NOT a window: min gets map-side combine (a hot
    * component's key collapses to one row per map task before the
    * shuffle), and the sort-merge join streams the hot key's edge rows
    * past its single min row instead of buffering the whole group the
    * way WindowExec would. Fixpoint when the edge multiset checksum is
    * stable; the result is one (node → component-min) star per
    * component.
    *
    * Returns (star edges as (s=node, d=root), rounds-to-converge) —
    * the round count is what the ScaleBench comparison against label
    * propagation reads.
    */
  private[ops] def connectedComponents(edges: DataFrame,
      maxIters: Int = 50): (DataFrame, Int) = {
    import edges.sparkSession.implicits._
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"d".as("s"), $"s".as("d")))
      val mins = sym.groupBy($"s")
        .agg(min(least($"s", $"d")).as("m"))
      sym.join(mins, "s")
        .filter($"d" > $"s")
        .select($"d".as("s"), $"m".as("d"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient every edge child→parent (larger → smaller), group by child
      val oriented = e.select(greatest($"s", $"d").as("s"), least($"s", $"d").as("d"))
      val mins = oriented.groupBy($"s").agg(min($"d").as("m"))
      oriented.join(mins, "s")
        .select(explode(array(struct($"d".as("n"), $"m"),
          struct($"s".as("n"), $"m"))).as("x"))
        .select($"x.n".as("s"), $"x.m".as("d"))
        .filter($"s" =!= $"d")
        .distinct()
    }
    // edge-set checksum: order-independent XOR of per-edge hashes plus
    // the count — one tiny agg per round as the CHEAP fixpoint screen
    // (XOR can't overflow under ANSI mode the way sum can, and the
    // per-round distinct() means no duplicate edge ever self-cancels).
    // A checksum match is then CONFIRMED with an exact set difference —
    // run once at the fixpoint, so a 2⁻⁶⁴ collision can never declare a
    // false fixpoint and return wrong components silently.
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        coalesce(bit_xor(xxhash64($"s", $"d")), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var cur = edges.select(greatest($"s", $"d").as("s"), least($"s", $"d").as("d"))
      .filter($"s" =!= $"d").distinct().localCheckpoint(true)
    var prev = sig(cur)
    var rounds = 0
    var converged = cur.isEmpty
    // one job per round (round-14, guide §2.4): the LAZY local
    // checkpoint is materialized BY the checksum aggregate, so the
    // former localCheckpoint(true) + agg pair (two driver round-trips
    // per round) becomes one job — while the checkpoint still cuts the
    // lineage (a plain persist does NOT: the star rounds reference the
    // state several times each, so un-cut logical plans grow
    // exponentially — measured a 2 GiB plan string by round ~15)
    while (!converged && rounds < maxIters) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nextSig = sig(next)
      // equal counts + empty one-sided diff over distinct sets = equal
      converged = nextSig == prev && next.except(cur).isEmpty
      prev = nextSig
      cur = next
      rounds += 1
    }
    // a non-star edge set would emit DUPLICATE doc rows with conflicting
    // labels downstream — fail loudly instead (star contraction converges
    // in O(log² n); hitting maxIters means something is deeply wrong)
    if (!converged && rounds >= maxIters)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds")
    (cur, rounds)
  }

  /** The production dedup composition (see BASELINE.md scale table):
    * exact-dedup FIRST (collapse byte-identical copies to the min-id
    * keeper), then shingle-Jaccard only over keepers. On a corpus where
    * every doc has k copies this cuts the quadratic join term by k² while
    * returning the same near-dup structure over distinct content.
    */
  def dedupedJaccardPairs(spark: SparkSession, dir: String,
      minJaccard: Double = 0.05): DataFrame = {
    import spark.implicits._
    keeperShingleIntersections(spark, dir)
      .select($"doc_a", $"doc_b", $"common",
        round($"common".cast("double") /
          (col("na") + col("nb") - $"common"), 6).as("jaccard"))
      .filter($"jaccard" >= minJaccard)
  }

  /** The shared skeleton under the keeper-pair verifiers (q39 Jaccard,
    * q88 containment): exact-dedup keepers, per-doc hashed shingle sets
    * (hash BEFORE the per-doc distinct so intersections and set sizes
    * count the same hashed set, consistent under a collision — the
    * [[jaccardPairs]] rule), the shared-shingle intersection counts, and
    * both pair set sizes joined on as (na, nb). One definition, so the
    * two verifiers cannot drift on keepers or set semantics.
    *
    * The exploded shingle table is CACHED and set sizes are counted
    * from it: its three consumers (both self-join branches + sizes)
    * would otherwise each re-run the corpus scan and the sha256 keeper
    * shuffle — the uncached q39 plan carried FOUR parquet scans and
    * four keeper exchanges (measured 2.6 s → 1.4 s at sf0.1). The
    * cache holds (long, long) rows, smaller than the corpus it
    * replaces, and spills under MEMORY_AND_DISK. Returns the joined
    * pair table plus the release handle; callers checkpoint their
    * result and release.
    */
  private val keeperPairCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Long), DataFrame]

  private[ops] def keeperShingleIntersections(
      spark: SparkSession, dir: String): DataFrame =
    // memoized (round-13 optimization): q39 and q88 read the IDENTICAL
    // joined table — only their final select/filter differ — so the
    // keeper pipeline and the intersection self-join run once per
    // (session, corpus) and the memo owns the lifetime
    Memo.cached(keeperPairCache,
        (spark, dir, docsFingerprint(spark, dir)),
        onEvict = (df: DataFrame) => df.unpersist(),
        label = "keeperShingleIntersections") {
      import spark.implicits._
      val keepers = docs(spark, dir)
        .groupBy(sha2($"text", 256).as("content_hash"))
        .agg(min($"doc_id").as("doc_id"), first($"text").as("text"))
        .select($"doc_id", $"text")
      val sh = keepers
        .select($"doc_id", toks.as("t"))
        .select($"doc_id", explode(hashedShingleSet($"t")).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // sizes from the exploded set: sh rows are distinct per doc, so
        // the count IS the set size — no fourth keeper aggregation
        val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        // EAGER here (unlike the other memos): the joined plan reads the
        // sh cache three times and sh is released on return, so the
        // value must be materialized while sh is still alive
        val joined = lazyPersist(keeperPairRows(sh)
          .groupBy($"doc_a", $"doc_b")
          .agg(count(lit(1)).as("common"))
          .join(sizes.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
          .join(sizes.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b"))
        joined.count()
        joined
      } finally sh.unpersist()
    }

  /** The keeper intersection join's pair-row generator: one
    * (doc_a < doc_b) row per SHARED shingle, df-adaptive (round-14,
    * guide §2.5; round-13 verdict "what's wrong" #3). The plain
    * self-join keys on the shingle hash, so one boilerplate shingle
    * shared by k keepers lands k rows on ONE task and fans k² join rows
    * out of it — and because the memoized result is an
    * InMemoryRelation, AQE's skew-join splitting never sees it. Branch
    * on the MEASURED max document frequency (the hybridJaccardRepPairs
    * discipline):
    *
    *  - max df ≤ `dfCap`: the plain one-join plan, byte for byte — no
    *    overhead on corpora without boilerplate shingles;
    *  - otherwise: light shingles (df ≤ dfCap) keep the plain join;
    *    each HEAVY shingle's pair block decomposes over a deterministic
    *    `buckets`×`buckets` doc-id grid — side a replicates to its row
    *    of grid cells, side b to its column, the join keys on
    *    (sh, cell) — so a df-k shingle costs k·buckets shuffled rows
    *    and no task ever owns more than ~(k/buckets)² of its k² pair
    *    rows.
    *
    * Both branches emit EXACTLY one row per (shared shingle, ordered
    * pair): a pair (x, y) with x < y appears in the grid once, at cell
    * (bucket(x), bucket(y)) — so the grouped counts (and every q39/q88
    * value) are unchanged by construction; KeeperSkewSpec pins the
    * equivalence on a 300-doc boilerplate corpus.
    */
  private[ops] def keeperPairRows(sh: DataFrame, dfCap: Int = 256,
      buckets: Int = 16): DataFrame = {
    import sh.sparkSession.implicits._
    def pairsOf(rows: DataFrame): DataFrame = rows.as("a")
      .join(rows.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val dfreq = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
    val maxRow = dfreq.agg(max($"df")).head()
    val maxDf = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxDf <= dfCap) pairsOf(sh)
    else {
      val tagged = sh.join(dfreq, "sh")
      val light = tagged.filter($"df" <= dfCap).select($"doc_id", $"sh")
      val heavy = tagged.filter($"df" > dfCap)
        .select($"doc_id", $"sh",
          pmod(xxhash64($"doc_id"), lit(buckets.toLong)).as("bk"))
      val hvA = heavy.select($"doc_id", $"sh", $"bk".as("gi"),
        explode(sequence(lit(0L), lit((buckets - 1).toLong))).as("gj"))
      val hvB = heavy.select($"doc_id".as("doc_b"), $"sh",
        explode(sequence(lit(0L), lit((buckets - 1).toLong))).as("gi"),
        $"bk".as("gj"))
      val heavyPairs = hvA
        .join(hvB,
          Seq("sh", "gi", "gj"))
        .filter($"doc_id" < $"doc_b")
        .select($"doc_id".as("doc_a"), $"doc_b")
      pairsOf(light).unionByName(heavyPairs)
    }
  }

  /** Asymmetric containment near-dup detection over exact-dedup keepers:
    * containment(A→B) = |A∩B| / |A| on shingle sets — the signal Jaccard
    * MISSES when a small doc is wholly embedded in a big one (quote
    * farms, concatenated dumps): Jaccard divides by the union, so a
    * 100-token doc inside a 10k-token doc scores ≈ 0.01 Jaccard but 1.0
    * containment. `partial_dup` flags exactly that shape (high max
    * containment, low Jaccard). Same join skeleton and scale story as
    * [[dedupedJaccardPairs]] — exact-dedup first, hashed 8-byte shingle
    * keys, pair table bounded by shared-shingle co-occurrence.
    */
  def containmentPairs(spark: SparkSession, dir: String,
      minContainment: Double = 0.5): DataFrame = {
    import spark.implicits._
    keeperShingleIntersections(spark, dir)
      .select($"doc_a", $"doc_b", $"common",
        round($"common".cast("double") /
          (col("na") + col("nb") - $"common"), 6).as("jaccard"),
        round($"common".cast("double") / col("na"), 6).as("containment_a"),
        round($"common".cast("double") / col("nb"), 6).as("containment_b"))
      .filter(greatest($"containment_a", $"containment_b") >= minContainment)
      .withColumn("partial_dup",
        greatest($"containment_a", $"containment_b") >= 0.9 && $"jaccard" < 0.8)
  }

  /** Cross-source duplication matrix: MinHash candidate pairs rolled up
    * by canonical (source, source) — the corpus-curation view that shows
    * WHICH feeds copy from each other (mirror sites, aggregator spam) so
    * whole sources can be down-weighted instead of fighting pairwise
    * dups. The candidate stage is the banded [[minhashCandidates]] —
    * never all-pairs; the doc→source map joins are plain equi-joins (the
    * map is corpus-sized, so no forced broadcast — AQE may choose one
    * per-batch), and the final aggregate is sources²-bounded.
    */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = docs(spark, dir).select($"doc_id", $"source")
    minhashCandidates(spark, dir)
      .join(src.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(src.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select(least(col("sa.source"), col("sb.source")).as("source_a"),
        greatest(col("sa.source"), col("sb.source")).as("source_b"))
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Content-addressed digests through the engine's own `chunk_hash`
    * Catalyst expression — the reference's F3 domain-separated spec
    * (path || 0x00 || idx || 0x00 || content) applied to a relational
    * binary column: doc text bytes as chunk content, doc_id as path,
    * chunk 0. The hex digest is the dedup/content-addressing key.
    */
  def chunkHashDigests(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.ChunkHashOps.register(spark)
    docs(spark, dir)
      .select($"doc_id",
        lower(hex(call_function("chunk_hash",
          $"doc_id".cast("string"), lit(0L), encode($"text", "UTF-8"),
          lit("sha256")))).as("chunk_digest"),
        length($"text").cast("long").as("n_bytes"))
  }

  /** 32-bit SimHash per document: token hash = first 8 md5 hex chars; one
    * +1/-1 vote per bit per token occurrence; bit set iff the vote sum is
    * positive. Computed by the codegen'd `simhash32` expression in ONE
    * scan-stage pass — per-doc SimHash is a pure function of the text,
    * so the earlier explode + 32-sum-column aggregation paid a
    * corpus-sized shuffle for what is really a projection. The DuckDB
    * oracle still recomputes the votes relationally, so two different
    * algorithms must agree bit for bit.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.TextOps.register(spark)
    // null-text docs produced no token rows under the old explode shape
    // (and produce no rows in the relational oracle) — keep that contract
    // rather than emitting a NULL simhash row
    docs(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id", call_function("simhash32", $"text").as("simhash"))
  }

  /** SimHash near-duplicates: 4×8-bit band blocking (pigeonhole-complete
    * for hamming distance <= 3) then exact hamming verification via
    * bit_count(xor). The band join replaces the all-pairs comparison —
    * the same LSH shape as MinHash banding but on one 32-bit key.
    */
  def simhashNearDups(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    // each self-join branch recomputes the scan + per-doc simhash32 —
    // measured cheaper than pinning an exchange between scan and join
    // (a repartition here doubled 10x-scale wall time by blocking AQE's
    // broadcast of the band table); the join output, not the hash
    // computation, dominates at every scale we measured
    val sh = simhash(spark, dir)
    val bands = sh.select($"doc_id", $"simhash",
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(simhash, band * 8)").bitwiseAND(255))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    cand.select($"doc_a", $"doc_b",
        bit_count($"ha".bitwiseXOR($"hb")).cast("long").as("hamming"))
      .filter($"hamming" <= maxHamming)
  }

  /** Shingle-set Jaccard similarity for the most-similar doc pairs:
    * all pairs with J ≥ `minJaccard`, computed candidate-then-verify.
    *
    * Scale has TWO quadratic axes, both closed. (1) Duplication:
    * exact-dedup-first is BUILT IN via [[shingleSetPairsDedupFirst]]
    * (the q148 treatment) — identical shingle sets collapse to one
    * representative, pairing runs on representatives only, and the
    * expansion reconstructs the exact all-pairs answer, so a corpus
    * duplicated k ways pays O(d²) in DISTINCT documents. (2) Σ df²
    * across DISTINCT documents: a boilerplate shingle shared by 10⁶
    * distinct docs would fan the naive equi-join into ~10¹² rows, so
    * the rep-level pairing rides the df-adaptive
    * [[hybridJaccardRepPairs]] — the measured-statistic branch that
    * keeps the naive single-join plan whenever max df ≤ `dfCap`
    * (bounded Σ df²) and otherwise isolates heavy shingles behind a
    * prefix-bounded candidate stage so they never self-join. The LSH
    * stages (MinHash/SimHash) remain the recall-trading alternative.
    *
    * Values are identical to the naive equi-join spelling (the DuckDB
    * oracle computes exactly that); `minJaccard` must sit in [0, 1] —
    * the within-group expansion emits Jaccard-1.0 pairs uncondition-
    * ally, so a super-unit threshold would be silently ignored.
    */
  def jaccardPairs(spark: SparkSession, dir: String, minJaccard: Double = 0.05,
      dfCap: Int = 256): DataFrame = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0, 1], got $minJaccard")
    // default-geometry calls at τ ≥ 0.05 serve from the shared memoized
    // τ=0.05 table (filter on the ROUNDED jaccard — the identical final
    // filter jaccardPairsOf applies, so values are unchanged); other
    // (τ, dfCap) combinations keep the direct path
    if (minJaccard >= 0.05 && dfCap == 256)
      exactPairTable(spark, dir).filter(col("jaccard") >= minJaccard)
    else jaccardPairsOf(spark, docs(spark, dir), minJaccard, dfCap)
  }

  private[ops] def jaccardPairsOf(spark: SparkSession, d: DataFrame,
      minJaccard: Double, dfCap: Int = 256): DataFrame = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0, 1], got $minJaccard")
    shingleSetPairsDedupFirstOf(spark, d)(
      hybridJaccardRepPairs(spark, _, minJaccard, dfCap))
  }

  /** Per-document duplicated-window fraction — the exact-substring
    * duplication METRIC (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): a length-n word window is "duplicated"
    * if the identical window occurs anywhere else in the corpus
    * (another doc OR another position of the same doc), and each doc
    * reports the fraction of its windows that are. The scan emits
    * 64-bit window hashes via the codegen'd `gram_hashes` expression —
    * full strings never leave the row — and multiplicity is carried as
    * a count, so the shuffled volume is distinct-grams-per-doc, not
    * corpus positions. Docs shorter than n windows are emitted with
    * zero windows and a null fraction (total output, q72 contract).
    *
    * Scale: two hash-keyed aggregates (both map-side combined, uniform
    * 64-bit keys) and one join back on the gram hash. The global gram
    * table grows with corpus size, so nothing is force-broadcast. This
    * is the measurement pass; acting on it (cutting the duplicated
    * spans) reuses the same per-position hash stream.
    */
  /** Shared scaffold for the per-doc window-hash statistics (q77/q81):
    * gram explode → (doc, h) multiplicity aggregate → one h-keyed
    * global aggregate → join back → per-doc sums → total left join
    * (zero-window docs kept, fraction null below one window) →
    * checkpoint and release. The multiplicity table is persisted
    * because it feeds both the global aggregate and the join back —
    * Catalyst expands the self-referencing aggregate into TWO full
    * gram-explode subtrees otherwise (asymmetric IsNotNull pushdown
    * defeats AQE stage reuse — verified in the final adaptive plan);
    * the eager checkpoint of the four-numeric-columns-per-doc result
    * lets the (much larger) gram cache be released before returning —
    * the pageRankKnn lifecycle. Parameterized by the global aggregate
    * and the "this window counts" predicate over its result.
    */
  private val gramMultCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Long), DataFrame]

  /** The (doc_id, gram-hash, multiplicity) table behind the window-hash
    * statistics — memoized (round-13 optimization): q77 and q81 read the
    * IDENTICAL table (they differ only in the global aggregate applied
    * over it), so the gram explode + aggregate runs once per (session,
    * corpus fingerprint, n); the memo owns the persist lifetime.
    */
  private def gramMultiplicity(spark: SparkSession, dir: String,
      n: Int): DataFrame =
    // corpus-scale (doc, gram, m) values: a dedicated small cap so a
    // handful of n values cannot pin several corpus-sized caches at
    // once (round-13 ADVICE) — eviction only costs a recompute
    Memo.cached(gramMultCache,
        (spark, dir, n, docsFingerprint(spark, dir)),
        onEvict = (df: DataFrame) => df.unpersist(),
        label = s"gramMultiplicity/$n", cap = 4) {
      import spark.implicits._
      graft.functions.TextOps.register(spark)
      lazyPersist(docs(spark, dir)
        .select($"doc_id",
          explode(call_function("gram_hashes", $"text", lit(n))).as("h"))
        .groupBy($"doc_id", $"h").agg(count(lit(1)).as("m")))
    }

  private def gramWindowStats(spark: SparkSession, dir: String, n: Int,
      globalAgg: Column, hit: Column, hitName: String,
      fracName: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    val perDoc = gramMultiplicity(spark, dir, n)
    val global = perDoc.groupBy($"h").agg(globalAgg)
    val agg = perDoc.join(global, Seq("h"))
      .groupBy($"doc_id")
      .agg(sum($"m").as("n_windows"),
        sum(when(hit, $"m").otherwise(lit(0L))).as(hitName))
    d.select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_windows", lit(0L)).as("n_windows"),
        coalesce(col(hitName), lit(0L)).as(hitName),
        when($"n_windows" > 0,
          round(col(hitName).cast("double") / $"n_windows", 6))
          .as(fracName))
      .localCheckpoint(true)
  }

  def duplicatedWindowFraction(spark: SparkSession, dir: String,
      n: Int = 8): DataFrame =
    gramWindowStats(spark, dir, n, sum(col("m")).as("total"),
      col("total") > 1, "n_dup_windows", "dup_frac")

  /** The exact-substring dedup CUT pass — acts on what
    * [[duplicatedWindowFraction]] measures: every token covered by at
    * least one corpus-duplicated length-n window is removed, and the
    * document is re-emitted with the surviving tokens (Lee et al.'s
    * transform, token-granular). Duplication is decided on the same
    * 64-bit `gram_hashes` stream; window START positions ride the
    * (doc, gram) aggregation as packed arrays, so the shuffle stays
    * distinct-grams-per-doc-sized — positions never shuffle as
    * individual rows. The cut itself is per-doc array math: token i is
    * dropped iff some duplicated window starts in [i−n+1, i].
    *
    * Scale: identical join shape to q77 (hash-keyed aggregates + one
    * join back on the gram hash) plus a final narrow scan for the mask;
    * the per-token exists() is bounded by dup-starts-per-doc — document
    * math, not corpus math. Docs with no duplicated window pass through
    * byte-identical (single-space corpus contract).
    */
  def substringDedupCut(spark: SparkSession, dir: String,
      n: Int = 8): DataFrame = {
    import spark.implicits._
    graft.functions.TextOps.register(spark)
    val d = docs(spark, dir)
    val pos = d
      .select($"doc_id",
        posexplode(call_function("gram_hashes", $"text", lit(n))))
      .toDF("doc_id", "pos", "h")
    // persisted for the same double-expansion reason as
    // [[duplicatedWindowFraction]] — but NOT checkpoint/unpersist'd
    // like it: this op's output carries the full rewritten corpus text,
    // and an eager checkpoint would write those bytes twice. MEMORY_ONLY
    // deliberately, not MEMORY_AND_DISK: with no unpersist reachable
    // from a lazily-returned frame, memory-evicted MEMORY_AND_DISK
    // blocks would be KEPT on disk for the session; MEMORY_ONLY blocks
    // are dropped under pressure and recomputed — the degradation this
    // cache is allowed
    val perDoc = pos.groupBy($"doc_id", $"h")
      .agg(count(lit(1)).as("m"), collect_list($"pos").as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val global = perDoc.groupBy($"h").agg(sum($"m").as("total"))
    val dupStarts = perDoc.join(global, Seq("h"))
      .filter($"total" > 1)
      .groupBy($"doc_id")
      .agg(flatten(collect_list($"ps")).as("starts"))
    d.select($"doc_id", toks.as("t"))
      .join(dupStarts, Seq("doc_id"), "left")
      .withColumn("starts", coalesce($"starts", array().cast("array<int>")))
      .select($"doc_id", size($"t").cast("long").as("n_tokens"),
        filter($"t", (_, i) =>
          !exists($"starts", s => s <= i && i <= s + lit(n - 1))).as("kept"))
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - size($"kept")).cast("long").as("n_removed"),
        concat_ws(" ", $"kept").as("clean_text"))
  }

  /** Per-document n-gram NOVELTY — the share of a doc's windows whose
    * gram no EARLIER document (smaller doc_id = earlier in the ingest
    * order) contains. The curation signal for ordered ingestion: a
    * low-novelty doc adds little the corpus hasn't seen; streaming
    * crawlers drop or down-weight it. Repeats within the introducing
    * doc itself still count as novel (the doc introduced the gram).
    *
    * Scale: the q77 aggregate shape with min(doc_id) instead of a
    * count — same map-side-combined hash-keyed aggregates, same join
    * back, total over docs.
    */
  def gramNovelty(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    gramWindowStats(spark, dir, n, min(col("doc_id")).as("fd"),
      col("fd") === col("doc_id"), "n_novel", "novelty_frac")

  /** Incremental ingest dedup — dedup a NEW batch against the EXISTING
    * corpus without touching corpus-vs-corpus pairs: per incoming doc,
    * an exact verdict (content hash already present in the base) and a
    * near-dup candidate count (MinHash band-signature matches against
    * base docs only). The batch membership is the md5 hash split (base
    * = prefix ≤ '7f'), standing in for "what was ingested yesterday".
    *
    * Scale: the exact check is a semi-join shape on uniform 256-bit
    * hashes; candidates reuse the q14 banding so incoming signatures
    * probe base BUCKETS — never all-pairs, and never base×base. In
    * production the base half of both tables (content hashes, band
    * signatures) is precomputed and stored bucketed by its join key, so
    * an ingest batch shuffles only ITSELF — the corpus-sized side is
    * read in place; here both halves derive from one table because the
    * testdata has a single corpus. Output is total over incoming docs
    * (zero-candidate rows included).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def isBase(id: Column): Column =
      substring(md5(id.cast("string")), 1, 2) <= "7f"
    // persisted: the hashed doc table feeds the base side and the
    // incoming side — one scan + sha256 pass instead of two; released
    // with the signature cache below
    val d = docs(spark, dir)
      .select($"doc_id", sha2($"text", 256).as("ch"), isBase($"doc_id").as("is_base"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: the signature pipeline (shingle explode + 16-min agg +
    // band unpivot) feeds both the incoming and the base side of the
    // bucket probe; without the cache it runs twice end to end
    val sigs = minhashSignatures(spark, dir)
      .withColumn("is_base", isBase($"doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val baseHashes = d.filter($"is_base").select($"ch").distinct()
        .withColumn("hit", lit(true))
      val cand = sigs.filter(!$"is_base").as("a")
        .join(sigs.filter($"is_base").as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("base_doc"))
        .groupBy($"doc_id")
        .agg(countDistinct($"base_doc").as("n_near_candidates"))
      // eager checkpoint of the per-incoming-doc verdicts, then release
      // both caches — the pageRankKnn lifecycle
      d.filter(!$"is_base")
        .join(baseHashes, Seq("ch"), "left")
        .select($"doc_id", coalesce($"hit", lit(false)).as("is_exact_dup"))
        .join(cand, Seq("doc_id"), "left")
        .select($"doc_id", $"is_exact_dup",
          coalesce($"n_near_candidates", lit(0L)).as("n_near_candidates"),
          (!$"is_exact_dup").as("keep"))
        .localCheckpoint(true)
    } finally {
      sigs.unpersist()
      d.unpersist()
    }
  }

  /** Prefix-filtered EXACT similarity join (q148, PPJoin family): all
    * pairs with shingle-set Jaccard ≥ `t`, with NO false negatives —
    * the algorithmic alternative to MinHash banding (probabilistic
    * recall) and to q16's all-pairs join (quadratic in duplication).
    * Shingles sort by (document frequency, hash) — one global order,
    * realized per doc by sorting the (df, sh) pairs, NO materialized
    * global rank — and only each set's safe prefix (n − ⌈t·n⌉ + 1
    * rarest shingles) enters the candidate self-join: two sets with
    * J ≥ t provably share a prefix element, and rare-shingle blocks
    * are small, so the join fans out where near-dups actually are.
    * Candidates then verify by exact intersection counting. The oracle
    * computes the same pairs the NAIVE way (q16's SQL + threshold), so
    * the no-false-negative claim is value-checked, not asserted.
    */
  def prefixJaccardJoin(spark: SparkSession, dir: String,
      t: Double = 0.6): DataFrame = {
    require(t >= 0.0 && t <= 1.0, s"t must be in [0, 1], got $t")
    shingleSetPairsDedupFirst(spark, dir)(
      prefixVerifiedRepPairs(spark, _, t))
  }

  /** The PPJoin candidate-then-verify core of [[prefixJaccardJoin]]
    * (q148), over the dedup-first representative table
    * `(doc_id, shs, n)`: shingles sort by (document frequency, hash) —
    * one global order realized per doc by a doc-partitioned rank, NO
    * materialized global order — and only each set's safe prefix
    * (n − ⌈τ·n⌉ + 1 rarest shingles) enters the candidate self-join:
    * two sets with J ≥ τ provably share a prefix element, and
    * rare-shingle blocks are small, so the join fans out where
    * near-dups actually are. Candidates verify by exact hashed-array
    * intersection — one pass over na+nb elements per pair, the right
    * verify when the HIGH threshold keeps candidates sparse
    * (at low thresholds candidates approach all co-occurring pairs and
    * the array traffic dominates — that regime belongs to
    * [[hybridJaccardRepPairs]]).
    *
    * The prefix length is computed at τ − 2e-6, not τ: the FINAL filter
    * compares the 6-dp ROUNDED Jaccard against τ, so a pair at exact
    * J = τ − 4e-7 rounds up and must be kept — the slack keeps the
    * bound sound for every pair the rounded filter admits (one extra
    * prefix element at worst).
    */
  private[ops] def prefixVerifiedRepPairs(spark: SparkSession,
      reps: DataFrame, t: Double): DataFrame = {
    import spark.implicits._
    val cand = prefixCandidates(spark, reps, t)
    cand
      .join(reps.select($"doc_id".as("rep_a"), $"shs".as("sa"),
        $"n".as("na")), Seq("rep_a"))
      .join(reps.select($"doc_id".as("rep_b"), $"shs".as("sb"),
        $"n".as("nb")), Seq("rep_b"))
      .select($"rep_a", $"rep_b",
        size(array_intersect($"sa", $"sb")).cast("long").as("common"),
        $"na", $"nb")
      .select($"rep_a", $"rep_b", $"common",
        round($"common".cast("double") / ($"na" + $"nb" - $"common"), 6)
          .as("jaccard"))
      .filter($"jaccard" >= t)
  }

  /** The df-ADAPTIVE exact pair core of [[jaccardPairs]] (q16): the
    * Σ df² hazard in the naive postings self-join is driven by HEAVY
    * (high-df, boilerplate) shingles, not by the threshold — and q16's
    * default τ=0.05 is exactly where the PPJoin prefix stops pruning
    * (the prefix is 1−τ of every doc). So the plan branches on a
    * MEASURED statistic, the optimizer way:
    *
    *  - max df ≤ `dfCap` (one 1-row aggregate over the df table — the
    *    bounded-scalar pattern): the plain postings join + groupBy
    *    count, whose row count Σ df² ≤ dfCap·|postings| is LINEAR in
    *    the corpus. No boilerplate ⇒ zero overhead over the naive plan.
    *  - otherwise, split postings at dfCap. LIGHT∩LIGHT commons come
    *    from the same bounded join over light postings only; each
    *    such pair adds its HEAVY overlap by exploding the per-doc heavy
    *    postings (candidate-driven, skinny rows). Pairs sharing NO
    *    light shingle can only qualify through ≥ ⌈τ·n⌉ shared heavy
    *    shingles, so each doc exposes only the |H_d| − ⌈τ·n_d⌉ + 1
    *    rarest of its heavy shingles as heavy-only candidate
    *    generators (the PPJoin prefix lemma applied to the heavy
    *    subsets; docs whose heavy set is smaller than ⌈τ·n⌉ generate
    *    NONE — a df=10⁶ boilerplate shingle in ordinary documents
    *    produces zero join rows). Anti-joining the light pairs keeps
    *    the two branches disjoint; both are exact counts, so the union
    *    is the naive answer value-for-value.
    *
    * τ enters the heavy-prefix length at τ − 2e-6 (the
    * [[prefixVerifiedRepPairs]] rounding slack). Returns an EAGER pair
    * table; internal caches are released before returning.
    */
  private[ops] def hybridJaccardRepPairs(spark: SparkSession,
      reps: DataFrame, t: Double, dfCap: Int = 256): DataFrame = {
    import spark.implicits._
    val tEff = math.max(0.0, t - 2e-6)
    val sh = reps.select($"doc_id", $"n", explode($"shs").as("sh"))
    val sizes = reps.select($"doc_id", $"n".cast("long").as("n"))
    def jaccardOf(pairs: DataFrame): DataFrame =
      pairs
        .join(sizes.select($"doc_id".as("rep_a"), $"n".as("na")), Seq("rep_a"))
        .join(sizes.select($"doc_id".as("rep_b"), $"n".as("nb")), Seq("rep_b"))
        .select($"rep_a", $"rep_b", $"common",
          round($"common".cast("double") / ($"na" + $"nb" - $"common"), 6)
            .as("jaccard"))
        .filter($"jaccard" >= t)
    val dfreq = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val maxRow = dfreq.agg(max($"df")).head()
      val maxDf = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      if (maxDf <= dfCap) {
        // fast path: the bounded naive join, one shuffle + one groupBy
        val common = sh.as("a")
          .join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
          .agg(count(lit(1)).as("common"))
        jaccardOf(common).localCheckpoint(true)
      } else {
        val post = sh.join(dfreq, "sh")
        val light = post.filter($"df" <= dfCap)
          .select($"doc_id", $"sh")
        val heavy = post.filter($"df" > dfCap)
          .select($"doc_id", $"n", $"sh", $"df")
        val cLL = light.as("a")
          .join(light.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
          .agg(count(lit(1)).as("c_l"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val hvA = heavy.select($"doc_id".as("rep_a"), $"sh")
          val hvB = heavy.select($"doc_id".as("rep_b"), $"sh")
          val cLH = cLL.select($"rep_a", $"rep_b")
            .join(hvA, Seq("rep_a"))
            .join(hvB, Seq("rep_b", "sh"))
            .groupBy($"rep_a", $"rep_b").agg(count(lit(1)).as("c_h"))
          val pairsLight = cLL
            .join(cLH, Seq("rep_a", "rep_b"), "left")
            .select($"rep_a", $"rep_b",
              ($"c_l" + coalesce($"c_h", lit(0L))).as("common"))
          // heavy-only candidates via the prefix lemma on heavy subsets
          val wH = Window.partitionBy($"doc_id").orderBy($"df", $"sh")
          val hCnt = heavy.groupBy($"doc_id").agg(count(lit(1)).as("hn"))
          val hpref = heavy.join(hCnt, Seq("doc_id"))
            .withColumn("rn", row_number().over(wH))
            .filter($"rn" <=
              greatest(lit(0L),
                ($"hn" - ceil(lit(tEff) * $"n") + 1).cast("long")))
            .select($"doc_id", $"sh")
          val candH = hpref.as("a")
            .join(hpref.as("b"),
              col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
            .distinct()
            .join(cLL.select($"rep_a", $"rep_b"), Seq("rep_a", "rep_b"),
              "left_anti")
          val pairsHeavy = candH
            .join(hvA, Seq("rep_a"))
            .join(hvB, Seq("rep_b", "sh"))
            .groupBy($"rep_a", $"rep_b").agg(count(lit(1)).as("common"))
          jaccardOf(pairsLight.unionByName(pairsHeavy))
            .localCheckpoint(true)
        } finally cLL.unpersist()
      }
    } finally dfreq.unpersist()
  }

  /** Doc-partitioned (df, sh)-ranked postings with each doc's safe
    * prefix length at τ − 2e-6: (doc_id, sh, rn, plen). Shared by the
    * verify core and [[prefixCandidates]].
    */
  private def rankedPostings(spark: SparkSession, reps: DataFrame,
      t: Double): DataFrame = {
    import spark.implicits._
    val tEff = math.max(0.0, t - 2e-6)
    val sh = reps.select($"doc_id", $"n", explode($"shs").as("sh"))
    val dfreq = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"df", $"sh")
    sh.join(dfreq, "sh")
      .withColumn("rn", row_number().over(w))
      .withColumn("plen",
        greatest(lit(0L),
          ($"n" - ceil(lit(tEff) * $"n") + 1).cast("long")))
      .select($"doc_id", $"sh", $"rn", $"plen", $"n")
  }

  /** Candidate pairs of [[prefixVerifiedRepPairs]] — exposed so the
    * prune is testable: a corpus-wide boilerplate shingle must generate
    * ZERO candidates once every doc's prefix excludes it.
    *
    * Round-9: PPJoin+ POSITIONAL filtering on top of the prefix lemma.
    * A matched prefix token at ranks (i, j) of docs (a, b) bounds the
    * whole intersection: every OTHER shared token sorts after the first
    * shared one in BOTH docs (same global (df, sh) order), so
    * common ≤ 1 + min(na − i, nb − j). J ≥ τ needs
    * common ≥ τ/(1+τ)·(na+nb), so a matched row whose positional bound
    * misses that floor cannot certify the pair — and a pair none of
    * whose matched rows pass has common < the floor (the FIRST shared
    * token carries the LARGEST bound, which dominates the true common).
    * The length filter (min(n) ≥ τ·max(n)) prunes impossible size
    * ratios before the bound is even evaluated. Both bounds use
    * τ − 2e-6 and an absolute 1e-6 slack, so every pair the 6-dp
    * ROUNDED verify would keep still reaches the verify — soundness is
    * value-checked by the q148 oracle (the naive SQL), not asserted.
    */
  private[ops] def prefixCandidates(spark: SparkSession, reps: DataFrame,
      t: Double): DataFrame = {
    import spark.implicits._
    val tEff = math.max(0.0, t - 2e-6)
    val pref = rankedPostings(spark, reps, t)
      .filter($"rn" <= $"plen").select($"doc_id", $"sh", $"rn", $"n")
    pref.as("a")
      .join(pref.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .filter(least(col("a.n"), col("b.n")).cast("double") >=
        lit(tEff) * greatest(col("a.n"), col("b.n")) - lit(1e-6))
      .filter((lit(1L) + least(col("a.n") - col("a.rn"),
          col("b.n") - col("b.rn"))).cast("double") >=
        lit(tEff / (1.0 + tEff)) * (col("a.n") + col("b.n")) - lit(1e-6))
      .select(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
      .distinct()
  }

  /** Exact-dedup-first scaffold shared by the shingle-set pair operators
    * (q16 jaccardPairs, q148 prefixJaccardJoin) — the q39 lesson applied
    * WITHOUT changing the output contract: identical shingle SETS
    * collapse to one representative before any pairing; `pairFn`
    * computes the (already-thresholded) pairs over the persisted rep
    * table `(doc_id, shs, n)` only; every within-group pair is
    * Jaccard 1.0 by identity and every cross-group pair inherits its
    * representative pair's (common, jaccard) verbatim, so the expansion
    * reconstructs the exact all-pairs answer. On a corpus duplicated
    * k ways this moves the expensive pair stage from O((k·d)²) to O(d²)
    * and leaves only the irreducible output-sized expansion join
    * (measured on q148: 239 s → output-bound at 10× replication; any
    * threshold ≤ 1 keeps the within-group pairs, so both callers'
    * filters commute with the expansion).
    */
  /** Generic rep-pair → member-pair expansion (the back half of the
    * dedup-first treatment, shared across the pair family): `grouped`
    * maps every doc to its identity group `(doc_id, gkey)`, `repPairs`
    * holds pair values computed between group REPRESENTATIVES
    * (rep = min doc_id per group) with the value columns `valueCols`.
    * Every (member-of-A, member-of-B) pair inherits its rep pair's
    * values verbatim — valid whenever the values are pure functions of
    * the deduped content, which is what the grouping key certifies.
    * Emits (doc_a, doc_b, values...) with doc_a < doc_b; within-group
    * pairs are the CALLER's job (their values come from one group, not
    * a rep pair).
    */
  private[ops] def expandRepPairs(grouped: DataFrame, repPairs: DataFrame,
      valueCols: Seq[String]): DataFrame = {
    val repKey = grouped.select(col("doc_id").as("rep"), col("gkey"))
    repPairs
      .join(repKey.select(col("rep").as("rep_a"), col("gkey").as("ga")), Seq("rep_a"))
      .join(repKey.select(col("rep").as("rep_b"), col("gkey").as("gb")), Seq("rep_b"))
      .join(grouped.select(col("doc_id").as("xa"), col("gkey").as("ga")), Seq("ga"))
      .join(grouped.select(col("doc_id").as("xb"), col("gkey").as("gb")), Seq("gb"))
      .select((least(col("xa"), col("xb")).as("doc_a") +:
        greatest(col("xa"), col("xb")).as("doc_b") +:
        valueCols.map(col)): _*)
  }

  /** Identity-group key over the sorted hashed-shingle array: a STRUCT
    * of two independently-seeded xxhash64s (≈128-bit collision margin,
    * the md5 class) instead of the former md5(to_json(...)) — to_json
    * serialized every array to a JSON string per doc just to hash it,
    * pure codegen-unfriendly CPU in the corpus-dominating scan, and the
    * 32-char hex key was 2.5× the struct's 16 bytes in every gkey
    * shuffle (guide §2.3: narrower keys, cheaper expressions). The key
    * is internal (groupBy/join only, never output), identical sets
    * still collide by construction, and the oracle value-gates every
    * consumer at three SFs.
    */
  private def gkeyOf(shs: Column): Column =
    struct(xxhash64(shs).as("h1"), xxhash64(lit(1L), shs).as("h2"))
      .as("gkey")

  private val repTablesCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), (DataFrame, DataFrame)]

  /** Memoized dedup-first identity tables over the `hexMax` sample —
    * (grouped = (doc_id, shs, gkey, n), reps = one row per distinct
    * shingle set): q16's pair build and q148's PPJoin each derived the
    * IDENTICAL tables (the corpus-dominating shingle-hash scan plus the
    * identity groupBy); one persisted build now serves both (round-13
    * optimization), and the memo owns the lifetime.
    */
  private def repTables(spark: SparkSession, dir: String,
      hexMax: String): (DataFrame, DataFrame) =
    Memo.cached(repTablesCache,
        (spark, dir, hexMax, docsFingerprint(spark, dir)),
        onEvict = (v: (DataFrame, DataFrame)) => {
          v._1.unpersist(); v._2.unpersist(); ()
        }, label = s"repTables/$hexMax") {
      import spark.implicits._
      val grouped = sampleDocs(docs(spark, dir), hexMax)
        .select($"doc_id", array_sort(hashedShingleSet(toks)).as("shs"))
        .select($"doc_id", $"shs", gkeyOf($"shs"), size($"shs").as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val reps = grouped
        .groupBy($"gkey").agg(min($"doc_id").as("doc_id"))
        .join(grouped.select($"doc_id", $"shs", $"n"), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // lazily persisted on purpose — see [[lazyPersist]]: eager
      // materialization here re-planned the building query's joins off
      // the actual cached bytes (q148's broadcasts became sort-merge)
      (grouped, reps)
    }

  private def shingleSetPairsDedupFirst(spark: SparkSession, dir: String)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    val (grouped, reps) = repTables(spark, dir, "ff")
    dedupFirstExpand(grouped, reps)(pairFn)
  }

  /** The dir-keyed dedup-first scaffold over the memoized [[repTables]]
    * — q16/q148/q186/q196 and the sampled twins all enter here.
    */
  private def shingleSetPairsDedupFirstAt(spark: SparkSession,
      dir: String, hexMax: String)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    val (grouped, reps) = repTables(spark, dir, hexMax)
    dedupFirstExpand(grouped, reps)(pairFn)
  }

  /** The arbitrary-DataFrame variant (tests, non-corpus inputs): builds
    * and releases its own identity tables.
    */
  private def shingleSetPairsDedupFirstOf(spark: SparkSession, d: DataFrame)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val grouped = d
      .select($"doc_id", array_sort(hashedShingleSet(toks)).as("shs"))
      .select($"doc_id", $"shs", gkeyOf($"shs"), size($"shs").as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // reps is read by multiple consumers (pairFn's shingle explode and
    // verify fetches) — without the persist each one re-runs the
    // groupBy(gkey)+self-join dedup pipeline from the top
    val reps = grouped
      .groupBy($"gkey").agg(min($"doc_id").as("doc_id"))
      .join(grouped.select($"doc_id", $"shs", $"n"), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try dedupFirstExpand(grouped, reps)(pairFn)
    finally { reps.unpersist(); grouped.unpersist() }
  }

  /** The shared back half of the dedup-first treatment: run `pairFn`
    * over the reps, expand rep pairs to member pairs, add the
    * within-group Jaccard-1.0 pairs, checkpoint.
    */
  private def dedupFirstExpand(grouped: DataFrame, reps: DataFrame)(
      pairFn: DataFrame => DataFrame): DataFrame = {
    import grouped.sparkSession.implicits._
    val members = grouped.select($"doc_id", $"gkey", $"n")
    val repPairs = pairFn(reps)
    // expansion: cross-group pairs carry the rep pair's values; the
    // rep-to-group joins key on gkey-derived membership
    val repKey = grouped.select($"doc_id".as("rep"), $"gkey")
    val crossPairs = repPairs
      .join(repKey.select($"rep".as("rep_a"), $"gkey".as("ga")), Seq("rep_a"))
      .join(repKey.select($"rep".as("rep_b"), $"gkey".as("gb")), Seq("rep_b"))
      .join(members.select($"doc_id".as("xa"), $"gkey".as("ga")), Seq("ga"))
      .join(members.select($"doc_id".as("xb"), $"gkey".as("gb")), Seq("gb"))
      .select(least($"xa", $"xb").as("doc_a"),
        greatest($"xa", $"xb").as("doc_b"), $"common", $"jaccard")
    // within-group pairs are identical documents: jaccard exactly 1;
    // empty shingle sets never pair (the naive route has no rows to
    // join them on), hence n > 0
    val withinPairs = members.as("x")
      .join(members.as("y"),
        col("x.gkey") === col("y.gkey") && col("x.doc_id") < col("y.doc_id"))
      .filter(col("x.n") > 0)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").cast("long").as("common"), lit(1.0).as("jaccard"))
    crossPairs.unionByName(withinPairs).localCheckpoint(true)
  }

  /** Edit-distance verification of LSH candidates (q145): exact
    * Levenshtein similarity (1 − dist/max_len) on the MinHash candidate
    * pairs, keeping those ≥ `threshold` — the final verify stage of a
    * production dedup pipeline, where character-level distance re-scores
    * what the sketch merely suspects. Exact edit distance is O(n·m) per
    * pair — affordable ONLY because the banding already shrank the pair
    * space (the all-pairs version is the q16 anti-pattern squared);
    * `levenshtein` is a native codegen'd function on both engines, so
    * the oracle re-derives identical integers. Two broadcast-friendly
    * text joins on the bounded candidate set; nothing corpus² anywhere.
    */
  def editVerifyCandidates(spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    val texts = docs(spark, dir).select($"doc_id", $"text")
    minhashCandidates(spark, dir)
      .join(texts.select($"doc_id".as("doc_a"), $"text".as("ta")), Seq("doc_a"))
      .join(texts.select($"doc_id".as("doc_b"), $"text".as("tb")), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        levenshtein($"ta", $"tb").cast("long").as("edit_dist"),
        greatest(length($"ta"), length($"tb")).cast("long").as("max_len"))
      .withColumn("sim",
        when($"max_len" === 0, lit(1.0))
          .otherwise(round(lit(1.0) - $"edit_dist" / $"max_len".cast("double"), 6)))
      .filter($"sim" >= threshold)
  }

  /** TF-IDF cosine near-dup pairs over 3-gram shingles (q162): the SOFT
    * similarity twin of q16's set Jaccard — shingle multiplicity counts
    * (tf) and corpus rarity weights (idf = ln N/df) both matter, so a
    * pair sharing one rare boilerplate block scores higher than a pair
    * sharing the corpus' commonest trigrams. cos(a,b) = Σ wₐw_b /
    * (‖a‖‖b‖) computed the inverted-index way: partial products
    * term-by-term (only terms the pair SHARES produce rows), summed per
    * pair, normalized by the precomputed vector norms.
    *
    * Shingles are keyed by xxhash64 (8-byte join keys, the q66 hashed-
    * gram pattern — the oracle keys by the raw strings; counts and df
    * agree absent 64-bit collisions). The weight table is persisted: it
    * feeds both join sides AND the norm aggregate, and recomputing the
    * shingle explode three times would triple the dominant scan.
    *
    * Scale: pair work is Σ_term df², quadratic in per-shingle
    * duplication — q16's documented hazard, so exact-dedup-first is
    * BUILT IN (the q148 treatment, keyed by md5(text): identical text ⇒
    * identical tf vector ⇒ identical weights, norms and every pair
    * value): df and N are counted over the FULL corpus (duplicates
    * legitimately inflate document frequency — the oracle counts them
    * too), but postings, norms and the Σ df² dot-product join run over
    * REPRESENTATIVES only; [[expandRepPairs]] then rebuilds the exact
    * all-pairs answer, and within-group pairs are identical vectors —
    * cosine exactly 1 after the 6-dp round (hence the enforced
    * minCos ≤ 1). The OTHER quadratic axis — Σ df² across DISTINCT
    * documents — is cut twice inside: exactly-zero-idf (universal)
    * grams leave the join entirely, and the remaining postings pass the
    * Bayardo/All-Pairs prefix bound, so only terms that can still carry
    * a qualifying pair generate candidates (details at the
    * implementation comment; both cuts are value-exact, enforced
    * jointly with the positive-norm contract mirrored in the oracle).
    */
  def tfidfCosinePairs(spark: SparkSession, dir: String,
      minCos: Double = 0.6, dfCap: Int = 256): DataFrame = {
    // > 0 (not just ≤ 1): in the heavy branch, pairs overlapping ONLY
    // on zero-weight universal grams never enter the pruned dot-product
    // join — exact because their cosine is 0 (or NaN at zero norm,
    // excluded by the positive-norm contract below), which a positive
    // threshold rejects
    require(minCos > 0.0 && minCos <= 1.0,
      s"minCos must be in (0, 1], got $minCos")
    import spark.implicits._
    val grouped = docs(spark, dir)
      .select($"doc_id", md5($"text").as("gkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = shingleRows(spark, dir)
      .groupBy($"doc_id", xxhash64($"sh").as("g"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"g").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val repIds = grouped.groupBy($"gkey").agg(min($"doc_id").as("doc_id"))
    val wts = tf.join(repIds, Seq("doc_id"), "left_semi")
      .join(dfreq, "g")
      .crossJoin(broadcast(nDocs))
      .select($"doc_id", $"g", $"df",
        ($"tf" * log($"n_docs".cast("double") / $"df")).as("wt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val norms = wts.groupBy($"doc_id")
        .agg(sqrt(sum($"wt" * $"wt")).as("nrm"),
          count(lit(1)).as("n_grams"))
      // ---- df-adaptive Σ df² cut (the q16 hybrid rationale): the
      // hazard is HEAVY grams, so branch on the measured max df.
      val maxRow = dfreq.agg(max($"df")).head()
      val maxDf = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val repPairs = if (maxDf <= dfCap) {
        // fast path: the plain inverted-index dot join — Σ df² ≤
        // dfCap·|postings| rows, linear in the corpus. Universal grams
        // (possible only when n_docs ≤ dfCap) ride along with weight 0
        // exactly as in the naive plan, so n_shared needs no correction.
        val dots = wts.select($"g", $"doc_id".as("rep_a"), $"wt".as("wa"))
          .join(wts.select($"g", $"doc_id".as("rep_b"), $"wt".as("wb")),
            Seq("g"))
          .filter($"rep_a" < $"rep_b")
          .groupBy($"rep_a", $"rep_b")
          .agg(sum($"wa" * $"wb").as("dot"), count(lit(1)).as("n_shared"))
        dots
          .join(norms.select($"doc_id".as("rep_a"), $"nrm".as("na")),
            Seq("rep_a"))
          .join(norms.select($"doc_id".as("rep_b"), $"nrm".as("nb")),
            Seq("rep_b"))
          .filter($"na" > 0 && $"nb" > 0)
          .select($"rep_a", $"rep_b", $"n_shared",
            round($"dot" / ($"na" * $"nb"), 6).as("cosine"))
          .filter($"cosine" >= minCos)
      } else {
        // heavy branch, two exact cuts. (1) wt == 0.0 iff the gram is
        // UNIVERSAL (df == n_docs ⇒ log(1.0) == 0.0 exactly; any
        // df < n_docs gives wt > 0): universal grams contribute 0 to
        // every dot product and norm, so they leave the join entirely
        // and re-enter n_shared as the broadcast constant n_univ (every
        // pair shares every universal gram). (2) Bayardo/All-Pairs
        // prefix bound on what remains: with unit-normalized weights ŵ
        // and terms in one fixed global (df, g) order, cos(A,B) ≤
        // Σ_{A's terms from the first shared one} ŵ_A(g)·maxŵ(g) — so a
        // term only needs to GENERATE candidates while that suffix
        // bound still clears the threshold. Rare terms (the suffix) do,
        // heavy boilerplate terms (early, with tiny per-doc weight)
        // fall out. The bound runs at minCos − 2e-6: the final filter
        // compares the 6-dp ROUNDED cosine, so the slack covers pairs
        // that round up across the threshold plus FP noise in the
        // suffix sums.
        val tEff = minCos - 2e-6
        val nUniv = broadcast(dfreq.crossJoin(broadcast(nDocs))
          .filter($"df" === $"n_docs")
          .agg(count(lit(1)).as("n_univ")))
        val wtsNz = wts.filter($"wt" =!= 0.0)
        val wn = wtsNz
          .join(norms.select($"doc_id", $"nrm"), Seq("doc_id"))
          .filter($"nrm" > 0)
          .select($"doc_id", $"g", $"df", ($"wt" / $"nrm").as("wn"))
        val gmax = wn.groupBy($"g").agg(max($"wn").as("gmax"))
        val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"g")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy($"doc_id")
        val pref = wn.join(gmax, "g")
          .withColumn("c", $"wn" * $"gmax")
          .withColumn("cum", sum($"c").over(wDoc))
          .withColumn("tot", sum($"c").over(wTot))
          .filter($"tot" - $"cum" + $"c" >= tEff)
          .select($"doc_id", $"g")
        val cand = pref.as("a")
          .join(pref.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
          .distinct()
        val dots = cand
          .join(wtsNz.select($"doc_id".as("rep_a"), $"g", $"wt".as("wa")),
            Seq("rep_a"))
          .join(wtsNz.select($"doc_id".as("rep_b"), $"g", $"wt".as("wb")),
            Seq("rep_b", "g"))
          .groupBy($"rep_a", $"rep_b")
          .agg(sum($"wa" * $"wb").as("dot"),
            count(lit(1)).as("n_shared_nz"))
        dots
          .join(norms.select($"doc_id".as("rep_a"), $"nrm".as("na")),
            Seq("rep_a"))
          .join(norms.select($"doc_id".as("rep_b"), $"nrm".as("nb")),
            Seq("rep_b"))
          .crossJoin(nUniv)
          .select($"rep_a", $"rep_b",
            ($"n_shared_nz" + $"n_univ").as("n_shared"),
            round($"dot" / ($"na" * $"nb"), 6).as("cosine"))
          .filter($"cosine" >= minCos)
      }
      val cross = expandRepPairs(grouped, repPairs, Seq("n_shared", "cosine"))
      // within-group pairs: identical tf vectors share every gram —
      // n_shared is the rep's distinct-gram count, cosine is exactly 1
      // (x/(√x·√x) rounds to 1.0 at 6 dp on both engines); groups whose
      // text yields no shingles have no norms row and drop, matching the
      // naive inner joins, and zero-norm groups (every gram universal)
      // are excluded by the positive-norm contract — the naive 0/0
      // there is engine-dependent NaN, so the contract, enforced on
      // BOTH the plan and the oracle, is the deterministic semantics
      val repStats = repIds
        .join(norms.select($"doc_id", $"n_grams", $"nrm"), Seq("doc_id"))
        .filter($"nrm" > 0)
        .select($"gkey".as("gk"), $"n_grams")
      val within = grouped.as("x")
        .join(grouped.as("y"),
          col("x.gkey") === col("y.gkey") && col("x.doc_id") < col("y.doc_id"))
        .join(repStats, col("x.gkey") === col("gk"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          $"n_grams".as("n_shared"), lit(1.0).as("cosine"))
      cross.unionByName(within).localCheckpoint(true)
    } finally { wts.unpersist(); dfreq.unpersist(); grouped.unpersist() }
  }

  /** MinHash banding quality report (q186): precision/recall of the q15
    * candidate pairs against exact-Jaccard ground truth at threshold
    * `tau` — "measure, don't guess" applied to the dedup pipeline
    * itself. Banding parameters are a bet on an S-curve; this is the
    * query that checks the bet on THIS corpus before a 100-TB run
    * trusts it. Composes [[minhashCandidates]] and [[jaccardPairs]]
    * verbatim, so the evaluation can never drift from the operators it
    * scores.
    *
    * Scale: the ground-truth arm is exact-Jaccard and pair-bounded (the
    * q16 hazard, documented there); at real scale this evaluation runs
    * on a deterministic md5 doc-sample (the q47 trick) — the S-curve
    * estimate needs thousands of pairs, not the whole corpus. The
    * final full-outer join keys on the pair ids.
    */
  /** IDF-weighted Jaccard re-score of the banding candidates (q215):
    * WJ(A,B) = Σ_{s∈A∩B} w(s) / Σ_{s∈A∪B} w(s) with w(s) = ln(N/df(s))
    * — plain Jaccard counts a boilerplate shingle and a distinctive one
    * equally, so template-heavy corpora over-merge; down-weighting
    * common shingles is the standard fix, reported here alongside the
    * unweighted score so the divergence is visible per pair. Weights
    * are fixed to 6-dp micro-units, so every set sum is an exact i64.
    *
    * Scale: candidates come from the q15 banding (never all-pairs), but
    * on a duplicated corpus the candidate set itself is quadratic in
    * duplication (every copy pair collides in every band), so
    * exact-dedup-first is BUILT IN at the CANDIDATE level (the q148
    * treatment, keyed by md5(text)): the minhash signature is a pure
    * function of the text, so a member pair is a candidate iff its rep
    * pair is — banding, posting-list intersection and scoring all run
    * over REPRESENTATIVES, and [[expandRepPairs]] rebuilds the exact
    * per-candidate answer (within-group pairs are identical sets:
    * both ratios exactly 1). df/N stay full-corpus (duplicates
    * legitimately inflate document frequency; the oracle counts them
    * too).
    */
  def weightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingleRows(spark, dir).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grouped = docs(spark, dir)
      .select($"doc_id", md5($"text").as("gkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
      val wts = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select($"sh",
          round(log($"n_docs" / $"df".cast("double")) * 1e6).cast("long")
            .as("wm"))
      val repIds = grouped.groupBy($"gkey").agg(min($"doc_id").as("doc_id"))
      val repSh = sh.join(repIds, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val shw = repSh.join(wts, Seq("sh"))
        val docW = shw.groupBy($"doc_id")
          .agg(sum($"wm").as("sw"), count(lit(1)).as("n_sh"))
        // the q15 banding geometry (4×4) over rep shingles only — the
        // mins come from the shared memoized table semi-joined to the
        // reps: row-mins are per-doc functions of the shingle SET
        // (multiplicity- and doc-subset-invariant), so filtering the
        // memoized full-corpus mins to rep docs yields the identical
        // signatures bandSignatures(repSh, 4, 4) derived from scratch
        val cand = candidatePairs(bandSignaturesFromMins(
          minsTable16(spark, dir).join(repIds, Seq("doc_id"), "left_semi"),
          4, 4))
        val inter = cand
          .join(shw.select($"doc_id".as("doc_a"), $"sh", $"wm"), Seq("doc_a"))
          .join(shw.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
          .groupBy($"doc_a", $"doc_b")
          .agg(sum($"wm").as("iw"), count(lit(1)).as("common"))
        val repPairs = inter
          .join(docW.select($"doc_id".as("doc_a"), $"sw".as("swa"),
            $"n_sh".as("na")), Seq("doc_a"))
          .join(docW.select($"doc_id".as("doc_b"), $"sw".as("swb"),
            $"n_sh".as("nb")), Seq("doc_b"))
          // positive-weight contract (enforced on the oracle too): a doc
          // whose every shingle is corpus-universal has sw == 0, and a
          // pair of two such docs divides 0/0 — engine-dependent NaN
          .filter($"swa" > 0 && $"swb" > 0)
          .select($"doc_a".as("rep_a"), $"doc_b".as("rep_b"), $"common",
            round($"common" / ($"na" + $"nb" - $"common").cast("double"), 6)
              .as("jaccard"),
            round($"iw" / ($"swa" + $"swb" - $"iw").cast("double"), 6)
              .as("weighted_jaccard"))
        val cross = expandRepPairs(grouped, repPairs,
          Seq("common", "jaccard", "weighted_jaccard"))
        // within-group pairs: identical non-empty shingle sets collide in
        // every band (always candidates) and both ratios are exact 1;
        // empty-set groups have no docW row and drop, like the naive
        // inner joins
        val repStats = repIds.join(docW, Seq("doc_id"))
          .filter($"sw" > 0)
          .select($"gkey".as("gk"), $"n_sh")
        val within = grouped.as("x")
          .join(grouped.as("y"),
            col("x.gkey") === col("y.gkey") && col("x.doc_id") < col("y.doc_id"))
          .join(repStats, col("x.gkey") === col("gk"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            $"n_sh".as("common"), lit(1.0).as("jaccard"),
            lit(1.0).as("weighted_jaccard"))
        cross.unionByName(within).localCheckpoint(true)
      } finally repSh.unpersist()
    } finally { sh.unpersist(); grouped.unpersist() }
  }

  /** Banding-scheme planner (q212): the SAME 16 cached permutation
    * mins regrouped under every (bands × rows) factorization — 16×1,
    * 8×2, 4×4, 2×8, 1×16 — with each scheme's measured candidate-pair
    * volume on THIS corpus next to its analytic S-curve threshold
    * (1/b)^(1/r). This is the b×r decision made from data: the
    * sketches are computed once, the five candidate sets differ only
    * in how the mins are folded into band signatures.
    *
    * Scale: ONE shingle+mins pass (docs-sized, cached); per scheme a
    * bucket self-join on its band signatures — the q15 shape — and a
    * count. The five counts are sequential driver actions over the
    * cached sketch (the bounded planner-table pattern).
    */
  def bandingPlanner(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schemes = Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the shared memoized mins table (the memo owns the persist); the
    // 4×4 scheme's candidate count reads the memoized candidate table —
    // the same frame q15 serves — instead of re-running that self-join
    val mins = minsTable16(spark, dir)
    val rows = schemes.map { case (b, r) =>
      val nCand =
        if (b == 4 && r == 4) bandCandidates44(spark, dir).count()
        else candidatePairs(bandSignaturesFromMins(mins, b, r)).count()
      (s"${b}x$r", b.toLong, r.toLong, nCand,
        r6(math.pow(1.0 / b, 1.0 / r)))
    }
    rows.toDF("scheme", "bands", "rows_per_band", "n_candidates",
      "threshold_est")
  }

  /** Duplicate-family profile (q206): the size histogram of the q41
    * near-dup clusters — per family size: how many families, how many
    * documents, and each size's share of the corpus — the one-page
    * answer to "how duplicated is this corpus, and is it a long tail of
    * pairs or a few mega-families" that decides between keeper-dedup
    * (q106) and family-cap sampling. Composes [[dedupClusters]]
    * verbatim.
    *
    * Scale: the cluster pass is q41's; the histogram is two
    * clusters-sized aggregates.
    */
  def clusterProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    dedupClusters(spark, dir)
      .groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", $"cluster_size" * $"n_clusters")
      .withColumn("frac_docs",
        round($"n_docs" / sum($"n_docs").over(tot).cast("double"), 6))
  }

  /** MinHash S-curve check (q196): the q186 companion at full
    * resolution — per Jaccard band, the EMPIRICAL fraction of exact
    * pairs that banding surfaced as candidates, against the ANALYTIC
    * collision probability 1 − (1 − j^r)^b at the band midpoint (r=4
    * rows × b=4 bands — this corpus's banding). The per-band gap is
    * the parameter-tuning signal the single precision/recall number of
    * q186 averages away: a healthy S-curve is ~0 below the threshold
    * knee and ~1 above it.
    *
    * Scale: both arms are the documented q15/q16 shapes; the banding
    * and gap math run on the pair table. Same sampled-corpus recipe as
    * q186 at real scale.
    */
  def sCurveCheck(spark: SparkSession, dir: String,
      sampleHexMax: String = "ff", maxEvalDocs: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val d = sampleDocs(docs(spark, dir), sampleHexMax)
    evalTierGuard(d, sampleHexMax, maxEvalDocs, "sCurveCheck (q196)")
    // both arms read the shared memoized tables for this (corpus,
    // sample): the τ=0.05 exact truth table and the 4×4 candidates —
    // the identical frames computed directly before (one truth table
    // per corpus serves every evaluator)
    val truth = exactPairTable(spark, dir, sampleHexMax)
      .select($"doc_a", $"doc_b", $"jaccard")
    val cand = bandCandidates44(spark, dir, sampleHexMax)
      .select($"doc_a", $"doc_b", lit(1L).as("is_cand"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .select(least(floor($"jaccard" * 10), lit(9L)).cast("long").as("band"),
        coalesce($"is_cand", lit(0L)).as("is_cand"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_pairs"), sum($"is_cand").as("n_candidates"))
      .withColumn("band_mid", round($"band" / lit(10.0) + 0.05, 2))
      .select($"band", $"band_mid", $"n_pairs", $"n_candidates",
        round($"n_candidates" / $"n_pairs".cast("double"), 6)
          .as("empirical_rate"),
        round(lit(1.0) - pow(lit(1.0) - pow($"band_mid", 4), 4), 6)
          .as("analytic_rate"))
      .withColumn("gap",
        round(abs($"empirical_rate" - $"analytic_rate"), 6))
  }

  /** The banding evaluators are EVAL-TIER operators: their exact-Jaccard
    * ground-truth arm is the one deliberately-superlinear computation in
    * the suite (true-pair volume grows superquadratically in duplicated
    * content, even behind the df-adaptive prefix join), because that is
    * what MEASURING a banding config costs. Running it on an unbounded
    * corpus is a design error, not a slow query — so the full arm
    * (`sampleHexMax = "ff"`) refuses corpora above `maxEvalDocs`
    * (default 1M docs ≈ the eval-tier budget where the truth arm is
    * minutes, not days; the dedupClusters driver-tier precedent) and
    * the error names the two 100-TB recipes: the sampled twins
    * (q222/q223, `sampleHexMax = "7f"`) or an explicit higher bound.
    * The count() is parquet-footer metadata, not a scan.
    */
  private def evalTierGuard(d: DataFrame, sampleHexMax: String,
      maxEvalDocs: Long, op: String): Unit =
    if (sampleHexMax == "ff") {
      val n = d.count()
      require(n <= maxEvalDocs,
        s"$op: full-corpus exact-truth arm on $n docs exceeds the " +
          s"eval-tier bound $maxEvalDocs — run the md5-sampled twin " +
          "(sampleHexMax, e.g. \"7f\" = q222/q223) or raise maxEvalDocs " +
          "if this corpus size is intentional")
    }

  /** `sampleHexMax` < "ff" runs BOTH arms — banding candidates and the
    * exact-Jaccard ground truth — on the same deterministic md5-bucket
    * doc sample ([[sampleDocs]]): at 100 TB the exact truth arm is
    * unrunnable on the full corpus, and the S-curve estimate needs
    * thousands of pairs, not all of them. The oracle composes the
    * identical sample predicate, so the sampled row is value-gated too.
    */
  def dedupEval(spark: SparkSession, dir: String,
      tau: Double = 0.5, sampleHexMax: String = "ff",
      maxEvalDocs: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val d = sampleDocs(docs(spark, dir), sampleHexMax)
    evalTierGuard(d, sampleHexMax, maxEvalDocs, "dedupEval (q186)")
    // shared memoized arms (see sCurveCheck): candidates from the 4×4
    // memo; truth filters the τ=0.05 memo at τ = tau when tau ≥ 0.05 —
    // the rounded-jaccard filter is jaccardPairsOf's own final filter,
    // so the pair set is identical to the direct computation
    val cand = bandCandidates44(spark, dir, sampleHexMax)
      .select($"doc_a", $"doc_b", lit(1L).as("is_cand"))
    val truth = (if (tau >= 0.05)
        exactPairTable(spark, dir, sampleHexMax)
          .filter($"jaccard" >= tau)
      else jaccardPairsOf(spark, d, tau))
      .select($"doc_a", $"doc_b", lit(1L).as("is_dup"))
    cand.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce($"is_cand", lit(0L))).as("n_candidates"),
        sum(coalesce($"is_dup", lit(0L))).as("n_true_pairs"),
        sum(when($"is_cand".isNotNull && $"is_dup".isNotNull, 1L)
          .otherwise(0L)).as("tp"))
      .select($"n_candidates", $"n_true_pairs", $"tp",
        round($"tp" / $"n_candidates".cast("double"), 6).as("precision"),
        round($"tp" / $"n_true_pairs".cast("double"), 6).as("recall"))
      .withColumn("f1", round(
        lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall"), 6))
  }
}
