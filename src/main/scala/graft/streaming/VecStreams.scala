package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Similarity

/** Streaming maintenance of the vector-index surface: newly-ingested
  * embeddings get the SAME banded-SRP signatures the batch index builds
  * (q51/q293/q294) and the same near-duplicate tripwire semantics the
  * text side runs (`DocStreams.contaminationGate`), as live streams.
  *
  * The design rule is the one the doc/event streams established: ONE
  * definition serves stream and batch. The signature projection is
  * `Similarity.bandSignatureCols` — the exact Columns the q293/q294
  * index builder folds — so the live bucketer and the batch graph
  * cannot disagree on where a vector lands; the stream==batch gate
  * (`VecStreamsSpec`) asserts exactly that.
  *
  * Scale: both transforms are STATELESS projections (static plane
  * literals folded into the plan, a broadcast base-signature set) — no
  * watermark, no state store; a 1000-executor stream runs them as pure
  * map tasks at ingest rate. The base-signature set for the tripwire is
  * bounded by the number of OCCUPIED buckets (≤ min(corpus, 2^nPlanes))
  * — at production plane counts use the q243 bloom bitmap instead; the
  * exact set keeps this gate's warranty exact, which is what the small
  * signature spaces here need.
  */
object VecStreams {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over an embeddings directory;
    * `maxFilesPerTrigger` bounds micro-batch size during backlog replay.
    */
  def readVecStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Live banded-SRP bucketer: one (band, sig) row per band per vector,
    * via the SHARED `Similarity.bandSignatureCols` projection — the
    * rows a streaming index maintainer appends to the q293/q294 edge
    * build's candidate buckets. Works unchanged on a batch frame (the
    * stream==batch gate replays it).
    */
  def bucketStream(vecs: DataFrame, planes: Seq[(Int, Seq[Float])],
      nBands: Int, nPlanes: Int): DataFrame = {
    graft.functions.VectorOps.register(vecs.sparkSession)
    val sigs = Similarity.bandSignatureCols(planes, nBands, nPlanes)
    vecs.select(col("vec_id"),
      posexplode(array(sigs: _*)).as(Seq("band", "sig")))
      .select(col("vec_id"), col("band").cast("int").as("band"), col("sig"))
  }

  /** Streaming near-duplicate tripwire: flag arriving vectors whose
    * FULL nPlanes-bit signature collides with an occupied bucket of the
    * base corpus — the vector-side analog of the text contamination
    * gate (a bucket collision is the same "candidate, verify before
    * admitting" signal the batch LSH emits; non-colliding vectors are
    * provably new content under the signature). `baseSigs` is the
    * occupied-bucket set of the base corpus, computed by the SAME
    * single-bucket projection (`fullSignature`).
    */
  def srpTripwire(vecs: DataFrame, baseSigs: Set[Long],
      planes: Seq[(Int, Seq[Float])], nPlanes: Int): DataFrame = {
    graft.functions.VectorOps.register(vecs.sparkSession)
    val sig = fullSignature(planes, nPlanes)
    val hit = if (baseSigs.isEmpty) lit(false)
      else sig.isin(baseSigs.toSeq: _*)
    vecs.select(col("vec_id"), sig.as("sig"), hit.as("is_candidate"))
  }

  /** The full (un-banded) signature: all nPlanes bits in one long —
    * `bandSignatureCols` with one band, so the tripwire and the
    * bucketer share the projection core.
    */
  def fullSignature(planes: Seq[(Int, Seq[Float])],
      nPlanes: Int): org.apache.spark.sql.Column =
    Similarity.bandSignatureCols(planes, 1, nPlanes).head

  /** The base corpus' occupied-bucket set — a bounded driver collect
    * (≤ distinct signatures present), the broadcast side of the
    * tripwire.
    */
  def baseSignatures(spark: SparkSession, dir: String,
      planes: Seq[(Int, Seq[Float])], nPlanes: Int): Set[Long] = {
    graft.functions.VectorOps.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(fullSignature(planes, nPlanes).as("sig"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  // ---- incremental routing-index maintenance (round-11 verdict #4) ----

  /** The mutable half of the q293/q298 routing index, carried across
    * ingest micro-batches: the rep rows (vec_id + their ORIGINAL float
    * embeddings — signatures and e3 integers re-derive from them, so
    * the stream and the batch builder cannot drift on either) and the
    * ranked edge table (src, dst, rn ≤ maxK).
    */
  final case class RouteIndexState(repVecs: DataFrame, ranked: DataFrame)

  private def e3Col = expr(
    "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")

  /** Initial maintenance state from a base corpus: dedup-first reps
    * (min vec_id per distinct e3 vector, each keeping ITS OWN float
    * embedding — the vector the batch builder computes signatures
    * from) and the q298 edge table of that corpus.
    */
  def initRouteState(spark: SparkSession, dir: String, nPlanes: Int,
      nBands: Int): RouteIndexState = {
    graft.functions.VectorOps.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val repIds = e.select(col("vec_id"), e3Col.as("v"))
      .groupBy(col("v")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    RouteIndexState(
      e.join(repIds, Seq("vec_id"), "left_semi").localCheckpoint(true),
      Similarity.routeEdgeTable(spark, dir, nPlanes, nBands)
        .localCheckpoint(true))
  }

  /** One incremental maintenance step: fold an arriving vector batch
    * into the routing index WITHOUT a rebuild. Exactly the q79
    * incremental-dedup shape lifted to the graph:
    *
    *  1. the batch dedups against itself and against the existing reps
    *     (a vector whose e3 content already has a rep is a duplicate —
    *     its group grows, the graph of distinct content is unchanged);
    *  2. each NEW rep's banded signatures probe the occupied buckets
    *     (existing ∪ new) — never all-pairs — and its out-edges are the
    *     exact-d² top-maxK of those candidates (the q298 ranking);
    *  3. existing reps sharing a bucket with a newcomer get PATCHED:
    *     their stored top-maxK merges with the new candidates and
    *     re-cuts at maxK. top-K(old ∪ new) = top-K(top-K(old) ∪ new)
    *     under the total (d², dst) order, so the patch is EXACT — no
    *     stored candidate beyond the old top-K can re-enter.
    *
    * The result is provably the one-shot q298 build over base ∪ batch
    * (gated row-for-row in VecStreamsSpec), so folding micro-batches
    * maintains exact equality with a full rebuild by induction.
    *
    * Precondition (required loudly): arriving ids exceed every stored
    * rep id — rep identity is min-id per content group, so an id below
    * an existing rep's would re-elect reps and demand a rebuild.
    *
    * Scale: an ingest batch shuffles ITSELF plus the touched buckets —
    * signature projection is the shared stateless `bandSignatureCols`,
    * the bucket probe is new-side-sized, the rescore touches only
    * affected srcs' ≤ maxK stored edges, and untouched rows pass
    * through without a shuffle. At 100 TB the stored signature table
    * rides bucketed storage keyed by (band, sig); here it re-derives
    * from the rep embeddings (one projection, no extra state).
    *
    * Checkpoint lifecycle: each step localCheckpoints its outputs and
    * the SUPERSEDED state simply goes out of scope — the per-round
    * fixpoint pattern (`Graph.labelPropagationFixpoint` et al.), where
    * dropped references are reclaimed by driver GC + ContextCleaner.
    * This differs from the round-11 IVF-PQ leak, which was a CACHE
    * holding checkpointed frames referenced forever; no cache holds a
    * superseded `RouteIndexState`.
    */
  /** The maintenance law as a QUERY (q299): fold the corpus through
    * [[maintainRouteEdges]] from the EMPTY state in `nBatches` ordered
    * id-range chunks and return the final edge table. By the exactness
    * law (maintained ≡ one-shot rebuild, by induction over batches) the
    * result must equal q298 — so the DuckDB oracle is q298's replay
    * verbatim, and the green row is a cross-engine proof that the
    * incremental path loses nothing. Planes come from the full corpus'
    * head vectors exactly as the batch builder takes them (they land in
    * the first chunk, which contains the smallest ids).
    *
    * Scale: each fold step costs the arriving chunk + its touched
    * buckets (the maintainRouteEdges analysis); the fold IS the ingest
    * story a 100-TB index lives by — the rebuild is only its spec.
    */
  def foldRouteEdges(spark: SparkSession, dir: String, nPlanes: Int = 16,
      nBands: Int = 4, nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    require(nBatches >= 1, s"nBatches must be >= 1, got $nBatches")
    graft.functions.VectorOps.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planes = e.filter(col("vec_id") < nPlanes)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toSeq)).toSeq
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "rn")
    if (planes.length < nPlanes) return empty // the q293 sub-nPlanes law
    val ids = e.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    if (ids.isNullAt(0)) return empty
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = hi - lo + 1
    var state = RouteIndexState(
      e.filter(lit(false)),
      empty)
    for (b <- 0 until nBatches) {
      val from = lo + span * b / nBatches
      val until = lo + span * (b + 1) / nBatches
      val chunk = e.filter(col("vec_id") >= from && col("vec_id") < until)
      state = maintainRouteEdges(spark, state, chunk, planes, nBands,
        nPlanes)
    }
    state.ranked.select(col("src"), col("dst"), col("rn"))
  }

  def maintainRouteEdges(spark: SparkSession, state: RouteIndexState,
      newVecs: DataFrame, planes: Seq[(Int, Seq[Float])], nBands: Int,
      nPlanes: Int, maxK: Int = Similarity.RouteIndexMaxK)
      : RouteIndexState = {
    graft.functions.VectorOps.register(spark)
    if (planes.length < nPlanes) return state // the q293 sub-nPlanes law
    val fresh = newVecs.select(col("vec_id"), col("embedding"))
    val maxRep = state.repVecs.agg(max(col("vec_id"))).collect()(0)
    val minNew = fresh.agg(min(col("vec_id"))).collect()(0)
    if (minNew.isNullAt(0)) return state // empty batch
    require(maxRep.isNullAt(0) || minNew.getLong(0) > maxRep.getLong(0),
      s"arriving vec_id ${minNew.get(0)} does not exceed the stored rep " +
        s"ceiling ${maxRep.get(0)} — min-id rep election would need a " +
        "rebuild, not a patch")
    // 1. dedup the batch against itself (min id per e3 group, keeping
    // that row's own embedding) and against the existing reps
    val newE3 = fresh.select(col("vec_id"), col("embedding"), e3Col.as("v"))
    val newGroupReps = newE3
      .groupBy(col("v")).agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"))
    val stateE3 = state.repVecs.select(col("vec_id"), e3Col.as("v"))
    val newReps = newE3
      .join(newGroupReps, Seq("vec_id"), "left_semi")
      .join(stateE3.select(col("v")), Seq("v"), "left_anti")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    if (newReps.isEmpty) return state // all duplicates: index unchanged
    // 2. banded signatures via the SHARED projection; the bucket probe
    val sigCols = Similarity.bandSignatureCols(planes, nBands, nPlanes)
    def sigsOf(df: DataFrame): DataFrame = df
      .select(col("vec_id"), posexplode(array(sigCols: _*))
        .as(Seq("band", "sig")))
    val baseSigs = sigsOf(state.repVecs)
    val newSigs = sigsOf(newReps).localCheckpoint(true)
    val allSigs = baseSigs.unionByName(newSigs)
    val allVecs = state.repVecs.unionByName(newReps)
      .select(col("vec_id"), e3Col.as("v"))
    def scored(cand: DataFrame): DataFrame = cand
      .join(allVecs.select(col("vec_id").as("src"), col("v").as("va")),
        Seq("src"))
      .join(allVecs.select(col("vec_id").as("dst"), col("v").as("vb")),
        Seq("dst"))
      .select(col("src"), col("dst"),
        call_function("pq_d2", col("va"), lit(0), col("vb")).as("d2"))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("d2"), col("dst"))
    // newcomer out-edges: probe ALL occupied buckets (existing + new)
    val newCand = newSigs.as("a")
      .join(allSigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct()
    val newEdges = scored(newCand)
      .withColumn("rn", row_number().over(wSrc).cast("long"))
      .filter(col("rn") <= maxK)
      .select(col("src"), col("dst"), col("rn"))
    // 3. patch existing srcs that share a bucket with a newcomer:
    // merge their stored top-maxK (rescored — the index stores ids,
    // distances re-derive exactly) with the new candidates, re-cut
    val baseCand = baseSigs.as("a")
      .join(newSigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val affected = baseCand.select(col("src")).distinct()
    val oldKept = state.ranked
      .join(affected, Seq("src"), "left_semi")
      .select(col("src"), col("dst"))
    val patched = scored(oldKept.unionByName(baseCand.select(col("src"),
        col("dst"))).distinct())
      .withColumn("rn", row_number().over(wSrc).cast("long"))
      .filter(col("rn") <= maxK)
      .select(col("src"), col("dst"), col("rn"))
    val untouched = state.ranked.join(affected, Seq("src"), "left_anti")
    RouteIndexState(
      state.repVecs.unionByName(newReps).localCheckpoint(true),
      untouched.unionByName(patched).unionByName(newEdges)
        .localCheckpoint(true))
  }
}
