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
}
