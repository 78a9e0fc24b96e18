package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Streaming vector-index maintenance: the live bucketer must emit
  * EXACTLY the batch banded signatures (they share one Column
  * definition), and the SRP tripwire must flag exactly the vectors
  * whose full signature collides with the base corpus — replayed
  * through the file source in multiple micro-batches.
  */
class VecStreamsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val nPlanes = 16
  private val nBands = 4

  private def planes: Seq[(Int, Seq[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < nPlanes)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toSeq)).toSeq

  test("streaming bucketer replays to the exact batch banded signatures") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vecstream")
    try {
      // several part files + maxFilesPerTrigger=1 → several micro-batches
      spark.read.schema(VecStreams.vecSchema)
        .parquet(s"$sf/embeddings.parquet")
        .repartition(4).write.parquet(tmp.resolve("vecs").toString)
      val ps = planes
      val batch = VecStreams.bucketStream(
          spark.read.schema(VecStreams.vecSchema)
            .parquet(tmp.resolve("vecs").toString), ps, nBands, nPlanes)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

      val q = VecStreams.bucketStream(
          VecStreams.readVecStream(spark, tmp.resolve("vecs").toString,
            maxFilesPerTrigger = 1), ps, nBands, nPlanes)
        .writeStream.format("memory").queryName("vec_buckets")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("vec_buckets")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      assert(batch.map(_._2) == Set(0, 1, 2, 3), "4 bands per vector")
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple non-empty micro-batches")
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("SRP tripwire: replayed base vectors always collide; flags == batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vectrip")
    try {
      val ps = planes
      val base = VecStreams.baseSignatures(spark, sf, ps, nPlanes)
      assert(base.nonEmpty)
      // the incoming stream replays a slice of the base corpus — every
      // one of these vectors MUST collide (identical embedding ⇒
      // identical signature; the gate's exactness warranty)
      spark.read.schema(VecStreams.vecSchema)
        .parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") % 7 === 0)
        .repartition(2).write.parquet(tmp.resolve("in").toString)
      val q = VecStreams.srpTripwire(
          VecStreams.readVecStream(spark, tmp.resolve("in").toString,
            maxFilesPerTrigger = 1), base, ps, nPlanes)
        .writeStream.format("memory").queryName("vec_trip")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = spark.table("vec_trip").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.nonEmpty)
      assert(rows.forall(_._3), "a replayed base vector failed to collide")
      // stream == batch: the same transform on a batch frame agrees
      val batchRows = VecStreams.srpTripwire(
          spark.read.schema(VecStreams.vecSchema)
            .parquet(tmp.resolve("in").toString), base, ps, nPlanes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(rows.toSet == batchRows)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("incremental index maintenance: folded micro-batches == one-shot rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vecmaint")
    try {
      val full = spark.read.parquet(s"$sf/embeddings.parquet")
      // base = ids < 400 (contains all 16 planes), delta replayed as
      // TWO micro-batches — the maintained index must equal the q298
      // one-shot build over the FULL corpus, row for row including rn
      full.filter(col("vec_id") < 400)
        .write.parquet(tmp.resolve("base/embeddings.parquet").toString)
      val ps = planes
      val d1 = full.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      val d2 = full.filter(col("vec_id") >= 450)
      val s0 = VecStreams.initRouteState(spark,
        tmp.resolve("base").toString, ps, nPlanes, nBands)
      val s1 = VecStreams.maintainRouteEdges(spark, s0, d1, ps, nBands, nPlanes)
      val s2 = VecStreams.maintainRouteEdges(spark, s1, d2, ps, nBands, nPlanes)
      def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
        df.select("src", "dst", "rn").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val maintained = edges(s2.ranked)
      val rebuilt = edges(Similarity.routeEdgeTable(spark, sf, nPlanes, nBands))
      assert(maintained == rebuilt,
        s"maintained ${maintained.size} edges != rebuilt ${rebuilt.size}; " +
          s"missing=${(rebuilt -- maintained).take(5)} " +
          s"extra=${(maintained -- rebuilt).take(5)}")
      assert(maintained.nonEmpty)
      // rep set equality too: min-id per content group over the union
      val repIds = s2.repVecs.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      val s0reps = VecStreams.initRouteState(spark, sf, ps, nPlanes, nBands)
      assert(repIds == s0reps.repVecs.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet)
      // the CARRIED signature table (round-12 verdict #1: appended per
      // fold, never recomputed from the base) must equal a fresh
      // derivation from the final reps — the invariant that makes the
      // append-only maintenance exact
      val carried = s2.sigs.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val derived = VecStreams.bucketStream(s2.repVecs, ps, nBands, nPlanes)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(carried == derived,
        s"carried sigs drifted from derivation: ${carried.size} vs " +
          s"${derived.size}")
      // duplicate-only batch: replaying base content under fresh ids
      // is a NO-OP on the graph (the dedup-first law)
      val dup = full.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + lit(100000L))
      val s3 = VecStreams.maintainRouteEdges(spark, s2, dup, ps, nBands, nPlanes)
      assert(edges(s3.ranked) == maintained)
      // out-of-order ids refuse loudly (min-id rep election would
      // demand a rebuild, not a patch)
      val bad = full.filter(col("vec_id") < 5)
      val e = intercept[IllegalArgumentException] {
        VecStreams.maintainRouteEdges(spark, s2, bad, ps, nBands, nPlanes)
      }
      assert(e.getMessage.contains("rebuild"), e.getMessage)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("maintenance drives from a LIVE stream: foreachBatch folds == one-shot rebuild") {
    // the batch-fold gate above proves the algebra; this one proves the
    // PLUMBING — the fold runs inside Structured Streaming's
    // foreachBatch against a file-source replay (multiple micro-batches
    // via maxFilesPerTrigger=1) and still lands exactly on the rebuild
    val tmp = java.nio.file.Files.createTempDirectory("graft-vecmaint-live")
    try {
      val full = spark.read.parquet(s"$sf/embeddings.parquet")
      full.filter(col("vec_id") < 400)
        .write.parquet(tmp.resolve("base/embeddings.parquet").toString)
      // the delta arrives as id-ordered part files (the maintainer's
      // ordered-id precondition; a production ingest keyed by arrival
      // id has this shape naturally)
      full.filter(col("vec_id") >= 400 && col("vec_id") < 450).coalesce(1)
        .write.parquet(tmp.resolve("delta/d0.parquet").toString)
      full.filter(col("vec_id") >= 450).coalesce(1)
        .write.parquet(tmp.resolve("delta/d1.parquet").toString)
      // the file source orders micro-batches by modification time; pin
      // d1 strictly after d0 so the ordered-id precondition can't flake
      // on a same-millisecond write
      java.nio.file.Files.walk(tmp.resolve("delta/d1.parquet")).forEach { p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + 60000L))
      }
      val ps = planes
      var state = VecStreams.initRouteState(spark,
        tmp.resolve("base").toString, ps, nPlanes, nBands)
      val q = spark.readStream
        .schema(VecStreams.vecSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp.resolve("delta/*.parquet").toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          state = VecStreams.maintainRouteEdges(spark, state, batch, ps,
            nBands, nPlanes)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple non-empty micro-batches")
      def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
        df.select("src", "dst", "rn").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rebuilt = edges(Similarity.routeEdgeTable(spark, sf, nPlanes, nBands))
      assert(edges(state.ranked) == rebuilt)
      assert(rebuilt.nonEmpty)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("shared-definition law: the bucketer's bands fold to q293's full signature") {
    // bandSignatureCols(·, 1, nPlanes) is the single-bucket signature;
    // re-assembling the 4 banded sigs by shifting each band's bits back
    // into place must reproduce it exactly — the algebra that lets the
    // streaming bucketer and the batch single-bucket ops share one core
    graft.functions.VectorOps.register(spark)
    val ps = planes
    val r = nPlanes / nBands
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val banded = Similarity.bandSignatureCols(ps, nBands, nPlanes)
    val assembled = banded.zipWithIndex
      .map { case (c, b) => c * lit(1L << (b * r)) }
      .reduce(_ + _)
    val full = VecStreams.fullSignature(ps, nPlanes)
    val bad = e.select((assembled =!= full).as("ne")).filter(col("ne")).count()
    assert(bad == 0L, s"$bad vectors disagree between banded and full signature")
  }
}
