package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming document ingestion: the stateless prep stages must produce
  * EXACTLY the batch result when replayed through the file source, and
  * the watermarked content dedup must collapse re-crawled duplicates
  * across micro-batches.
  */
class DocStreamsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("file-source stream replays to the exact batch prep result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docstream")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        tmp.resolve("part-0.parquet"))
      val batch = DocStreams.prepDocs(
          spark.read.schema(DocStreams.docSchema).parquet(tmp.toString))
        .collect().map(_.getLong(0)).toSet

      val q = DocStreams.prepDocs(DocStreams.readDocStream(spark, tmp.toString))
        .writeStream.format("memory").queryName("doc_prep")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_prep").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("streamed rule gate keeps exactly the batch q78 keep set") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docrules")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        tmp.resolve("part-0.parquet"))
      // the batch side of the contract is the ORACLE-GATED q78 verdict,
      // not a second run of the shared code — so a drift between the
      // query surface and the ingest stage fails here
      val batch = graft.ops.TextAnalysis.gopherRules(spark, sf)
        .filter("keep").collect().map(_.getLong(0)).toSet

      val q = DocStreams.ruleGate(DocStreams.readDocStream(spark, tmp.toString,
          maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName("doc_rules")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_rules").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // the gate must pass survivors through schema-unchanged
      assert(spark.table("doc_rules").columns.toSeq ==
        DocStreams.docSchema.fields.map(_.name).toSeq)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("end-to-end ingest pipeline: streamed survivors equal the batch composition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docingest")
    try {
      // documents + a deterministic ingest timestamp, split over four
      // files so the replay exercises real micro-batch boundaries; the
      // % 60 keeps every timestamp within one minute so the unordered
      // file replay can never push a row past the 1-hour dedup
      // watermark (a raw doc_id offset would silently break if the
      // fixture ever grew past ~3600 docs)
      spark.read.schema(DocStreams.docSchema).parquet(s"$sf/documents.parquet")
        .withColumn("ingest_ts",
          to_timestamp(from_unixtime(lit(1700000000L) + col("doc_id") % 60)))
        .repartition(4)
        .write.parquet(s"$tmp/docs")
      // threshold 0.47 (corpus median-ish): the default 0.5 keeps only
      // short docs, which the prep length gate removes — an empty==empty
      // comparison would vacuously pass and prove nothing
      val batch = DocStreams.scoreDocs(DocStreams.prepDocs(DocStreams.ruleGate(
          spark.read.parquet(s"$tmp/docs"))), threshold = 0.47)
        .filter("keep")
        .select(sha2(col("clean_text"), 256).as("h"))
        .collect().map(_.getString(0)).toSet

      val tsSchema = org.apache.spark.sql.types.StructType(
        DocStreams.docSchema.fields :+ org.apache.spark.sql.types.StructField(
          "ingest_ts", org.apache.spark.sql.types.TimestampType))
      val q = DocStreams.ingestPipeline(
          spark.readStream.schema(tsSchema).option("maxFilesPerTrigger", "1")
            .parquet(s"$tmp/docs"), "ingest_ts", threshold = 0.47)
        .writeStream.format("memory").queryName("doc_ingest")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_ingest")
        .select("content_hash").collect().map(_.getString(0)).toSet
      // the watermarked dedup keeps ONE representative per content hash;
      // which doc wins depends on arrival order, so the contract is the
      // surviving content SET, which must match the batch composition's
      // distinct hashes exactly
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("streamed classifier scores equal the batch scores doc for doc") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docscore")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"),
        tmp.resolve("part-0.parquet"))
      val batch = DocStreams.scoreDocs(DocStreams.prepDocs(
          spark.read.schema(DocStreams.docSchema).parquet(tmp.toString)))
        .select("doc_id", "score", "keep")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet

      val q = DocStreams.scoreDocs(DocStreams.prepDocs(
          DocStreams.readDocStream(spark, tmp.toString, maxFilesPerTrigger = 1)))
        .writeStream.format("memory").queryName("doc_score")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_score").select("doc_id", "score", "keep")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("streaming manifest converges to the batch q94 manifest across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docmanifest")
    try {
      val docsDir = tmp.resolve("documents.parquet")
      // several part files + maxFilesPerTrigger=1 → several micro-batches,
      // so the XOR/sum/min/max merge across batches is actually exercised
      spark.read.schema(DocStreams.docSchema).parquet(s"$sf/documents.parquet")
        .repartition(4).write.parquet(docsDir.toString)
      val batch = graft.ops.PipelinePrep.shardManifest(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

      val q = DocStreams.manifestStream(
          DocStreams.readDocStream(spark, docsDir.toString, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName("doc_manifest")
        .outputMode(OutputMode.Complete)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_manifest")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple non-empty micro-batches")
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("streaming inverted index converges to the batch q101 mergeable columns across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docindex")
    try {
      val docsDir = tmp.resolve("documents.parquet")
      // several part files + maxFilesPerTrigger=1 → several micro-batches,
      // so per-term (count, XOR) state genuinely merges across batches
      spark.read.schema(DocStreams.docSchema).parquet(s"$sf/documents.parquet")
        .repartition(4).write.parquet(docsDir.toString)
      // batch twin: the mergeable (term, df, posting_xor) columns of the
      // q101 index, at minDf=1 (a live index surfaces new terms at df=1)
      val batch = graft.ops.TextAnalysis.invertedIndex(spark, tmp.toString, minDf = 1)
        .select("term", "df", "posting_xor")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

      val q = DocStreams.indexStream(
          DocStreams.readDocStream(spark, docsDir.toString, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName("doc_index")
        .outputMode(OutputMode.Complete)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("doc_index")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "expected multiple non-empty micro-batches")
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("checkpoint resume is exactly-once: a restarted query never reprocesses delivered batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docresume")
    try {
      val in = tmp.resolve("in"); val out = tmp.resolve("out")
      val ckpt = tmp.resolve("ckpt")
      java.nio.file.Files.createDirectories(in)
      val docs = spark.read.schema(DocStreams.docSchema)
        .parquet(s"$sf/documents.parquet")
      // the file source watches FILES in `in`, not subdirectories —
      // stage each wave and move its part file into the watched dir
      def writeWave(wave: Int, filter: String): Unit = {
        val staging = tmp.resolve(s"stage$wave")
        docs.filter(filter).coalesce(1).write.parquet(staging.toString)
        val listing = java.nio.file.Files.list(staging)
        val part =
          try listing.filter(_.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          finally listing.close() // Files.list leaks an fd until closed
        java.nio.file.Files.copy(part, in.resolve(s"wave$wave.parquet"))
      }
      def runToCompletion(): Unit = {
        val q = DocStreams.prepDocs(
            DocStreams.readDocStream(spark, in.toString, maxFilesPerTrigger = 1))
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode(OutputMode.Append)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      writeWave(1, "doc_id % 2 = 0")
      runToCompletion()
      // second run, SAME checkpoint + sink: only the new wave may land
      writeWave(2, "doc_id % 2 = 1")
      runToCompletion()
      val batch = DocStreams.prepDocs(docs).collect().map(_.getLong(0)).toSeq.sorted
      val sunk = spark.read.parquet(out.toString).select("doc_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      // exactly-once: equal as MULTISETS — a reprocessed batch would
      // duplicate wave-1 ids, a lost checkpoint would drop them
      assert(sunk == batch)
      assert(batch.nonEmpty)
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("content dedup collapses re-crawled duplicates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "clean_text", "ingest_ts")
    val q = DocStreams.dedupByContent(docs, "ingest_ts")
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode(OutputMode.Append).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      in.addData((1L, "alpha beta", t(0)), (2L, "gamma delta", t(1)))
      q.processAllAvailable()
      // batch 2: doc 3 re-crawls doc 1's content inside the horizon,
      // doc 4 is genuinely new
      in.addData((3L, "alpha beta", t(5)), (4L, "epsilon", t(6)))
      q.processAllAvailable()
      val kept = spark.table("doc_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 4L), s"got $kept")
    } finally q.stop()
  }

  test("streamed contamination tripwire equals batch; flags cover the exact set") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-doccontam")
    try {
      // the stream carries the EVAL split (the batch check's probe
      // side); the train split stays inside the static bitmap build
      spark.read.schema(DocStreams.docSchema).parquet(s"$sf/documents.parquet")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) > "7f")
        .repartition(2).write.parquet(s"$tmp/docs")
      def snap(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
      val batch = snap(DocStreams.contaminationGate(
        spark.read.schema(DocStreams.docSchema).parquet(s"$tmp/docs"), sf)
        .collect())
      val q = DocStreams.contaminationGate(
          DocStreams.readDocStream(spark, s"$tmp/docs", maxFilesPerTrigger = 1),
          sf)
        .writeStream.format("memory").queryName("doc_contam")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val streamed = snap(spark.table("doc_contam").collect())
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // tripwire polarity: every truly contaminated doc (the exact q66
      // verdict) must be flagged — bloom errs only toward caution
      val exact = graft.ops.TextAnalysis.decontaminationHashed(spark, sf)
        .filter(col("n_shared_grams") > 0).collect().map(_.getLong(0)).toSet
      val flagged = batch.filter(_._4).map(_._1).toSet
      assert(exact.nonEmpty && exact.subsetOf(flagged),
        s"tripwire missed contaminated docs: ${exact.diff(flagged)}")
    } finally graft.TestFiles.rmrf(tmp)
  }
}
