package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The stream==batch END-TO-END gate: every streaming op is driven through
  * a REAL file-source micro-batch replay over sf0.001 testdata (multiple
  * files, maxFilesPerTrigger forcing several micro-batches, AvailableNow
  * trigger) and the final sink table must equal the batch twin row for
  * row. A one-row divergence between the streaming and batch pipelines
  * fails the suite — this is the hard correctness check the MemoryStream
  * unit specs (DocStreamsSpec / EventStreamsSpec) don't provide.
  */
class StreamBatchGateSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  /** Deterministic event-time column for the doc stream: both the batch
    * twin and the stream derive it from doc_id, so arrival order can't
    * change it. All values land inside one minute — well inside the
    * 1-hour dedup horizon, so every duplicate pair must collapse.
    */
  private def withIngestTs(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ingest_ts",
      timestamp_seconds(lit(1704067200L) + col("doc_id") % 60))

  test("doc pipeline gate: file-stream prep+dedup equals the batch twin on sf0.001") {
    val tmp = Files.createTempDirectory("graft-gate-docs")
    val in = s"$tmp/in"
    try {
      // corpus = sf0.001 documents split over 6 files + a "re-crawl" file
      // whose docs carry NEW ids but IDENTICAL text (sf0.001 has no exact
      // duplicates of its own — verified below — so the re-crawl is what
      // exercises cross-micro-batch dedup)
      val docs = spark.read.schema(DocStreams.docSchema)
        .parquet(s"$sf/documents.parquet")
      docs.repartition(6).write.mode("append").parquet(in)
      docs.filter($"doc_id" % 5 === 0)
        .withColumn("doc_id", $"doc_id" + 1000000L)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(in)

      def rowKey(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getDouble(5))
      val prepCols = Seq("doc_id", "lang", "source", "clean_text", "n_tokens", "ttr")

      val batchPrep = DocStreams.prepDocs(
        spark.read.schema(DocStreams.docSchema).parquet(in))
      val batchRows = batchPrep.select(prepCols.map(col): _*)
        .collect().map(rowKey).toSeq.sorted
      val batchHashes = batchPrep
        .select(sha2($"clean_text", 256).as("h"))
        .collect().map(_.getString(0)).toSet
      // the re-crawl must have produced at least one surviving duplicate
      // pair, or the dedup half of this gate tests nothing
      assert(batchRows.size > batchHashes.size,
        s"fixture broken: ${batchRows.size} prep rows but ${batchHashes.size} distinct hashes")

      // stateless prep: streamed rows must equal the batch rows EXACTLY
      // (every column, every row — multiset compare)
      val qPrep = DocStreams.prepDocs(DocStreams.readDocStream(spark, in, 2))
        .writeStream.format("memory").queryName("gate_doc_prep")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      try qPrep.awaitTermination() finally qPrep.stop()
      val streamedPrep = spark.table("gate_doc_prep").select(prepCols.map(col): _*)
        .collect().map(rowKey).toSeq.sorted
      assert(streamedPrep == batchRows,
        s"prep diverged: stream=${streamedPrep.size} rows batch=${batchRows.size} rows")

      // stateful dedup: exactly one survivor per content hash, hash set
      // equal to the batch distinct set, and every survivor is a batch
      // prep row (first-arrival choice among duplicates is the stream's
      // only freedom)
      val qDedup = DocStreams.dedupByContent(
          withIngestTs(DocStreams.prepDocs(DocStreams.readDocStream(spark, in, 2))),
          "ingest_ts")
        .writeStream.format("memory").queryName("gate_doc_dedup")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      try qDedup.awaitTermination() finally qDedup.stop()
      val survivors = spark.table("gate_doc_dedup")
      val survivorHashes = survivors.select("content_hash")
        .collect().map(_.getString(0)).toSeq
      assert(survivorHashes.size == survivorHashes.toSet.size, "duplicate hash survived")
      assert(survivorHashes.toSet == batchHashes, "survivor hash set != batch distinct set")
      val survivorRows = survivors.select(prepCols.map(col): _*)
        .collect().map(rowKey).toSet
      assert(survivorRows.subsetOf(batchRows.toSet), "survivor row not in batch prep output")
    } finally graft.TestFiles.rmrf(tmp)
  }

  /** sf0.001 events re-written with micros timestamps (the raw file is
    * TIMESTAMP(NANOS), which the streaming parquet source rejects), split
    * into `nFiles` CHRONOLOGICAL slices with ascending mtimes so the file
    * source replays them in event-time order — the delivery order a real
    * backlog replay sees. (A randomly-shuffled split would make most
    * events late vs the 1-hour watermark and the stream would correctly
    * drop them — that's watermark semantics working, not a gate.)
    */
  private def writeEventFiles(tmp: Path, nFiles: Int): String = {
    import scala.jdk.CollectionConverters._
    val in = s"$tmp/in"
    val ev = graft.ops.Tables.eventsNs(spark, sf)
      .select($"event_id", timestamp_micros(expr("ts div 1000")).as("ts"),
        $"user_id", $"event_type", $"value")
    val Array(lo, hi) = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val step = (hi - lo) / nFiles + 1
    val dir = java.nio.file.Paths.get(in)
    def parquets() = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSet
    val t0 = System.currentTimeMillis() - 3600000L
    (0 until nFiles).foreach { i =>
      val before = if (Files.exists(dir)) parquets() else Set.empty[Path]
      ev.filter(unix_micros($"ts") >= lo + i * step &&
          unix_micros($"ts") < lo + (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(in)
      val mt = java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L)
      (parquets() -- before).foreach(Files.setLastModifiedTime(_, mt))
    }
    in
  }

  /** Appends a far-future sentinel event (user_id = -1) as its own file
    * and bumps its mtime so the file source processes it LAST: the final
    * watermark then passes every real session/window, so Append mode
    * emits them all; the sentinel's own state stays open and is never
    * emitted. (If the sentinel were processed first, the watermark would
    * jump ahead and drop every real event as late.)
    */
  private def appendSentinelLast(in: String): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(in)
    def parquets() = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSet
    val before = parquets()
    val farFuture = new java.sql.Timestamp(4102444800000L) // 2100-01-01
    Seq((-1L, farFuture, -1L, "sentinel", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(in)
    val later = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() + 600000L)
    (parquets() -- before).foreach(Files.setLastModifiedTime(_, later))
  }

  test("event session gate: file-stream session_window equals Sessionize.sessionWindowAgg") {
    val tmp = Files.createTempDirectory("graft-gate-sessions")
    try {
      val in = writeEventFiles(tmp, 5)
      appendSentinelLast(in)
      val q = EventStreams.sessionWindows(EventStreams.readEventStream(spark, in, 2))
        .writeStream.format("memory").queryName("gate_sessions")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("gate_sessions")
        .filter($"user_id" >= 0)
        .select($"user_id", unix_micros($"session_start").as("start_us"),
          unix_micros($"session_end").as("end_us"), $"n_events", $"session_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq.sorted
      val batch = graft.ops.Sessionize.sessionWindowAgg(spark, sf)
        .select($"user_id", $"start_us", $"end_us", $"n_events", $"session_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq.sorted
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"sessions diverged: stream=${streamed.size} batch=${batch.size}")
    } finally graft.TestFiles.rmrf(tmp)
  }

  test("event window gate: file-stream hourlyCounts equals Sessionize.hourlyEventCounts") {
    val tmp = Files.createTempDirectory("graft-gate-hourly")
    try {
      val in = writeEventFiles(tmp, 5)
      appendSentinelLast(in)
      val q = EventStreams.hourlyCounts(EventStreams.readEventStream(spark, in, 2))
        .writeStream.format("memory").queryName("gate_hourly")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val streamed = spark.table("gate_hourly")
        .filter($"event_type" =!= "sentinel")
        .select(date_format($"window_start", "yyyy-MM-dd HH:mm:ss").as("w"),
          $"event_type", $"n", $"total_value")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      val batch = graft.ops.Sessionize.hourlyEventCounts(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"hourly windows diverged: stream=${streamed.size} batch=${batch.size}")
    } finally graft.TestFiles.rmrf(tmp)
  }
}
