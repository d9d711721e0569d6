package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Structured Streaming paths drained over the bounded events testdata and
  * cross-checked against the equivalent batch computation. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // File streaming sources need a directory; stage the (read-only) events
  // parquet into a temp dir once.
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("file stream starts over an empty directory (nanos-contract fallback)") {
    val empty = java.nio.file.Files.createTempDirectory("graft_empty_feed").toString
    // the watch-an-empty-feed startup: schema inference has no files to
    // read, so the declared nanos contract must carry the stream
    val stream = StreamingOps.readEventsStream(spark, empty)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType.typeName == "timestamp")
  }

  test("streaming ingestion: micro-batches merge into the sink exactly once") {
    val batches = java.nio.file.Files.createTempDirectory("graft_ingest_src").toString
    val ev = graft.ops.Events.events(spark, Sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    ev.repartition(3).write.mode("overwrite").parquet(batches)
    val sink = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_ingest_wh").toString)
    // first drain: 3 files -> first batch full-builds, later batches merge
    val t1 = StreamingOps.streamIntoSink(spark, batches, sink,
      "silver", "events_ingest", "event_id")
    assert(t1.count() == ev.count(), "every micro-batch row must land")
    // redeliver a restated subset: same ids, value shifted
    val restatedIds = ev.orderBy("event_id").limit(10)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value") + 1000.0).as("value"))
    restatedIds.coalesce(1).write.mode("append").parquet(batches)
    // second drain (fresh checkpoint) replays all files + the restatement
    val t2 = StreamingOps.streamIntoSink(spark, batches, sink,
      "silver", "events_ingest", "event_id")
    assert(t2.count() == ev.count(),
      "merge-by-key ingestion must not duplicate redelivered rows")
    val updated = t2.join(restatedIds.select(col("event_id"), col("value").as("v2")),
      Seq("event_id")).filter(col("value") === col("v2")).count()
    assert(updated == 10, "the restated batch (latest file) must win the upsert")
  }

  test("streaming dedup suppresses redelivered ids within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[StreamingOps.Event](spark)
    val q = StreamingOps.dedupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_dedup").toString)
      .start()
    // batch 1: two distinct events, one intra-batch duplicate
    input.addData(
      StreamingOps.Event(1L, ts("2001-01-01 10:00:00"), 1L, "view", 1.0),
      StreamingOps.Event(1L, ts("2001-01-01 10:00:00"), 1L, "view", 1.0),
      StreamingOps.Event(2L, ts("2001-01-01 10:01:00"), 1L, "click", 2.0))
    q.processAllAvailable()
    // batch 2: id=1 redelivered within the horizon + one genuinely new id
    input.addData(
      StreamingOps.Event(1L, ts("2001-01-01 10:00:00"), 1L, "view", 1.0),
      StreamingOps.Event(3L, ts("2001-01-01 10:02:00"), 1L, "purchase", 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream")
      .select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L),
      "each id must be emitted exactly once despite intra- and cross-batch redelivery")
  }

  test("windowed counts with watermark match the batch equivalent") {
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    // Complete mode: a single bounded file is one micro-batch, so the
    // watermark never advances to finalize append-mode windows.
    val result = StreamingOps.runToMemory(
      spark, StreamingOps.windowedCounts(stream), "win_counts",
      OutputMode.Complete())
    // Batch equivalent over the same file.
    val batch = graft.ops.Events.events(spark, Sf0001)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
    val streamed = result.select("window_start", "event_type", "n_events")
    // Append mode emits only windows closed by the watermark; every emitted
    // window must match batch exactly, and most windows must have emitted.
    val batchMap = batch.as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, t, n) => (w, t) -> n }.toMap
    val emitted = streamed.as[(java.sql.Timestamp, String, Long)].collect()
    assert(emitted.length == batchMap.size)
    emitted.foreach { case (w, t, n) => assert(batchMap((w, t)) == n, s"window $w $t") }
  }

  test("windowedParity (driver query) equals the batch windowed rollup") {
    val streamed = StreamingOps.windowedParity(spark, Sf0001)
      .select("window_start", "event_type", "n_events", "total_value")
    val batch = graft.ops.Events.windowed(spark, Sf0001)
      .select("window_start", "event_type", "n_events", "total_value")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join matches the batch attribution join") {
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    val streamed = StreamingOps.runToMemory(
      spark, StreamingOps.attributionStream(stream), "attrib_stream")
      .select("purchase_id", "click_id")
    val batch = graft.ops.Events.attribution(spark, Sf0001)
      .select("purchase_id", "click_id")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() > 0, "attribution window must produce rows at sf0.001")
  }

  test("gapSessions closes idle sessions via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[StreamingOps.Event](spark)
    val q = StreamingOps.gapSessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("gap_sessions")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_gap").toString)
      .start()
    // batch 1: user 1 has a 2-event burst, then goes idle forever
    input.addData(
      StreamingOps.Event(1L, ts("2001-01-01 10:00:00"), 1L, "view", 1.0),
      StreamingOps.Event(2L, ts("2001-01-01 10:05:00"), 1L, "view", 1.0))
    q.processAllAvailable()
    // batch 2: a different user far in the future pushes the watermark to
    // 12:00, past user 1's 10:35 timeout target -> timeout branch fires
    input.addData(StreamingOps.Event(3L, ts("2001-01-01 13:00:00"), 2L, "view", 1.0))
    q.processAllAvailable()
    // one more batch so the post-watermark-advance timeout sweep runs even
    // if the no-data batch heuristic didn't schedule it
    input.addData(StreamingOps.Event(4L, ts("2001-01-01 13:01:00"), 2L, "view", 1.0))
    q.processAllAvailable()
    val closes = spark.table("gap_sessions")
      .as[StreamingOps.SessionClose].collect()
    q.stop()
    val u1 = closes.filter(_.user_id == 1L)
    assert(u1.length == 1, s"expected one close for user 1, got ${u1.toSeq}")
    assert(u1.head.n_events == 2 && u1.head.closed_by_timeout,
      s"user 1 session should close by timeout: ${u1.head}")
    assert(u1.head.start_ts_micros == ts("2001-01-01 10:00:00").getTime * 1000L)
    assert(u1.head.end_ts_micros == ts("2001-01-01 10:05:00").getTime * 1000L)
  }

  test("gapSessions emits inline closes on intra-stream gaps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[StreamingOps.Event](spark)
    val q = StreamingOps.gapSessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("gap_sessions_inline")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_gap2").toString)
      .start()
    input.addData(
      StreamingOps.Event(1L, ts("2001-01-01 10:00:00"), 1L, "view", 1.0),
      StreamingOps.Event(2L, ts("2001-01-01 11:00:00"), 1L, "view", 1.0))
    q.processAllAvailable()
    val closes = spark.table("gap_sessions_inline")
      .as[StreamingOps.SessionClose].collect()
    q.stop()
    // the 10:00 session closed inline when the 11:00 event arrived
    assert(closes.exists(c =>
      c.user_id == 1L && c.n_events == 1 && !c.closed_by_timeout))
  }

  test("mapGroupsWithState keeps running per-user counts") {
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Event]
    val result = StreamingOps.runToMemory(
      spark, StreamingOps.sessionCounts(stream).toDF(), "sess_counts",
      OutputMode.Update())
    // The final update per user carries the total event count.
    val finalCounts = result.groupBy("user_id").agg(max("n_events").as("n"))
    val batchCounts = graft.ops.Events.events(spark, Sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val mismatches = finalCounts.join(batchCounts, Seq("user_id"))
      .filter(finalCounts("n") =!= batchCounts("n")).count()
    assert(mismatches == 0)
  }
}
