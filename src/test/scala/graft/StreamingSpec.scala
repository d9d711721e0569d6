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

  test("streaming funnel matches the batch funnel on out-of-order batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // deliberately adversarial ordering: the user-1 click at 10:05 arrives
    // while the only known view is 10:10 (invalid — parked), then a LATE
    // earlier view (10:00) arrives and must re-promote it; user 2 clicks
    // before any view (never converts); user 3 completes in order
    val batch1 = Seq(
      StreamingOps.Event(1L, ts("2001-01-01 10:10:00"), 1L, "view", 0),
      StreamingOps.Event(2L, ts("2001-01-01 10:05:00"), 1L, "click", 0),
      StreamingOps.Event(3L, ts("2001-01-01 10:02:00"), 2L, "click", 0),
      StreamingOps.Event(4L, ts("2001-01-01 10:00:00"), 3L, "view", 0))
    val batch2 = Seq(
      StreamingOps.Event(5L, ts("2001-01-01 10:00:00"), 1L, "view", 0),
      StreamingOps.Event(6L, ts("2001-01-01 10:20:00"), 1L, "purchase", 0),
      StreamingOps.Event(7L, ts("2001-01-01 10:03:00"), 2L, "view", 0),
      StreamingOps.Event(8L, ts("2001-01-01 10:01:00"), 3L, "click", 0),
      StreamingOps.Event(9L, ts("2001-01-01 10:00:30"), 3L, "purchase", 0))
    val input = MemoryStream[StreamingOps.Event](spark)
    val q = StreamingOps.funnelStages(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_funnel").toString)
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // latest update per user (MemoryStream keeps all update-mode rows)
    val last = spark.table("funnel_stream")
      .groupBy("user_id")
      .agg(max(struct(col("stage"), col("t1_micros"), col("t2_micros"),
        col("t3_micros"))).as("s"))
      .select(col("user_id"), col("s.stage"), col("s.t1_micros"),
        col("s.t2_micros"), col("s.t3_micros"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // batch truth on the identical events
    val batchDf = (batch1 ++ batch2).toDF()
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val b = graft.ops.Events.funnelFrom(batchDf).head()
    // user 1: late 10:00 view re-anchors; parked 10:05 click promotes;
    // purchase 10:20 follows → full funnel
    assert(last(1L)._1 == 3)
    assert(last(1L)._2 == ts("2001-01-01 10:00:00").getTime * 1000)
    assert(last(1L)._3 == ts("2001-01-01 10:05:00").getTime * 1000)
    assert(last(1L)._4 == ts("2001-01-01 10:20:00").getTime * 1000)
    // user 2: click precedes its view → stage 1; user 3: purchase
    // precedes the click → stage 2
    assert(last(2L)._1 == 1 && last(3L)._1 == 2)
    // aggregate parity with the batch funnel: n_view / n_view_click /
    // n_view_click_purchase
    val nView = last.values.count(_._1 >= 1).toLong
    val nClick = last.values.count(_._1 >= 2).toLong
    val nPurch = last.values.count(_._1 >= 3).toLong
    assert((nView, nClick, nPurch) == (b.getLong(1), b.getLong(2), b.getLong(3)))
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

  test("streaming IVF maintenance equals a fresh rebuild after N micro-batches") {
    import graft.ops.{IvfIndex, Similarity}
    val feed = java.nio.file.Files.createTempDirectory("graft_ivf_feed").toString
    spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .repartition(4).write.mode("overwrite").parquet(feed)
    val cents = IvfIndex.centroids(spark, Sf0001)
    val fresh = Similarity.buildIvfLists(spark, Sf0001, cents)
      .select("vec_id", "centroid_id").collect().map(_.toSeq).toSet
    val wh = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_ivf_wh").toString)
    // 4 files, one per trigger: batches 2..4 exercise the merge path
    val r = StreamingOps.streamIntoIvfLists(
      spark, feed, cents, wh, "ann", "ivf_lists_stream")
    assert(r.ingested == spark.read.parquet(feed).count(),
      "every streamed vector must land exactly once (count comes from " +
        "the written files' parquet footers — no separate count job)")
    assert(r.lists.select("vec_id", "centroid_id")
      .collect().map(_.toSeq).toSet == fresh,
      "incrementally-maintained lists must equal a fresh full build " +
        "under the frozen quantizer")
    assert(r.centroids eq cents,
      "with no retrain, the serving quantizer is the one passed in")
    // the on-disk layout must remain the index: one directory per list
    val root = r.lists.queryExecution.executedPlan.collectLeaves().mkString
    assert(root.contains("ivf_lists_stream"))
    assert(r.lists.schema.fieldNames.contains("centroid_id"))
  }

  test("IVF maintenance past the staleness bound retrains from the warehouse") {
    import graft.ops.{IvfIndex, Similarity}
    val feed = java.nio.file.Files.createTempDirectory("graft_ivf_feed2").toString
    spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .repartition(2).write.mode("overwrite").parquet(feed)
    val cents = IvfIndex.centroids(spark, Sf0001)
    val wh = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_ivf_wh2").toString)
    val before = IvfIndex.trainings.get
    // staleLimit 0: EVERY batch crosses the drift budget — per-batch
    // enforcement retrains after each of the 2 micro-batches
    val r = StreamingOps.streamIntoIvfLists(
      spark, feed, cents, wh, "ann", "ivf_lists_stale", staleLimit = 0L)
    assert(IvfIndex.trainings.get == before + 2,
      "per-batch staleness: each crossing batch retrains the quantizer")
    // the last retrain saw the full corpus; warehouse rows round-trip
    // parquet exactly, so the rebuild AND the returned quantizer are
    // bit-identical to training + assigning from the source table
    val srcCents = Similarity.ivfCentroids(spark, Sf0001)
    val fresh = Similarity.buildIvfLists(spark, Sf0001, srcCents)
      .select("vec_id", "centroid_id").collect().map(_.toSeq).toSet
    assert(r.lists.select("vec_id", "centroid_id")
      .collect().map(_.toSeq).toSet == fresh)
    assert(r.centroids.collect().map(_.toSeq).toSet ==
      srcCents.collect().map(_.toSeq).toSet,
      "the retrained quantizer must be returned, not discarded — probe " +
        "selection against the stale centroids reads the wrong lists")
  }

  test("staleness crossed mid-stream: later batches assign under the retrained quantizer") {
    import graft.ops.{IvfIndex, Similarity}
    val feed = java.nio.file.Files.createTempDirectory("graft_ivf_feed3").toString
    val n = spark.read.parquet(s"$Sf0001/embeddings.parquet").count()
    spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .repartition(4).write.mode("overwrite").parquet(feed)
    val cents = IvfIndex.centroids(spark, Sf0001)
    val wh = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_ivf_wh3").toString)
    val before = IvfIndex.trainings.get
    // ~4 even files: growth crosses 0.6·n on batch 3 of 4 — the retrain
    // comes due MID-stream, and batch 4 must use the new quantizer
    val r = StreamingOps.streamIntoIvfLists(
      spark, feed, cents, wh, "ann", "ivf_lists_midrun",
      staleLimit = (n * 6) / 10)
    assert(IvfIndex.trainings.get == before + 1,
      "exactly one crossing -> exactly one mid-stream retrain")
    assert(r.centroids.collect().map(_.toSeq).toSet !=
      cents.collect().map(_.toSeq).toSet,
      "the mid-stream retrain (on 3/4 of the corpus) must replace the quantizer")
    // every vector — including batch 4, ingested AFTER the retrain — is
    // assigned under the returned quantizer: index and probe side agree
    val expected = Similarity.buildIvfLists(spark, Sf0001, r.centroids)
      .select("vec_id", "centroid_id").collect().map(_.toSeq).toSet
    assert(r.lists.select("vec_id", "centroid_id")
      .collect().map(_.toSeq).toSet == expected,
      "lists must be consistent with the RETURNED quantizer end-to-end")
  }
}
