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
