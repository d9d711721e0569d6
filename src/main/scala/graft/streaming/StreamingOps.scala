package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the engine (SURVEY.md §2.10 notes the
  * reference itself is batch-only — streaming is part of the
  * beyond-reference training-data pipeline surface).
  *
  * Two shapes:
  *  - [[windowedCounts]]: watermark + tumbling-window aggregation — the
  *    declarative path; Spark maintains state, late data beyond the
  *    watermark is dropped, output is append-mode finalized windows.
  *  - [[sessionCounts]]: `mapGroupsWithState` — the custom-state path,
  *    the streaming analogue of graft.ops.Events.sessionize. State per
  *    user is O(1) (count + last timestamp), so state size scales with
  *    active users, not events.
  *
  * At 100 TB/day both paths shard by the groupBy key across executors;
  * the watermark bounds state retention and makes the job restart-safe
  * from the checkpoint.
  */
object StreamingOps {

  final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  final case class UserSessionState(nEvents: Long, lastTsMicros: Long)
  final case class SessionUpdate(
    user_id: Long, n_events: Long, last_ts_micros: Long, closed: Boolean)

  /** Read the events table as a file stream (one-file-per-trigger batches
    * in tests; directory-watch in production). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** 10-minute tumbling windows per event_type with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Per-user running event counts via explicit state — demonstrates the
    * KeyValueGroupedDataset.mapGroupsWithState custom-state path. NoTimeout
    * keeps bounded test streams drainable with processAllAvailable; a
    * production session-closer would use ProcessingTimeTimeout and emit
    * `closed = true` from the hasTimedOut branch. */
  def sessionCounts(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSessionState]) =>
          val events = batch.toSeq
          val prev = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue))
          val lastMicros = events.map(e => e.ts.getTime * 1000L).foldLeft(prev.lastTsMicros)(math.max)
          val next = UserSessionState(prev.nEvents + events.size, lastMicros)
          state.update(next)
          SessionUpdate(userId, next.nEvents, next.lastTsMicros, closed = false)
      }
  }

  /** Run a streaming query over `df` into an in-memory table and block
    * until the (file-bounded) stream drains. Returns the result table. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft_ckpt_$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
