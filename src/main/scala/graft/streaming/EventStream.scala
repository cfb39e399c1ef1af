package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the events table.
  *
  * The reference has no event-time streaming at all (SURVEY §2.10 —
  * its "streaming" is volcano-style batch pull, plan.rs:12), so this
  * module *exceeds* parity: the same transforms a batch user writes run
  * incrementally with watermarked state. Local smoke drives a parquet
  * directory through the stream (file source) into a memory sink.
  */
object EventStream {

  /** Event-time windowed aggregation with a watermark: counts + value
    * sums per (window, event_type). Late data beyond the watermark is
    * dropped — bounded state at any scale. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      // explicit TimestampType: the session may alias the "timestamp"
      // string to NTZ (Engine sets spark.sql.timestampType for oracle
      // parity), but watermarks require the LTZ type
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(nEvents: Long, lastTs: Long)
  final case class SessionUpdate(userId: Long, nEvents: Long, closed: Boolean)

  /** Custom stateful sessionization via mapGroupsWithState: counts
    * events per user session (gap-based), emitting running updates.
    * KeyValueGroupedDataset state is the Spark-native replacement for
    * hand-rolled operator state. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var n = prev.nEvents
          var last = prev.lastTs
          var closed = false
          sorted.foreach { e =>
            if (last != Long.MinValue && e.ts.getTime - last > gapMs) {
              closed = true
              n = 0
            }
            n += 1
            last = e.ts.getTime
          }
          state.update(SessionState(n, last))
          SessionUpdate(userId, n, closed)
      }
  }

  /** Streaming exact dedup: drop duplicate event_ids within the
    * watermark horizon — the incremental form of Dedup.exact (state is
    * bounded by the watermark; the batch analogue is a hash aggregate). */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Drive the events parquet through the file-stream source into an
    * in-memory table; returns the completed batch result. (Streaming
    * reader needs an explicit schema; ts arrives as NANOS → repaired
    * the same way as the batch path.) */
  def runFileStream(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val events = raw.withColumn("ts",
      expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    val q = windowedCounts(events)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
