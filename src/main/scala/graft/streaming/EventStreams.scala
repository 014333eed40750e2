package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface — a deliberate superset of the reference,
 * which is strictly batch (SURVEY.md §2.10: no watermarks, stream windows,
 * or stateful operators anywhere in the reference). The batch operators in
 * graft.queries.EventQueries are the oracle-checked analogs; this module
 * provides the true streaming forms: tumbling/sliding windowed aggregation
 * with watermarks, streaming dedup, and session windows via
 * flatMapGroupsWithState.
 *
 * Scale notes: windowed aggregations shuffle on (window, key) with partial
 * aggregation; state store size is bounded by the watermark horizon;
 * session state per key is O(open sessions), evicted on ProcessingTime
 * timeout.
 */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, n_events: Long, closed: Boolean)

  // not private: the state encoder's generated code constructs it reflectively
  final case class SessionState(n_events: Long, lastTs: Long)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark (late events
    * beyond the watermark are dropped; state evicted past the horizon). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * the streaming analog of operators.Dedup.exactDuplicates. */
  def dedupedStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  /** Custom stateful sessionization: 30-minute inactivity gap closes a
    * session (flatMapGroupsWithState custom state; the batch analog is
    * q39_events_sessionize). Sessions close when a later event reveals the
    * gap; a production deploy closing idle sessions on wall-clock would add
    * EventTimeTimeout + a watermark (kept out here — the timeout timer makes
    * the micro-batch loop re-fire on a schedule, which is wrong for the
    * drain-the-source usage this operator targets). */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, batch, state: GroupState[SessionState]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val closed = Seq.newBuilder[SessionUpdate]
          evs.foreach { e =>
            if (s.n_events > 0 && e.ts.getTime - s.lastTs > gapMs) {
              closed += SessionUpdate(userId, s.n_events, closed = true)
              s = SessionState(0L, Long.MinValue)
            }
            s = SessionState(s.n_events + 1, e.ts.getTime)
          }
          state.update(s)
          closed.result().iterator ++
            Iterator.single(SessionUpdate(userId, s.n_events, closed = false))
      }
  }

  /** File-source stream over a directory of parquet event files → hourly
    * counts → parquet sink. The deploy-shaped entry point: at scale this
    * is the ingest half of the pipeline (maxFilesPerTrigger bounds batch
    * size; checkpointLocation makes it exactly-once). */
  def runFileStream(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(srcDir)
    hourlyCounts(in).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
