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

  /** Native gap-based sessionization via `session_window` — the
    * DECLARATIVE form of [[sessionize]]'s custom state machine (Catalyst
    * merges overlapping [ts, ts+gap) windows per key; state eviction
    * rides the watermark, which batch execution ignores). One definition
    * serves three proofs: the q107 DuckDB oracle (batch, against the
    * islands SQL — pinning that the native operator's merge rule equals
    * the hand-rolled lag/cumsum sessionization), the streaming parity
    * spec, and the flatMapGroupsWithState comparison. Session end =
    * last event + gap, the [start, end) convention. */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Stream-STREAM interval join (the one join class CurationStreams'
    * stream-static shapes don't cover): purchases attributed to the same
    * user's views within the preceding hour. Both sides carry a 2-hour
    * watermark and the join condition bounds event time on BOTH ends, so
    * Spark can evict join state — the requirement for an append-mode
    * stream-stream join to run unbounded (without the time bound, state
    * grows forever; the analysis rejects it). The SAME function on a
    * batch DataFrame is the parity oracle (StreamStreamJoinSpec). */
  def viewPurchaseAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    views.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("value"))
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
