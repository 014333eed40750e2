package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Stream-batch unification proof (ROADMAP round-4 #3): the SAME
  * EventStreams.hourlyCounts transformation applied to the events table as
  * a bounded file stream must produce exactly the batch result. This is
  * the property that lets a user run one pipeline definition in either
  * mode — and it is what makes the batch DuckDB oracles meaningful
  * evidence for the streaming operators too.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("hourlyCounts over a bounded file stream equals the batch result") {
    val batchRaw = graft.Tables.load(spark, TestSpark.sfDir, "events")
    // the file-stream source wants a DIRECTORY; stage the single testdata
    // file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    // file stream with the batch schema; same TIMESTAMP(NANOS) normalization
    // as Tables.load (LongType under nanosAsLong, NTZ under Spark 4.1.2)
    val rawSchema = spark.read.parquet(dir).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dir), "ts")

    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_parity")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_parity").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e6))).toSet
      val batch = EventStreams.hourlyCounts(batchRaw).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e6))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionWindowCounts over a bounded file stream equals the batch result") {
    val batchRaw = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val rawSchema = spark.read.parquet(dir).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dir), "ts")

    val q = EventStreams.sessionWindowCounts(stream)
      .writeStream.format("memory").queryName("session_parity")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))
      val streamed = spark.table("session_parity").collect().map(key).toSet
      val batch = EventStreams.sessionWindowCounts(batchRaw).collect().map(key).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
