package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Stream-stream join parity: EventStreams.viewPurchaseAttribution (a
  * watermarked, time-bounded self-join — the join class whose state
  * eviction contract stream-static joins never exercise) over a bounded
  * file stream must equal the same function run in batch. Complements
  * StreamBatchParitySpec (windowed agg) and the dropDuplicates parity in
  * EventStreamsSpec.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("viewPurchaseAttribution over a bounded file stream equals the batch result") {
    val batchRaw = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val rawSchema = spark.read.parquet(dir).schema
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dir), "ts")

    val q = EventStreams.viewPurchaseAttribution(stream)
      .writeStream.format("memory").queryName("ssj_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = EventStreams.viewPurchaseAttribution(batchRaw).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
