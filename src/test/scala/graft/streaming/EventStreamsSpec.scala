package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("hourlyCounts over a memory stream produces windowed aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.Event]
    input.addData(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(2, ts(10), 10, "click", 2.0),
      EventStreams.Event(3, ts(70), 11, "view", 3.0))
    val q = EventStreams.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
      assert(rows.map(_.getAs[Long]("n_events")).sum == 3)
      assert(rows.length == 2) // two distinct (window, type) groups
    } finally q.stop()
  }

  test("slidingCounts: each event lands in all four overlapping 15-min slides") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.Event]
    // minute 30 and 31 share one 15-min slide cell (the base epoch sits
    // 800 s into a cell, so m=30 is at offset 800 and m=31 at 860 —
    // minute 35 would cross into the NEXT cell and share only 3 windows)
    input.addData(
      EventStreams.Event(1, ts(30), 10, "click", 1.0),
      EventStreams.Event(2, ts(31), 10, "click", 1.0), // same slide cell
      EventStreams.Event(3, ts(200), 11, "view", 1.0))
    val q = EventStreams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sliding").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events")))
      // user 10: both events within 5 min -> 4 shared windows of n=2
      // (slide 15 min, width 60 min => 60/15 = 4 windows cover a point)
      assert(rows.count(_._2 == 10L) === 4)
      assert(rows.filter(_._2 == 10L).forall(_._3 == 2L))
      assert(rows.count(_._2 == 11L) === 4)
    } finally q.stop()
  }

  test("runFileStream: parquet-dir source to parquet sink equals batch hourlyCounts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("efs").toString
    val (src, out, chk) = (s"$base/src", s"$base/out", s"$base/chk")
    val events = Seq(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(2, ts(10), 10, "click", 2.0),
      EventStreams.Event(3, ts(70), 11, "view", 3.0),
      EventStreams.Event(4, ts(80), 12, "view", 4.0))
    def writeFile(evs: Seq[EventStreams.Event]): Unit =
      evs.toDF().withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(src)
    writeFile(events)
    val q = EventStreams.runFileStream(spark, src, out, chk)
    try {
      // APPEND mode emits a window only once the watermark (max event
      // time − 2 h, computed from the PREVIOUS batch) passes its end —
      // so advance it with a late flush file, then trigger one more
      // batch so the newly-finalized state is actually emitted. This is
      // the real deploy behavior: an hourly window leaves the sink two
      // hours (+ one trigger) after it closes.
      q.processAllAvailable()
      writeFile(Seq(EventStreams.Event(5, ts(300), 99, "flush", 0.0)))
      q.processAllAvailable()
      writeFile(Seq(EventStreams.Event(6, ts(301), 99, "flush", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[String]("event_type")) -> (r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toMap
    val batch = EventStreams.hourlyCounts(events.toDF())
      .collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[String]("event_type")) -> (r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toMap
    // every main-event window is closed and flushed; the flush events'
    // own window is still open and must NOT have been emitted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("row-local curation kernels run unchanged in a streaming query") {
    // simhash / top-bigram / PII scrub are stateless projections, so the
    // SAME Column expressions drive a micro-batch stream — the streaming
    // ingestion form of the curation pipeline. Values must equal the
    // batch run on the same rows (stream-batch parity).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "contact me me me at bob@mail.example.com now"))
    def curate(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        call_function("graft_simhash32", col("text")).as("fp"),
        call_function("graft_top_bigram_count", split(col("text"), " ")).as("top_bg"),
        graft.operators.TextAnalysis.redactPii(col("text")).as("redacted"),
        // r10: the char-collision moments kernel is stateless too
        graft.operators.TextAnalysis.charStats(col("text")).as("cs"))
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curated").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getInt(2), r.getString(3), r.getSeq[Long](4))).toMap
      val batch = curate(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getInt(2), r.getString(3), r.getSeq[Long](4))).toMap
      assert(streamed == batch)
      assert(streamed(2L)._3.contains("<EMAIL>"))
      assert(streamed(1L)._2 == 2) // "the quick" and "quick brown" tie at 2
    } finally q.stop()
  }

  test("multimodal decode runs over a stream of media rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    val input = MemoryStream[Multimodal.MediaRow]
    input.addData(
      Multimodal.MediaRow(1, "tiny".getBytes("UTF-8"), "image", "web"),
      Multimodal.MediaRow(2, "a longer payload body".getBytes("UTF-8"), "audio", "crawl"))
    val q = Multimodal.decodeFeaturesStream(input.toDS())
      .writeStream.format("memory").queryName("media_feat").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("media_feat").collect()
      assert(rows.length == 2)
      val byId = rows.map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("byte_len")).toMap
      assert(byId == Map(1L -> 4, 2L -> 21))
      assert(rows.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("frames") >= 1))
    } finally q.stop()
  }

  test("dedupedStream drops replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.Event]
    input.addData(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(1, ts(0), 10, "click", 1.0), // duplicate
      EventStreams.Event(2, ts(1), 10, "view", 2.0))
    val q = EventStreams.dedupedStream(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("sessionize closes a session after a 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.Event]
    input.addData(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(2, ts(5), 10, "click", 1.0),
      EventStreams.Event(3, ts(60), 10, "click", 1.0)) // 55-min gap → new session
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
      // one closed session with 2 events + one open session with 1 event
      assert(rows.exists(r => r.getAs[Boolean]("closed") && r.getAs[Long]("n_events") == 2))
      assert(rows.exists(r => !r.getAs[Boolean]("closed") && r.getAs[Long]("n_events") == 1))
    } finally q.stop()
  }
}
