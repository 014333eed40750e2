package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Checkpoint RECOVERY — the production failure mode the other stream
  * suites don't exercise: the 11 logic-parity suites all run one
  * uninterrupted query, but a 100 TB pipeline's streaming jobs get
  * killed (preemption, deploys, OOM) and MUST resume from the
  * checkpoint with (a) their operator state intact and (b) no output
  * row emitted twice or lost.
  *
  * Both tests force a mid-stream stop: batch 1 is processed and
  * committed, the query is STOPPED, batch 2 arrives while the query is
  * down, and a NEW query object restarts from the same checkpoint dir
  * against the same source. The file sink (exactly-once under
  * checkpointing, unlike the memory sink) collects output across both
  * incarnations; parity is pinned against an uninterrupted run of the
  * identical input on a fresh stream, plus a no-duplicates assert
  * (count == distinct count) so a replayed batch would fail loudly.
  *
  *  - crawlFrontier: flatMapGroupsWithState — the recovered state is the
  *    per-host next-slot counter, so the batch-2 a.com URL must land on
  *    slot 2 (continuation), not slot 0 (reset) and not 4 (double-run).
  *  - dedupedDocs: watermark + dropDuplicatesWithinWatermark — the
  *    recovered state is the fingerprint set, so a post-restart copy of
  *    a pre-stop document must still be dropped.
  */
class StreamCheckpointRecoverySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rules = Seq(
    ("a.com", "/private"),
    ("b.com", "/")).toDF("host", "prefix")

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("crawlFrontier: restart from checkpoint continues per-host slots, output exactly-once") {
    implicit val sc = spark.sqlContext
    val ckpt = tmp("graft_ckpt_frontier_")
    val out = tmp("graft_out_frontier_")
    val in = MemoryStream[(Long, String, Double)]
    def start() = CurationStreams
      .crawlFrontier(in.toDF().toDF("doc_id", "url", "prio"),
        "doc_id", "url", "prio", rules, 5)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val batch1 = Seq(
      (1L, "https://a.com/page1", 10.0),
      (2L, "https://a.com/private/x", 99.0), // robots-blocked
      (3L, "https://a.com/page2", 30.0),
      (4L, "https://c.com/ok", 20.0))
    val batch2 = Seq(
      (5L, "https://a.com/page3", 70.0),
      (6L, "https://b.com/y", 50.0),         // robots-blocked (host-wide)
      (7L, "https://c.com/more", 5.0))

    val q1 = start()
    in.addData(batch1: _*)
    q1.processAllAvailable()
    q1.stop() // the "kill": batch 2 arrives while the query is down
    in.addData(batch2: _*)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("rid"), r.getAs[String]("host"),
        r.getAs[Long]("slot"), r.getAs[Long]("fetch_offset_s")))
    // exactly-once: no row written twice across the two incarnations
    assert(rows.length === rows.distinct.length)
    assert(rows.map(_._1).toSet === Set(1L, 3L, 4L, 5L, 7L))
    // RECOVERED state: a.com's batch-1 slots were 0 (id 3, prio 30) and
    // 1 (id 1, prio 10); the post-restart id 5 must continue at slot 2 —
    // slot 0 would mean the counter reset (state lost), slot 4 a replay.
    val a = rows.filter(_._2 == "a.com").sortBy(_._3)
    assert(a.map(r => (r._1, r._3, r._4)).toSeq ===
      Seq((3L, 0L, 0L), (1L, 1L, 5L), (5L, 2L, 10L)))
    val c = rows.filter(_._2 == "c.com").sortBy(_._3)
    assert(c.map(r => (r._1, r._3)).toSeq === Seq((4L, 0L), (7L, 1L)))

    // parity with an UNINTERRUPTED run of the identical input
    val in2 = MemoryStream[(Long, String, Double)]
    val q3 = CurationStreams
      .crawlFrontier(in2.toDF().toDF("doc_id", "url", "prio"),
        "doc_id", "url", "prio", rules, 5)
      .writeStream.format("memory").queryName("frontier_uninterrupted")
      .outputMode("append").start()
    try {
      in2.addData(batch1: _*)
      q3.processAllAvailable()
      in2.addData(batch2: _*)
      q3.processAllAvailable()
      val want = spark.table("frontier_uninterrupted").collect()
        .map(r => (r.getAs[Long]("rid"), r.getAs[String]("host"),
          r.getAs[Long]("slot"), r.getAs[Long]("fetch_offset_s"))).toSet
      assert(rows.toSet === want)
    } finally q3.stop()
  }

  test("dedupedDocs: restart from checkpoint keeps the fingerprint state — post-restart duplicate still dropped") {
    implicit val sc = spark.sqlContext
    val ckpt = tmp("graft_ckpt_dedup_")
    val out = tmp("graft_out_dedup_")
    val in = MemoryStream[(Long, Timestamp, String)]
    def start() = CurationStreams
      .dedupedDocs(in.toDF().toDF("doc_id", "ts", "text"),
        "ts", "doc_id", "text")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 10:01:00")
    val q1 = start()
    in.addData((1L, t0, "hello world"), (2L, t0, "fresh doc"))
    q1.processAllAvailable()
    q1.stop() // kill between micro-batches
    // while down: one duplicate of doc 1 (case/space variant the
    // fingerprint normalizes) and one genuinely new doc
    in.addData((3L, t1, "Hello   WORLD"), (4L, t1, "brand new"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // output schema is (doc_id, ts, fp) — the survivor manifest
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp")))
    assert(rows.length === rows.distinct.length) // exactly-once
    // fingerprint state survived the restart: doc 3 was dropped even
    // though its original (doc 1) was seen by the PREVIOUS incarnation
    assert(rows.map(_._1).toSet === Set(1L, 2L, 4L))
    assert(rows.map(_._2).distinct.length === 3)
  }
}
