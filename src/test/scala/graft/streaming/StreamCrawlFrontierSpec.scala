package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.UrlOps

/**
  * Streaming crawl frontier (CurationStreams.crawlFrontier): a landing
  * URL stream gated by a STREAM-STATIC LEFT ANTI join against robots
  * disallow rules, then politeness-scheduled per host with one long of
  * flatMapGroupsWithState state per host — slots dense and monotone
  * ACROSS micro-batches. Batch parity: on a static frame the operator
  * must equal the q158→q169 composition (robotsFilter →
  * politenessSchedule) row-for-row.
  */
class StreamCrawlFrontierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rules = Seq(
    ("a.com", "/private"),
    ("a.com", "/tmp"),
    ("b.com", "/")).toDF("host", "prefix")

  private def urlsBatch1 = Seq(
    (1L, "https://a.com/page1", 10.0),
    (2L, "https://a.com/private/x", 99.0), // blocked: /private prefix
    (3L, "https://a.com/page2", 30.0),
    (4L, "https://b.com/anything", 50.0),  // blocked: host-wide "/"
    (5L, "https://c.com/ok", 20.0))
  private def urlsBatch2 = Seq(
    (6L, "https://a.com/page3", 70.0),
    (7L, "https://a.com/tmp/y", 1.0),      // blocked: /tmp prefix
    (8L, "https://c.com/more", 5.0))

  test("batch parity: crawlFrontier == robotsFilter -> politenessSchedule") {
    val df = (urlsBatch1 ++ urlsBatch2).toDF("doc_id", "url", "prio")
    val got = CurationStreams
      .crawlFrontier(df, "doc_id", "url", "prio", rules, 5)
      .select(col("rid").as("doc_id"), col("host"), col("slot"),
        col("fetch_offset_s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = UrlOps.politenessSchedule(
        UrlOps.robotsFilter(df, "doc_id", "url", rules),
        "doc_id", "url", col("prio"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    // the composition itself is sane: a.com slots by priority desc
    val aSlots = got.filter(_._2 == "a.com").toSeq.sortBy(_._3)
    assert(aSlots.map(_._1) === Seq(6L, 3L, 1L)) // prio 70 > 30 > 10
  }

  test("streaming: anti join drops robots-blocked URLs; per-host slots stay monotone across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val df = in.toDF().toDF("doc_id", "url", "prio")
    val q = CurationStreams.crawlFrontier(df, "doc_id", "url", "prio", rules, 5)
      .writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    try {
      in.addData(urlsBatch1: _*)
      q.processAllAvailable()
      in.addData(urlsBatch2: _*)
      q.processAllAvailable()
      val rows = spark.table("frontier").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // robots: 2 (a.com/private), 4 (b.com host-wide), 7 (a.com/tmp) gone
      assert(rows.map(_._1).toSet === Set(1L, 3L, 5L, 6L, 8L))
      // batch 1 a.com: prio 30 (id 3) -> slot 0, prio 10 (id 1) -> slot 1;
      // batch 2 a.com: id 6 continues at slot 2 (state carried), NOT 0
      val a = rows.filter(_._2 == "a.com").sortBy(_._3)
      assert(a.map(r => (r._1, r._3, r._4)).toSeq ===
        Seq((3L, 0L, 0L), (1L, 1L, 5L), (6L, 2L, 10L)))
      // c.com: slot 0 in batch 1, slot 1 in batch 2
      val c = rows.filter(_._2 == "c.com").sortBy(_._3)
      assert(c.map(r => (r._1, r._3)).toSeq === Seq((5L, 0L), (8L, 1L)))
    } finally q.stop()
  }
}
