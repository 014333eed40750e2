package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Watermark-bounded streaming exact dedup: CurationStreams.dedupedDocs
  * must keep ONE row per content fingerprint across micro-batch
  * boundaries (state carried batch-to-batch), with whitespace-normalized
  * lowercase matching (the batch q42 keeper's fingerprint), while using
  * dropDuplicatesWithinWatermark so the per-key state expires instead of
  * growing with the corpus.
  */
class StreamExactDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("one survivor per fingerprint across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = CurationStreams.dedupedDocs(df, "ts", "doc_id", "text")
      .writeStream.format("memory").queryName("sded")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:01:00")
      // batch 1: two distinct texts + one duplicate (case/space variant —
      // the fingerprint normalizes both)
      in.addData((1L, t0, "hello world"), (2L, t0, "fresh doc"),
        (3L, t0, "Hello   WORLD"))
      q.processAllAvailable()
      // batch 2: another duplicate of doc 1 (cross-batch state) + one new
      in.addData((4L, t1, "hello world"), (5L, t1, "brand new"))
      q.processAllAvailable()

      val rows = spark.table("sded").collect()
        .map(r => (r.getLong(0), r.getString(2)))
      // exactly one row per fingerprint: three distinct texts
      assert(rows.length == 3)
      assert(rows.map(_._2).distinct.length == 3)
      val ids = rows.map(_._1).toSet
      assert(ids.contains(2L) && ids.contains(5L))
      assert((ids & Set(1L, 3L)).size == 1) // one survivor of the dup pair
      assert(!ids.contains(4L))             // cross-batch duplicate dropped
    } finally q.stop()
  }
}
