package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Boundary, tie-break, and equivalence semantics of the temporal joins —
  * the rules the q90/q91 oracles rely on, exercised on adversarial toy
  * data (equal timestamps, empty match sets, bucket-straddling intervals,
  * exact half-open endpoints). */
class TemporalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: two views at the SAME instant as the purchase (tie → max id),
  //        plus a later view that must not leak backwards
  // key 2: no view at all → null payload
  // key 3: only a strictly-earlier view (inclusive vs strict agree)
  private val purchases = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00")),
    (200L, 2L, ts("2024-01-01 10:00:00")),
    (300L, 3L, ts("2024-01-01 10:00:00"))
  ).toDF("event_id", "user_id", "ts")

  private val views = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00"), 1.5),
    (11L, 1L, ts("2024-01-01 10:00:00"), 2.5),
    (12L, 1L, ts("2024-01-01 11:00:00"), 9.9), // after the purchase
    (30L, 3L, ts("2024-01-01 09:00:00"), 3.5)
  ).toDF("event_id", "user_id", "ts", "value")

  private def attrib(inclusive: Boolean) =
    Temporal.asOfJoin(purchases, views,
        leftKey = col("user_id"), rightKey = col("user_id"),
        leftTime = col("ts"), rightTime = col("ts"),
        payload = Seq("v_id" -> col("event_id"), "v_value" -> col("value")),
        tieBreak = col("event_id"), inclusive = inclusive)
      .select("event_id", "v_id", "v_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

  test("as-of inclusive: equal-time right row wins, tie broken by max tieBreak") {
    val got = attrib(inclusive = true)
    assert(got(100L) === Some((11L, 2.5))) // both 10:00 views qualify → id 11
    assert(got(200L) === None)             // user 2 never viewed
    assert(got(300L) === Some((30L, 3.5)))
    assert(got.size === 3)                 // left-outer: no drops, no dupes
  }

  test("as-of strict: equal-time right rows excluded, earlier ones still match") {
    val got = attrib(inclusive = false)
    assert(got(100L) === None)             // only equal-or-later views exist
    assert(got(200L) === None)
    assert(got(300L) === Some((30L, 3.5))) // strictly earlier — unaffected
  }

  test("binned range join ≡ naive theta join, half-open endpoints exact") {
    // intervals of width 3600s at bucket size 3600s: some aligned to the
    // bucket grid, some straddling two buckets; probes sit exactly ON
    // lo (must match) and ON hi (must not)
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // aligned
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")), // straddles
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00"))  // disjoint day
    ).toDF("iv_id", "lo", "hi")
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == lo of 1 → in 1 only
      (2L, ts("2024-01-01 10:45:00")), // in 1 and 2
      (3L, ts("2024-01-01 11:00:00")), // == hi of 1 → in 2 only
      (4L, ts("2024-01-01 11:29:59")), // last second of 2
      (5L, ts("2024-01-01 23:59:59"))  // matches nothing
    ).toDF("p_id", "pt")

    val binned = Temporal.rangeJoinBinned(probes, col("pt"), intervals,
        col("lo"), col("hi"), bucketSeconds = 3600L)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = probes.join(intervals, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

    assert(binned === naive)
    assert(binned === Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("bloom contamination report ≡ exact report on the documents table") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val exact = Decontamination.contaminationReport(corpus, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val bloom = Decontamination.contaminationReportBloom(corpus, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(exact.nonEmpty) // 3-grams over a shared vocabulary must overlap
    assert(bloom.toSeq === exact.toSeq)
  }
}
