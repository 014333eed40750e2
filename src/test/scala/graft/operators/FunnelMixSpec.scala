package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Unit pins for the round-10 curation/analytics operators: char-stats
  * codepoint counting (astral parity), collision-index extremes, mixture
  * weights on a hand-computed corpus, gate-funnel cumulative semantics
  * and NULL-gate handling, margin mining's noise-floor rejection, and the
  * event funnel's strictly-after first-touch walk.
  */
class FunnelMixSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("charStats counts CODEPOINTS: astral char is one, not two units") {
    // "a😀😀b": n=4 codepoints (UTF-16 length 6), counts a:1 😀:2 b:1
    // → Σcnt² = 1+4+1 = 6, distinct = 3
    val r = Seq("a😀😀b").toDF("t")
      .select(TextAnalysis.charStats(col("t")).as("cs"))
      .collect()(0).getSeq[Long](0)
    assert(r === Seq(4L, 6L, 3L))
  }

  test("collision index: single-char spam ~1, all-distinct = 1/n") {
    val out = Seq((1L, "aaaaaaaa"), (2L, "abcdefgh")).toDF("doc_id", "text")
    val m = TextAnalysis.charCollisionIndex(out, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) === 1.0)     // 64/64
    assert(m(2L) === 0.125)   // 8/64
  }

  test("mixtureWeights: exact rational weight, NULL for untargeted stratum") {
    // a: 30 tokens, b: 10 → total 40; target a=500000ppm (0.5)
    // actual a = 0.75 → weight = 0.5/0.75 = 2/3 → r6 = 0.666667
    val docs = Seq(("a", "t t t"), ("a", "t t t"), ("b", "t")).toDF("s", "text")
      .withColumn("text", concat_ws(" ", array_repeat(lit("x"),
        when(col("s") === "a", 15).otherwise(10))))
    val targets = Seq(("a", 500000L)).toDF("stratum", "target_ppm")
    val out = Sampling.mixtureWeights(docs, col("s"),
        TextAnalysis.wsTokenCount(col("text")), targets)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), if (r.isNullAt(5)) null else r.getDouble(5))).toMap
    assert(out("a") === ((30L, 0.666667)))
    assert(out("b") === ((10L, null)))
  }

  test("gateFunnel: cumulative prefixes; NULL gate result never passes") {
    val df = Seq(
      ("g", Some(10), true), ("g", Some(3), true),
      ("g", None, true), ("g", Some(10), false)).toDF("s", "len", "ok")
    val r = Profile.gateFunnel(df, col("s"), Seq(
        "len" -> (col("len") >= 5),        // NULL len → not passing
        "ok" -> col("ok"))).collect()(0)
    assert(r.getLong(1) === 4L)  // n_total
    assert(r.getLong(2) === 2L)  // len≥5: the two Some(10); None blocked
    assert(r.getLong(3) === 1L)  // + ok: only the first row
  }

  test("marginTopMatch: hub query with best≈second is rejected") {
    // q1=(1,0): best 1.0 vs c1, second 0.0 vs c3 → accepted; q2=(1,1)
    // sits equidistant from c1/c3 (both cos ≈ 0.707) → margin 0 →
    // rejected despite a high absolute best cosine (the hub case).
    val q = Seq((100L, Array(1f, 0f)), (200L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(2f, 0f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.marginTopMatch(q, c, 10000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(5))).toMap
    assert(out(100L)._2 === 1)
    assert(out(200L)._1 === 1L)  // tie on cosine → smaller cand_id wins
    assert(out(200L)._2 === 0)   // margin 0 < 0.01
  }

  test("marginTopMatch: single-candidate query has NULL floor, not accepted") {
    val q = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val c = Seq((2L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val r = SimilaritySearch.marginTopMatch(q, c).collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.getInt(5) === 0)
  }

  test("kAnonymityAnnotate: NULL quasi values form their own class, not dropped") {
    val df = Seq((1L, Some("en")), (2L, Some("en")), (3L, None),
      (4L, None), (5L, Some("de"))).toDF("id", "lang")
    val out = Profile.kAnonymityAnnotate(df, Seq(col("lang")), 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(out.size === 5)                  // a plain equi-join would lose 3,4
    assert(out(1L) === ((2L, 0)))           // en class of 2: kept
    assert(out(3L) === ((2L, 0)))           // the two NULLs are ONE class of 2
    assert(out(5L) === ((1L, 1)))           // de singleton: suppressed
  }

  test("kAnonymityGeneralize: finest passing level wins; exhausted ladder suppresses") {
    val df = Seq((1L, "en", 50), (2L, "en", 250), (3L, "en", 250),
      (4L, "de", 50)).toDF("id", "lang", "len")
    val out = Profile.kAnonymityGeneralize(df, Seq(
        Seq(col("lang"), expr("len div 100")), Seq(col("lang"))), 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(out(2L) === ((0, 0)) && out(3L) === ((0, 0))) // class of 2 at L0
    assert(out(1L) === ((1, 0)))   // L0 singleton, en has 3 at L1
    assert(out(4L) === ((-1, 1)))  // de singleton at every level
  }

  test("benfordReport: digit extraction, shares sum to 1, zero/negative excluded") {
    // digits: 1×4, 2×3, 9×1; zeros and negatives' |v| still count digits
    val vals = Seq(1L, 10L, 123L, 1999L, 2L, 25L, 299L, 900L, 0L, -14L)
      .toDF("v")
    val out = Profile.benfordReport(vals, col("v"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1, 2, 9))
    assert(out(1)._1 === 5L)   // 1, 10, 123, 1999, |-14|
    assert(out(2)._1 === 3L && out(9)._1 === 1L)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5)
    assert(out(1)._3 === 0.301030)   // the literal expectation rides through
  }

  test("labelModelVote: majority, tie→smallest label, all-abstain stays NULL") {
    val df = Seq(
      (1L, Some("en"), Some("en"), Some("de")), // majority en, margin 1
      (2L, Some("en"), Some("de"), None),       // tie → 'de' (lexicographic)
      (3L, None, None, None),                   // all abstain → unlabeled
      (4L, None, Some("fr"), None))             // single vote, margin 1
      .toDF("id", "a", "b", "c")
    val out = Profile.labelModelVote(df, col("id"),
        Seq(col("a"), col("b"), col("c")))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.getString(2)), r.getInt(3))).toMap
    assert(out(1L) === ((3, Some("en"), 1)))
    assert(out(2L) === ((2, Some("de"), 0)))
    assert(out(3L) === ((0, None, 0)))
    assert(out(4L) === ((1, Some("fr"), 1)))
  }

  test("eventFunnel: strictly-after first-touch; pre-step events ignored") {
    // u1: full ordered funnel. u2: purchase BEFORE first view → no step 3
    // (and the click at the same minute as the view does NOT count —
    // strictly after). u3: never views → not even step 1.
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      (2L, ts(1), "purchase"), (2L, ts(2), "view"), (2L, ts(2), "click"),
      (2L, ts(6), "click"),
      (3L, ts(0), "click"), (3L, ts(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Temporal.eventFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("view") === ((2L, null)))       // u1, u2
    assert(out("click") === ((2L, 1.0)))       // u1@5, u2@6 (ts(2) too early)
    assert(out("purchase") === ((1L, 0.5)))    // u1 only; u2's was pre-view
  }
}
