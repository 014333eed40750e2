package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * graft_simhash32 (row-local fingerprint kernel) must be value-identical
  * to the aggregate explode→groupBy formulation it replaces — same
  * fingerprints on the corpus, same visible-row set on degenerate docs,
  * and a shuffle-free plan.
  */
class SimHashSigSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val a = Dedup.simHashFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simHashFingerprintsAggregate(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (a, b)
  }

  test("matches the aggregate form on the test corpus") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val (a, b) = both(docs)
    assert(a.nonEmpty && a == b)
  }

  test("matches on degenerate and non-ascii docs; token-less docs drop out") {
    val weird = Seq(
      (1L, "a"), (2L, "a b  c   d"), (3L, ""), (4L, "   "),
      (5L, "répète répète déjà"), (6L, "日本語 トークン 断片"),
      (7L, "x"), (8L, "the the the the")
    ).toDF("doc_id", "text")
    val (a, b) = both(weird)
    assert(a == b)
    // docs 3 and 4 have no non-empty token → absent from BOTH forms
    assert(!a.contains(3L) && !a.contains(4L) && a.size == 6)
  }

  test("fingerprint stage is a shuffle-free projection") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val plan = Dedup.simHashFingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("HashAggregate"), plan.take(2000))
  }
}
