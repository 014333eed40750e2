package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Resolution semantics of the CDC merge: latest-seq wins, deletes drop,
  * inserts land, absent-key deletes are no-ops, untouched keys pass. */
class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("applyChanges: upsert conflict, delete, phantom delete, insert, passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "upsert", 1),  // superseded
      (2L, "b3", "upsert", 2),  // wins
      (3L, null, "delete", 1),  // removes key 3
      (9L, null, "delete", 1),  // key never existed — must not emit a row
      (4L, "d", "upsert", 1)    // insert
    ).toDF("k", "v", "op", "seq")
    val got = Merge.applyChanges(base, changes, "k", "seq", "op")
    assert(got.columns.toSeq === Seq("k", "v")) // output schema = base schema
    assert(got.orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("applyChanges: empty change set is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, String, Int)].toDF("k", "v", "op", "seq")
    assert(Merge.applyChanges(base, changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }

  test("containmentPairs: substring doc fully contained, reverse direction absent") {
    val host = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, host),
      (2L, host.substring(10, 40)), // verbatim excerpt → containment 1.0 in 1
      (3L, "completely unrelated text with different characters")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists { case (a, b, c) => a == 2L && b == 1L && c == 1.0 })
    assert(!got.exists { case (a, b, _) => a == 1L && b == 2L }) // host ⊄ quote
  }
}
