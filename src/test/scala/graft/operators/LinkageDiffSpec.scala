package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Blocked record linkage + snapshot diff: contract pins on small
  * constructed inputs, and the structural blocking guarantee. */
class LinkageDiffSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("linkage: pairs come only from shared blocking keys; scorer filters the rest") {
    val recs = Seq(
      (1L, "red bolt"), (2L, "red bolts"), (3L, "red widget"),
      (4L, "blue bolt"), (5L, "green gear")).toDF("id", "name")
    val out = Linkage.blockedLinkage(recs, "id", "name",
        blockers = Seq(
          n => element_at(split(n, " "), -1),
          n => element_at(split(n, " "), 1)),
        maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // (1,2): share both blocks, dist 1 — exactly one output row.
    // (1,4): share the noun block, dist 3 — scored out at maxDist 2.
    // (1,3): share the adjective block, dist 6 — scored out.
    // (5,*): shares no block with anything — never even scored.
    assert(out == Set((1L, 2L, 1)))
  }

  test("linkage: identical names in one block pair at distance 0") {
    val recs = Seq((1L, "red bolt"), (2L, "red bolt")).toDF("id", "name")
    val out = Linkage.blockedLinkage(recs, "id", "name",
        blockers = Seq(n => element_at(split(n, " "), -1)), maxDist = 0)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }

  test("snapshot diff: added/removed/changed statuses; unchanged dropped") {
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "t", "n")
    val v2 = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L)).toDF("k", "t", "n")
    val out = Merge.snapshotDiff(v1, v2, "k", Seq("t", "n"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshot diff of identical snapshots is empty") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
    assert(Merge.snapshotDiff(v, v, "k", Seq("t")).isEmpty)
  }

  test("snapshot diff sees null-vs-value changes and null-position shifts") {
    // concat_ws SKIPS nulls, so without per-column sentinels
    // (x="a", y=NULL) and (x=NULL, y="a") would fingerprint identically
    val v1 = Seq((1L, Some("a"), Option.empty[String]),
      (2L, Some("a"), Option.empty[String])).toDF("k", "x", "y")
    val v2 = Seq((1L, Option.empty[String], Some("a")),
      (2L, Some("a"), Option.empty[String])).toDF("k", "x", "y")
    val out = Merge.snapshotDiff(v1, v2, "k", Seq("x", "y"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "changed")))
  }

  test("snapshot diff separator keeps shifted payload splits distinct") {
    // ("ab","c") vs ("a","bc") concat to the same string without a
    // separator — the diff must still see them as changed
    val v1 = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val v2 = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val out = Merge.snapshotDiff(v1, v2, "k", Seq("x", "y"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "changed")))
  }
}
