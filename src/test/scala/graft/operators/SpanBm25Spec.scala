package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the exact-substring span detector and the BM25 scorer on
  * constructed corpora where the right answer is computable by hand. */
class SpanBm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("duplicatedSpans: planted verbatim run found, length exact, unique text silent") {
    // doc 1 and 2 share a verbatim 12-token run (→ 10 dup 3-gram windows,
    // max span 12); doc 3 shares nothing
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"delta $shared epsilon zeta"),
      (3L, "entirely different words with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 12L), (2L, 10L, 12L)))
  }

  test("duplicatedSpans: two disjoint runs in one doc stay separate islands") {
    val runA = (1 to 5).map(i => s"a$i").mkString(" ")   // 5 tokens → 3 windows @ n=3
    val runB = (1 to 4).map(i => s"b$i").mkString(" ")   // 4 tokens → 2 windows
    val docs = Seq(
      (1L, s"$runA x y z w $runB"),
      (2L, s"pad1 pad2 $runA pad3"),
      (3L, s"$runB pad4 pad5 pad6")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: 3+2 dup windows, longest ISLAND is runA's 3 → span 3+3-1=5
    assert(got.head === ((1L, 5L, 5L)))
  }

  test("removeDuplicatedSpans: owner keeps its copy, non-owner is cut, bytes pinned") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),        // owner (min id) — untouched
      (2L, s"delta $shared epsilon zeta"),      // loses the 12-token run
      (3L, "entirely different words with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    def md5Of(s: String) =
      spark.range(1).select(md5(lit(s))).head.getString(0)
    assert(got.length === 3) // row count stable
    assert(got(0).getInt(1) === 15 && got(0).getLong(2) === 15L)
    assert(got(0).getString(3) === md5Of(s"alpha beta $shared gamma"))
    assert(got(1).getInt(1) === 15 && got(1).getLong(2) === 3L)
    assert(got(1).getString(3) === md5Of("delta epsilon zeta"))
    assert(got(2).getLong(2) === 8L) // untouched unique doc (8 tokens)
  }

  test("bm25: rarer term dominates; doc without any term absent; scores positive") {
    val docs = Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Scores(docs, "doc_id", "text", Seq("rare", "common"))
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // doc 3 hits nothing
    val s1 = got(0).getDouble(2); val s2 = got(1).getDouble(2)
    assert(s1 > s2 && s2 > 0.0) // doc 1 adds the rarer 'rare' term's idf
  }

  test("conjunctiveSearch: AND semantics — a doc missing one term never ranks") {
    val docs = Seq(
      (1L, "spark spark spark spark spark engine"),  // high tf, missing 'query'
      (2L, "spark query engine runs"),               // all terms, once each
      (3L, "spark query engine spark query engine"), // all terms, twice
      (4L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.conjunctiveSearch(docs, "doc_id", "text",
        Seq("spark", "query", "engine"), 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // docs 1 and 4 excluded regardless of tf; 3 outranks 2 on tf
    assert(out.toSeq === Seq((3L, 1), (2L, 2)))
    // topK truncates: k=1 keeps only the best
    val top1 = TextAnalysis.conjunctiveSearch(docs, "doc_id", "text",
      Seq("spark", "query", "engine"), 1).collect()
    assert(top1.length === 1 && top1(0).getLong(0) === 3L)
  }
}
