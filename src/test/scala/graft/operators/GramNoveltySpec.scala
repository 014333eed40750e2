package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** gramNovelty: hand-checkable ownership semantics — crawl order is
  * (doc_id, position), first occurrence owns the gram, later copies score
  * zero, partial overlap scores the un-owned fraction. */
class GramNoveltySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    Dedup.gramNovelty(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("verbatim later copy scores 0; the first copy keeps 1.0") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b c d")
    val got = run(docs, 2)
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 0L, 0.0)))
  }

  test("partial overlap: only the shared tail is non-novel") {
    // doc 2 = "x y" + doc 1's "b c": grams of doc 2 = {x y, y b, b c};
    // "b c" is owned by doc 1 → novelty 2/3
    val docs = Seq(1L -> "a b c", 2L -> "x y b c")
    val got = run(docs, 2)
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L)._2 === 2L)
    assert(math.abs(got(2L)._3 - 0.666667) < 1e-9)
  }

  test("repeat INSIDE one doc: the doc owns the gram once, later positions not novel") {
    val docs = Seq(1L -> "a b a b")
    val got = run(docs, 2)
    // grams: (a b)@1 owned, (b a)@2 owned, (a b)@3 not (first is @1)
    assert(got(1L) === ((3L, 2L, 0.666667)))
  }

  test("docs shorter than n emit no row") {
    val docs = Seq(1L -> "a", 2L -> "a b c")
    val got = run(docs, 3)
    assert(!got.contains(1L) && got(2L)._1 === 1L)
  }
}
