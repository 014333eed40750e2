package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** tfidfSimilarPairs: hand-checkable cosine arithmetic and the df-band
  * guarantees (hapax and stopword terms never create pairs). */
class TfidfPairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], minDf: Int, maxDf: Int,
                  thr: Double): Map[(Long, Long), (Long, Double)] = {
    import spark.implicits._
    TextAnalysis.tfidfSimilarPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", minDf, maxDf, thr)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("identical banded vectors score exactly 1.0") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    // every token of docs 1/2 has df=2 (in band); doc 3's are hapax
    val got = run(docs, 2, 10, 0.5)
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === ((3L, 1.0)))
  }

  test("a stopword above maxDf creates no pair; hapax terms create no pair") {
    // "the" in all 4 docs (df=4 > maxDf=3); every other token unique
    val docs = Seq(1L -> "the q1", 2L -> "the q2", 3L -> "the q3", 4L -> "the q4")
    assert(run(docs, 2, 3, 0.0).isEmpty)
  }

  test("cosine matches the hand computation with tf weighting") {
    // corpus: d1="a a b", d2="a b b", filler docs keep a,b in band but
    // give them df=4 (N=4): idf = (4-4+0.5)/(4+0.5) = 1/9
    val docs = Seq(1L -> "a a b", 2L -> "a b b", 3L -> "a b", 4L -> "b a")
    val idf = (4.0 - 4.0 + 0.5) / (4.0 + 0.5)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val (wa1, wb1) = (2 * idf, 1 * idf) // d1 weights
    val (wa2, wb2) = (1 * idf, 2 * idf) // d2 weights
    val dot = r6(wa1 * wa2) + r6(wb1 * wb2)
    val n1 = math.sqrt(r6(wa1 * wa1) + r6(wb1 * wb1))
    val want = r6(dot / (n1 * n1)) // d2 norm equals d1 norm by symmetry
    val got = run(docs, 2, 10, 0.0)
    assert(got((1L, 2L))._1 === 2L)
    assert(got((1L, 2L))._2 === want)
    // the symmetric-profile pair must score below the identical pair (3,4)
    assert(got((3L, 4L))._2 === 1.0)
    assert(got((1L, 2L))._2 < 1.0)
  }
}
