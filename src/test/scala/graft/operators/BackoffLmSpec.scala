package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** backoffTrigramBits: single-threaded model of the exact pruned cascade
  * (same floor-log2 integers, same head-count denominators) on corpora
  * built to force each path. */
class BackoffLmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  /** (n_trigrams, n_tri, n_bi, n_uni, sum_bits) per doc. */
  private def model(docs: Seq[(Long, String)], p3: Int, p2: Int)
    : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (d, t) => d -> t.split(" ", -1).toSeq }
    val tris = toks.flatMap { case (d, ts) =>
      ts.sliding(3).filter(_.size == 3).map(w => (d, w(0), w(1), w(2))) }
    val bis = toks.flatMap { case (_, ts) =>
      ts.sliding(2).filter(_.size == 2).map(w => (w(0), w(1))) }
    val unis = toks.flatMap(_._2)
    val c3 = tris.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size.toLong).toMap
    val h2 = tris.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val c2 = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val h1 = bis.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c1 = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = unis.size.toLong
    tris.groupBy(_._1).map { case (d, ts) =>
      var (i3, i2, i1, sum) = (0L, 0L, 0L, 0L)
      ts.foreach { case (_, w1, w2, w3) =>
        if (c3((w1, w2, w3)) >= p3) {
          i3 += 1; sum += flog2(h2((w1, w2))) - flog2(c3((w1, w2, w3)))
        } else if (c2((w2, w3)) >= p2) {
          i2 += 1; sum += flog2(h1(w2)) - flog2(c2((w2, w3))) + 1
        } else {
          i1 += 1; sum += flog2(n) - flog2(c1(w3)) + 2
        }
      }
      d -> (ts.size.toLong, i3, i2, i1, sum)
    }
  }

  private def run(docs: Seq[(Long, String)], p3: Int, p2: Int)
    : Map[Long, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.backoffTrigramBits(docs.toDF("doc_id", "text"),
        "doc_id", "text", p3, p2)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("all three paths fire and match the model") {
    // "a b c" ×3 → tri path; "x y z" ×2 with bigram (y z) ×2 → bi path;
    // "p q r" once with (q r) once → uni path
    val docs = Seq(
      1L -> "a b c a b c",
      2L -> "a b c x y z",
      3L -> "x y z p q r")
    val got = run(docs, 3, 2)
    assert(got === model(docs, 3, 2))
    val totals = got.values.foldLeft((0L, 0L, 0L)) { case ((a, b, c), v) =>
      (a + v._2, b + v._3, c + v._4) }
    assert(totals._1 > 0 && totals._2 > 0 && totals._3 > 0)
  }

  test("unpruned LM (prune3=1) never backs off on a self-scored corpus") {
    val docs = Seq(1L -> "m n o m n o", 2L -> "o m n q")
    val got = run(docs, 1, 1)
    assert(got === model(docs, 1, 1))
    assert(got.values.forall(v => v._3 == 0 && v._4 == 0))
  }

  test("docs under 3 tokens are absent; 3-token docs score exactly one trigram") {
    val docs = Seq(1L -> "a b", 2L -> "a b c", 3L -> "z")
    val got = run(docs, 3, 2)
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got(2L)._1 === 1L)
    assert(got === model(docs, 3, 2))
  }
}
