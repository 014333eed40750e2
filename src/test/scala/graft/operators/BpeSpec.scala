package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
  * Pins Bpe.bpeMerges to an independent single-threaded model of the
  * reference BPE recurrence: weighted adjacent pair counts over the word
  * vocabulary, (count DESC, pair ASC) argmax, greedy leftmost
  * non-overlapping rewrite. The model is the Sennrich algorithm verbatim;
  * the operator must reproduce it merge-for-merge.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def modelMerges(corpus: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    (1 to rounds).map { _ =>
      val counts = collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((sa, sb), n) = counts.toSeq
        .sortBy { case ((a, b), m) => (-m, a, b) }.head
      vocab = vocab.map { case (syms, c) =>
        val out = collection.mutable.ArrayBuffer[String]()
        var just = false
        syms.foreach { s =>
          if (!just && out.nonEmpty && out.last == sa && s == sb) {
            out(out.size - 1) = sa + sb; just = true
          } else { out += s; just = false }
        }
        out.toVector -> c
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (sa, sb, n)
    }
  }

  test("merges match the single-threaded Sennrich model, greedy runs included") {
    // "aaaa" exercises the greedy-leftmost overlap rule: (a,a) counts 3
    // per occurrence but merges as [aa, aa]; "low/lower/newest/widest"
    // is the original paper's worked vocabulary
    val corpus = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest newest widest widest widest",
      "aaaa aaaa aaaa ba ba ba ba ba ba ba ba ba ba ba ba")
    val docs = corpus.toDF("text")
    val got = Bpe.bpeMerges(docs, "text", 6)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == modelMerges(corpus, 6))
  }

  test("second round can merge a symbol produced by the first") {
    // "cc" dominates, then (cc, cc) — multi-char symbols on both sides
    val corpus = Seq("cccc cccc cccc cccc cccc x y")
    val docs = corpus.toDF("text")
    val got = Bpe.bpeMerges(docs, "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == modelMerges(corpus, 2))
    assert(got(1)._1 == "cc" && got(1)._2 == "cc")
  }

  test("tokenize counts symbols of the learned segmentation per document") {
    // after 2 rounds on "cccc...": cccc -> [cccc] (1 token); x, y -> 1 each
    val docs = Seq((1L, "cccc cccc cccc cccc cccc x y"), (2L, "cccc cc"))
      .toDF("doc_id", "text")
    val got = Bpe.bpeTokenize(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: five cccc (1 sym each after cc+cc merge) + x + y = 7 tokens/7 words
    // doc 2: cccc (1) + cc (1) = 2 tokens/2 words
    assert(got == Seq((1L, 7L, 7L), (2L, 2L, 2L)))
  }
}
