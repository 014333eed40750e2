package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontamination, Sketches, TextAnalysis}

/**
  * Aggregation-STATE bounds under adversarial skew: for every
  * collect_set/collect_list site in the library, the per-cell buffer must
  * be bounded BY CONSTRUCTION (a filter/limit upstream of the aggregate),
  * not merely by the shape of friendly data — a stopword-grade hot key at
  * 10B docs otherwise accumulates a multi-GB buffer in ONE cell and OOMs
  * exactly the skewed task. Each test plants a worst-case hot key and
  * pins the bound. The full site-by-site audit table lives in SURVEY §8.
  */
class AggStateBoundSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("inverted index: a term in EVERY doc never reaches the posting aggregation") {
    val nDocs = 3000
    val maxDf = 20
    // every doc contains the hot bigram "of the" (df=3000, way out of
    // band); "the wK" bigrams land IN band (df = 3000/300 = 10 <= 20);
    // "wK uI" bigrams are unique (df=1, below band)
    val docs = (0 until nDocs)
      .map(i => (i.toLong, s"of the w${i % 300} u$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndexTerms(docs, "doc_id",
      TextAnalysis.wordBigrams(split(col("text"), " ")), minDf = 2, maxDf = maxDf)
      .collect()
    // the hot term is out-of-band: absent from the OUTPUT...
    assert(!out.exists(_.getString(0) == "of the"))
    // ...and, because the band filter runs BEFORE collect_list (pinned by
    // PlanAuditSpec's q103 ordering test), absent from the aggregation
    // INPUT: every group that reaches the set aggregate is one of these
    // output rows, so max per-cell state == max output df <= maxDf
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= maxDf))
    // exact in-band content: the 300 "the wK" terms at df=10 each
    assert(out.length == 300 && out.forall(_.getLong(1) == 10L))
    // a planted 3-doc term round-trips with exact sorted postings
    val docs2 = docs.union(Seq((90001L, "rare pair x"), (90002L, "rare pair y"),
      (90003L, "rare pair z")).toDF("doc_id", "text"))
    val out2 = TextAnalysis.invertedIndexTerms(docs2, "doc_id",
      TextAnalysis.wordBigrams(split(col("text"), " ")), minDf = 2, maxDf = maxDf)
      .filter(col("token") === "rare pair").collect()
    assert(out2.length == 1 && out2(0).getLong(1) == 3L &&
      out2(0).getString(2) == "90001,90002,90003")
  }

  test("KMV sketch: a group 100x larger than k still collects exactly k hashes") {
    val rows = (0 until 6400).map(i => ("hot", s"v$i")) ++
      (0 until 10).map(i => ("cold", s"w$i"))
    val df = rows.toDF("g", "v")
    val sk = Sketches.kmvSketch(df, col("g"), col("v"), k = 64).collect()
    // the rank filter runs UPSTREAM of collect_list (row_number <= k),
    // so the hot group's cell holds k entries, never 6400
    val hot = sk.find(_.getString(0) == "hot").get
    assert(hot.getSeq[Long](1).size == 64)
    val cold = sk.find(_.getString(0) == "cold").get
    assert(cold.getSeq[Long](1).size == 10)
  }

  test("cross-source overlap: a gram in EVERY doc collects at most |sources| entries") {
    val docs = (0 until 900).map { i =>
      (i.toLong, s"s${i % 3}", s"shared common phrase here always u$i t$i r$i m$i k$i")
    }.toDF("doc_id", "source", "text")
    // the collect_set key is the gram, the VALUE is the source — state is
    // <= |distinct sources| per cell regardless of how many docs carry
    // the gram, because bySrcTok dedups (source, gram) BEFORE grouping
    val out = Decontamination.crossSourceOverlap(docs, "source", "text")
    assert(out.collect().nonEmpty)
  }

  test("gram novelty: a gram in EVERY doc keeps a ONE-struct ownership cell") {
    // 2000 docs all containing the same 8 tokens => ONE gram key with
    // 2000 occurrences. A row_number-per-gram window would sort all 2000
    // on one task; the min(struct) aggregate combines map-side, so the
    // hot cell holds exactly one (doc, pos) struct at every stage.
    val hot = (0 until 2000).map(i => (i.toLong, "h1 h2 h3 h4 h5 h6 h7 h8"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.gramNovelty(hot, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // crawl order: only doc 0 owns the gram
    assert(out(0L) === 1L)
    assert((1 until 2000).forall(i => out(i.toLong) === 0L))
    // mixed corpus: the hot gram does not perturb novel counts elsewhere
    val mixed = hot.union(Seq((90001L, "n1 n2 n3 n4 n5 n6 n7 n8"))
      .toDF("doc_id", "text"))
    val out2 = graft.operators.Dedup.gramNovelty(mixed, "doc_id", "text", 8)
      .filter(col("doc_id") === 90001L).collect()
    assert(out2(0).getLong(2) === 1L)
  }

  test("tfidf pairs: a stopword in EVERY doc forms no posting and no pair fan-out") {
    // 1000 docs sharing "the"; pairs can only come from in-band terms
    // (df between 2 and 20): the planted 2-doc term
    val docs = ((0 until 1000).map(i => (i.toLong, s"the u$i")) ++
      Seq((90001L, "the shared tok"), (90002L, "the shared tok")))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .tfidfSimilarPairs(docs, "doc_id", "text", 2, 20, 0.0)
      .collect()
    // exactly the planted pair; its cosine is 1.0 (identical banded
    // vectors) and "the" (df=1002 > maxDf) contributed nothing
    assert(out.length === 1)
    assert(out(0).getLong(0) === 90001L && out(0).getLong(1) === 90002L)
    assert(out(0).getDouble(3) === 1.0)
  }
}
