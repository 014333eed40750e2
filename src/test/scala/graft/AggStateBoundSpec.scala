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
}
