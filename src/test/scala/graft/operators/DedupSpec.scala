package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup
    (3L, "completely different content about spark query engines and shuffles")
  ).toDF("doc_id", "text")

  test("exactDuplicates groups identical texts, keeps min id") {
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups(0).getAs[Long]("keep_id") == 0L)
    assert(dups(0).getAs[Long]("n_copies") == 2L)
  }

  test("ngramJaccardPairs finds exact and near duplicates above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical → jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashLshPairs candidates agree with exact Jaccard on strong dups") {
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // LSH pairs are verified → never false positives
    assert(lsh.contains((0L, 1L))) // identical docs always collide in every band
  }

  test("simhash: identical docs get identical fingerprints (hamming 0)") {
    val fp = Dedup.simHashFingerprints(docs, "doc_id", "text")
    val pairs = Dedup.simHashPairs(fp, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }
}
