package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark
import graft.operators.TextHashing._

/**
  * Pins the codegen'd graft_gram_hash_set expression to the composable
  * column formulation it replaced — same sorted distinct gram-hash array
  * for arbitrary strings, including the short-text edge cases (empty, 1-2
  * chars) whose grams are padded with ascii("")=0. Fixed ScalaCheck seeds
  * (the scalatest bridge isn't in the offline cache).
  */
class GramHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def composable =
    sort_array(array_distinct(transform(shingles3(col("text")), g => gramHash(g))))

  private def check(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val rows = df.select(
      call_function("graft_gram_hash_set", col("text")).as("fast"),
      composable.as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for <$t>")
    }
  }

  test("matches the composable formulation on edge cases") {
    check(Seq("", "a", "ab", "abc", "abcd", "aaaa", "  ", "a a a",
      "the quick brown fox", "ünïcôdé tëxt ẞ", "日本語テキスト"))
  }

  test("matches the composable formulation on random strings") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ß', '中', '.', ','))).map(_.mkString)
    val batches = (1L to 5L).flatMap(s =>
      Gen.listOfN(40, gen)(Gen.Parameters.default, Seed(s)))
    check(batches.flatten)
  }

  test("null text yields null (filtered by gramSets)") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "abc"))
      .toDF("doc_id", "text")
    assert(Dedup.gramSets(df, "doc_id", "text").count() == 1)
  }

  private def composableCp =
    sort_array(array_distinct(transform(shingles3(col("text")), g => cpGramHash(g))))

  test("wide kernel matches the composable codepoint formulation on unicode text") {
    val texts = Seq("", "中", "中文", "中文字", "日本語テキスト処理",
      "mixed 中文 and ascii", "ẞßé日本", "aaa", "the quick brown fox")
    val rows = texts.toDF("text").select(
      call_function("graft_gram_hash_set_cp", col("text")).as("fast"),
      composableCp.as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for <$t>")
    }
  }

  test("base-256 collides on CJK grams the codepoint polynomial separates") {
    // h256(c1,c2,c3) = c1·2^16 + c2·2^8 + c3 is NOT injective past
    // codepoint 255: (a, b, c) and (a−1, b+256, c) hash identically.
    val g1 = new String(Array(0x4E01, 0x4E00, 0x4E00), 0, 3)
    val g2 = new String(Array(0x4E00, 0x4F00, 0x4E00), 0, 3)
    assert(g1 != g2)
    def h(s: String, wide: Boolean): Seq[Long] =
      graft.functions.GramHashSet
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), wide)
        .toLongArray().toSeq
    // the narrow hash CANNOT tell these grams apart (Jaccard drift on
    // CJK corpora — the SURVEY §8.5 scope note)...
    assert(h(g1, wide = false) == h(g2, wide = false))
    // ...the wide base-2^21 polynomial is injective over full Unicode
    assert(h(g1, wide = true) != h(g2, wide = true))
  }

  test("minHashJWide never overflows and equals minHashJ on narrow hashes") {
    // wide hashes reach ~0x10FFFF·2^42; (h mod P)·a + b stays < 2^62
    val maxH = 0x10FFFFL * 4398046511104L + 0x10FFFFL * 2097152L + 0x10FFFFL
    val rows = Seq(maxH, 0L, 12345678L, P - 1).toDF("h")
      .select(MinHashParams.indices.map(j => minHashJWide(col("h"), j).as(s"w$j")): _*)
      .collect()
    rows.foreach { r =>
      MinHashParams.indices.foreach { j =>
        val v = r.getLong(j)
        assert(v >= 0 && v < P, s"out of range: $v")
      }
    }
    // for h < P the reduction is the identity, so both families agree
    val both = Seq(42L, 65536L, P - 1).toDF("h")
      .select(minHashJ(col("h"), 3).as("a"), minHashJWide(col("h"), 3).as("b"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
