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
}
