package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** phraseScrub / stopPhraseScrub: coverage semantics on planted docs —
  * overlapping matches, multi-length dictionaries, fully-scrubbed docs,
  * and the md5 byte pin. */
class PhraseScrubSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("overlapping occurrences cover the union of their tokens") {
    import spark.implicits._
    // dict phrase "a a": doc "a a a b" matches at 1 and 2 → tokens 1..3
    // covered, only "b" survives
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val dict = Seq(("a a", 2)).toDF("g", "plen")
    val got = TextAnalysis.phraseScrub(docs, "doc_id", "text", dict).collect()(0)
    assert((got.getLong(1), got.getLong(2), got.getString(3)) === (4L, 1L, md5("b")))
  }

  test("multi-length dictionary: trigram and bigram coverage compose; full scrub pins empty md5") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z tail"),   // trigram "x y z" covers 1..3
      (2L, "p q"),          // bigram "p q" covers everything
      (3L, "clean text here")).toDF("doc_id", "text")
    val dict = Seq(("x y z", 3), ("p q", 2)).toDF("g", "plen")
    val got = TextAnalysis.phraseScrub(docs, "doc_id", "text", dict)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === (1L, md5("tail")))
    assert(got(2L) === (0L, md5("")))
    assert(got(3L) === (3L, md5("clean text here")))
  }

  test("stopPhraseScrub derives the blocklist by (count DESC, phrase ASC)") {
    import spark.implicits._
    // "b c" appears 3x, "a b" 2x — topBi=1 must pick "b c"
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b c"),
      (3L, "b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.stopPhraseScrub(docs, "doc_id", "text", topBi = 1, topTri = 0)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) === md5("a"))
    assert(got(3L) === md5("d"))
  }
}
