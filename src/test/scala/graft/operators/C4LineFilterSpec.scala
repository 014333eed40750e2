package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** C4 rules (TextAnalysis.c4LineFilter, Raffel et al. 2020 §2.2) at the
  * paper's two levels: the three LINE rules fire independently, the two
  * PAGE rules ('{' / "lorem ipsum") drop the whole doc, the doc-level
  * min-lines drop, the rebuilt-text md5, and the row-local plan shape
  * (no shuffle). Cross-engine value parity is the q198 DuckDB gate. */
class C4LineFilterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val goodLine = "this is a perfectly fine sentence here."

  private def run(docs: Seq[(Long, String)]): Map[Long, (Int, Int, Boolean, Option[String])] =
    TextAnalysis.c4LineFilter(docs.toDF("id", "text"), "id", "text",
        minWordsPerLine = 5, minLinesPerDoc = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), Option(r.getString(4)))))
      .toMap

  test("each LINE rule drops exactly its line") {
    val lines = Seq(
      goodLine,                                      // kept
      "no terminal punctuation at all here",         // rule 1: terminal punct
      "too short.",                                  // rule 2: min words
      "please enable JavaScript to view this page.", // rule 3: javascript (case-insens)
      "another perfectly fine closing sentence!")    // kept (bang terminal)
    val got = run(Seq(1L -> lines.mkString("\n")))
    val (nLines, nKept, kept, _) = got(1L)
    assert(nLines === 5)
    assert(nKept === 2)
    assert(!kept, "2 kept lines < minLinesPerDoc=3 must drop the doc")
  }

  test("PAGE rules drop the whole doc, not the offending line (paper §2.2)") {
    val enough = Seq(goodLine,
      "a second acceptable sentence goes right here.",
      "and a third one to clear the minimum!")
    val braces = (enough :+ "a code line with { braces } in it.").mkString("\n")
    val lorem = (enough :+ "some Lorem Ipsum dolor sit amet filler.").mkString("\n")
    val got = run(Seq(1L -> braces, 2L -> lorem, 3L -> enough.mkString("\n")))
    // both docs clear minLinesPerDoc on line rules alone (the page-bad
    // line itself passes every LINE rule) — only the page rule drops them
    assert(got(1L)._2 === 4 && !got(1L)._3 && got(1L)._4 === None,
      "'{' anywhere must discard the page")
    assert(got(2L)._2 === 4 && !got(2L)._3 && got(2L)._4 === None,
      "'lorem ipsum' anywhere must discard the page")
    assert(got(3L)._3, "the control doc without page triggers survives")
  }

  test("terminal punctuation set is . ! ? and double-quote") {
    val lines = Seq(
      "an ordinary declarative sentence right here.",
      "is this a question with enough words?",
      "what an exciting exclamation sentence here!",
      "he said the words \"quoted at the end\"",
      "a line ending with a comma instead,",
      "a line ending with a semicolon here;")
    val got = run(Seq(1L -> lines.mkString("\n")))
    assert(got(1L)._2 === 4)
    assert(got(1L)._3)
  }

  test("kept docs rebuild byte-exactly: clean_md5 matches local md5 of kept lines") {
    val keptLines = Seq(goodLine,
      "a second acceptable sentence goes right here.",
      "and a third one to clear the minimum!")
    val doc = (keptLines :+ "dropped for missing terminal punctuation").mkString("\n")
    val got = run(Seq(1L -> doc))
    val expectMd5 = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(keptLines.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got(1L) === ((4, 3, true, Some(expectMd5))))
  }

  test("dropped docs carry NULL clean_md5") {
    val got = run(Seq(1L -> s"$goodLine\nnothing else here survives the rules", 2L -> ""))
    assert(!got(1L)._3 && got(1L)._4 === None)
    assert(!got(2L)._3 && got(2L)._4 === None)
  }

  test("plan is a single row-local projection: no Exchange") {
    val df = TextAnalysis.c4LineFilter(
      Seq(1L -> goodLine).toDF("id", "text"), "id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4LineFilter must not shuffle:\n$plan")
  }
}
