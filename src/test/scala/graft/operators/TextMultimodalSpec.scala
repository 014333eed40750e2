package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextMultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace and regex tokenizers") {
    val df = Seq("one two three", "a-b c9 d!").toDF("text")
      .select(TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.regexTokenCount(col("text")).as("rx"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 3)
    // "a-b c9 d!" → a, -, b, c, 9, d, ! = 7 regex tokens; 3 ws tokens
    assert(rows(1).getInt(0) == 3 && rows(1).getInt(1) == 7)
  }

  test("langFromScores picks the dominant language, und when empty") {
    val df = Seq(
      "the cat and the dog is a pet of the house",
      "der hund und die katze ist nicht das problem",
      "le chat et les chiens est la vie des gens",
      "xyzzy plugh")
      .toDF("text")
    val out = TextAnalysis.langPredicted(df, "text", Seq("text"))
      .select("predicted").collect().map(_.getString(0))
    assert(out.sameElements(Array("en", "de", "fr", "und")))
  }

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val df = Seq(
      "a normal readable document with sensible words and length" * 8,
      "!!! ### $$$ %%% ^^^ &&& *** ((( )))")
      .toDF("text")
      .select(col("text"), TextAnalysis.punctRatio(col("text")).as("pr"),
        TextAnalysis.meanWordLen(col("text")).as("mwl"))
      .select(TextAnalysis.qualityScore(length(col("text")), col("pr"), col("mwl")).as("q"))
    val Array(good, bad) = df.collect().map(_.getDouble(0))
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
  }

  test("multimodal decode: batched stub decode derives features from bytes") {
    val docs = Seq((7L, "hello world", "en", "srcX", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.decodeFeatures(media, 2).collect()
    assert(feats.length == 1)
    val f = feats(0)
    assert(f.byte_len == 11)
    assert(f.width == 64 + 11 % 640 && f.height == 64 + (11 * 7) % 480)
    assert(f.kind == "audio") // 7 % 3 == 1
  }

  test("contentFingerprint is whitespace/case insensitive") {
    val df = Seq(("A  Quick\tFox", "a quick fox")).toDF("a", "b")
      .select((TextAnalysis.contentFingerprint(col("a")) ===
        TextAnalysis.contentFingerprint(col("b"))).as("same"))
    assert(df.collect()(0).getBoolean(0))
  }
}
