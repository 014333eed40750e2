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

  test("media codec: BMP and WAV headers round-trip through a real parse") {
    // construct → parse must recover the exact parameters
    assert(MediaCodec.parseHeader(MediaCodec.bmp(33, 21)).contains((33, 21, 1)))
    assert(MediaCodec.parseHeader(MediaCodec.wav(2, 16000, 347)).contains((2, 16000, 347)))
    // BMP byte length: 54-byte headers + 4-padded 24bpp rows
    assert(MediaCodec.bmp(33, 21).length == 54 + ((33 * 3 + 3) / 4) * 4 * 21)
    assert(MediaCodec.wav(2, 16000, 347).length == 44 + 347 * 2 * 2)
    // non-container bytes fall through to the stub path
    assert(MediaCodec.parseHeader("just some text".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.parseHeader(Array[Byte]()).isEmpty)
  }

  test("decodeHeaderFeatures: parses real containers, stubs the rest") {
    val docs = Seq(
      (3L, "im", "en", "s", 2L),   // 3 % 3 == 0 → image/BMP
      (7L, "au", "en", "s", 2L),   // 7 % 3 == 1 → audio/WAV
      (8L, "video bytes", "en", "s", 11L)) // → opaque, stub
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.decodeHeaderFeatures(
      Multimodal.mediaWithHeaders(spark, docs), 2)
      .collect().map(f => f.media_id -> f).toMap
    val im = feats(3L)
    assert(im.width == (16 + (3 * 13) % 48) && im.height == (16 + (3 * 29) % 32)
      && im.frames == 1)
    val au = feats(7L)
    assert(au.width == 1 + 7 % 2 && au.height == 8000 + (7 % 5) * 2000
      && au.frames == 100 + 7 % 400)
    val vid = feats(8L)
    assert(vid.byte_len == 11 && vid.width == 64 + 11 % 640)
  }

  test("contentFingerprint is whitespace/case insensitive") {
    val df = Seq(("A  Quick\tFox", "a quick fox")).toDF("a", "b")
      .select((TextAnalysis.contentFingerprint(col("a")) ===
        TextAnalysis.contentFingerprint(col("b"))).as("same"))
    assert(df.collect()(0).getBoolean(0))
  }
}
