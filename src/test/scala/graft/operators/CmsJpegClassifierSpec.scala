package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the round-8 part-4 additions: Count-Min heavy hitters
  * (one-sided error, mergeable counter grid), the real JPEG marker-walk
  * parser (variable SOF offset, SOF-vs-DHT discrimination, truncation
  * safety), and the hashing-trick linear classifier (exact integer
  * margins, no-lookup application). */
class CmsJpegClassifierSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- Count-Min sketch ----

  test("cmsHeavyHitters: estimates are one-sided (est >= exact) and top-1 is right") {
    // 300 'hot' + 50 'warm' + 200 distinct cold tokens
    val toks = (Seq.fill(300)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 200).map(i => s"cold$i")).toDF("tok")
    val got = Sketches.cmsHeavyHitters(toks, col("tok"), 4, 512, 10)
      .orderBy("rank").collect()
    assert(got.length == 10)
    val top = got.head
    assert(top.getAs[String]("tok") == "hot")
    assert(top.getAs[Long]("n_exact") == 300L)
    // CMS never underestimates: min over rows >= true count, for EVERY row
    got.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("n_exact"),
        s"CMS underestimated ${r.getAs[String]("tok")}")
    }
    // with 550 occurrences over 512 cells x 4 rows, the hot estimate
    // should be close: bounded by exact + total stream size slack
    assert(top.getAs[Long]("cms_estimate") <= 300L + 550L)
  }

  test("cms sketch is mergeable: counters over halves sum to the full build") {
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), md5(col("tok")).as("hx"))
      .select(posexplode(array((0 until 4).map(j =>
        TextAnalysis.hexParse(col("hx"), 1 + 8 * j, 8) % 512): _*)).as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("c"))
    val a = (1 to 80).map(i => s"w${i % 13}").toDF("tok")
    val b = (81 to 200).map(i => s"w${i % 17}").toDF("tok")
    val full = cells(a.union(b)).withColumnRenamed("c", "c_full")
    val merged = cells(a).withColumnRenamed("c", "ca")
      .join(cells(b).withColumnRenamed("c", "cb"), Seq("j", "cell"), "full")
      .select(col("j"), col("cell"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("c_m"))
    val diff = full.join(merged, Seq("j", "cell"), "full")
      .filter(coalesce(col("c_full"), lit(0L)) =!= coalesce(col("c_m"), lit(0L)))
    assert(diff.count() == 0, "half-built counters must sum to the full build")
  }

  // ---- JPEG ----

  test("jpeg roundtrip: built payload parses back to its own dimensions") {
    for ((w, h, c) <- Seq((16, 16, 0), (63, 47, 1), (640, 480, 22), (1, 1, 9))) {
      val p = MediaCodec.jpeg(w, h, c)
      assert(p.length == 122 + c + 16 + (w * h) % 64)
      assert(MediaCodec.parseJpegDims(p) == Some((w, h, 1)), s"dims $w x $h c=$c")
      assert(MediaCodec.parseHeader(p) == Some((w, h, 1)))
    }
  }

  test("jpeg SOF offset really varies with the comment length") {
    def sofOffset(p: Array[Byte]): Int =
      p.indices.dropRight(1).find(i =>
        (p(i) & 0xFF) == 0xFF && (p(i + 1) & 0xFF) == 0xC0).get
    val o1 = sofOffset(MediaCodec.jpeg(20, 20, 0))
    val o2 = sofOffset(MediaCodec.jpeg(20, 20, 15))
    assert(o2 == o1 + 15, "COM length must move the SOF marker")
  }

  test("jpeg parser discriminates SOF from DHT/JPG/DAC markers") {
    // hand-built stream: SOI, a DHT segment FIRST (C4 — same high nibble
    // as SOF but NOT a frame header), then SOF0, then EOI. A parser that
    // treats any 0xCx as SOF reads the DHT payload as dimensions.
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xFF).toByte) ++ body
    val dhtBody = Array[Byte](0) ++ Array.fill[Byte](16)(0) // class + empty counts
    val sofBody = Array[Byte](8, 0, 33, 0, 44, 1, 1, 0x11, 0) // h=33 w=44
    val stream = Array(0xFF.toByte, 0xD8.toByte) ++
      seg(0xC4, dhtBody) ++ seg(0xC0, sofBody) ++
      Array(0xFF.toByte, 0xD9.toByte)
    assert(MediaCodec.parseJpegDims(stream) == Some((44, 33, 1)))
  }

  test("jpeg parser is safe on garbage, truncation, and SOF-less streams") {
    assert(MediaCodec.parseJpegDims("not a jpeg".getBytes("UTF-8")).isEmpty)
    val good = MediaCodec.jpeg(32, 24, 5)
    assert(MediaCodec.parseJpegDims(good.take(10)).isEmpty)      // truncated mid-segment
    assert(MediaCodec.parseJpegDims(good.take(2)).isEmpty)       // bare SOI
    // SOI + COM + EOI only: reaches EOI without a frame header
    val noSof = Array(0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xFE.toByte, 0.toByte, 3.toByte, 'x'.toByte,
      0xFF.toByte, 0xD9.toByte)
    assert(MediaCodec.parseJpegDims(noSof).isEmpty)
    // declared segment length running past the buffer
    val overrun = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xFE.toByte,
      0x7F.toByte, 0xFF.toByte)
    assert(MediaCodec.parseJpegDims(overrun).isEmpty)
  }

  test("mediaJpeg rows decode through the generic header path") {
    val docs = Seq((0L, "alpha", "web"), (3L, "beta", "web"), (6L, "gamma", "books"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.mediaJpeg(spark, docs).filter(col("kind") === "image")
    val got = Multimodal.decodeHeaderFeatures(media, 2).toDF()
      .orderBy("media_id").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (16 + (id * 13) % 48).toInt
      val h = (16 + (id * 29) % 32).toInt
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("byte_len") == 122 + (id % 23).toInt + 16 + (w * h) % 64)
    }
  }

  // ---- Hashing-trick linear classifier ----

  test("hashedLinearScore: margin equals the sum of per-token hash weights") {
    val df = Seq((1L, "a b a"), (2L, "zzz"), (3L, "")).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.hashedLinearScore(col("text")).as("score"))
      .orderBy("id").collect()
    // reference weights computed independently from md5
    def w(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(12), 16) % 17) - 8
    }
    assert(got(0).getLong(1) == 2 * w("a") + w("b")) // bag semantics: 'a' counts twice
    assert(got(1).getLong(1) == w("zzz"))
    assert(got(2).getLong(1) == w(""))               // split("") -> [""], like the oracle
  }

  test("classifier margins stay in the +/-8*n_tokens envelope (hash-bounded weights)") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
      .limit(200)
    val bad = docs.select(col("doc_id"),
        TextAnalysis.hashedLinearScore(col("text")).as("s"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("n"))
      .filter(abs(col("s")) > col("n") * 8)
    assert(bad.count() == 0)
  }
}
