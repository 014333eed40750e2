package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Perceptual image hashing (MediaCodec.bmpAHash) + 64-bit Hamming
  * banding (Dedup.hammingPairs64): kernel-level pins and the
  * banding-completeness property the q121b oracle relies on. */
class ImageHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.Tables.load

  test("aHash matches an independent brute-force computation from the fill formula") {
    val (w, h, seed) = (20, 17, 42L)
    val Some((pw, ph, hi, lo, nb)) = MediaCodec.bmpAHash(MediaCodec.bmp(w, h, seed))
    assert(pw == w && ph == h)
    assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    assert(nb == java.lang.Long.bitCount(hi) + java.lang.Long.bitCount(lo))
    // reference computation straight from the documented pattern
    // pixel(x,y,c) = (3x + c + 7y + seed) mod 251, skipping the payload
    val cs = new Array[Long](64)
    val cn = new Array[Long](64)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * 8 / h) * 8 + x * 8 / w
      cs(k) += (0 until 3).map(c => (3L * x + c + 7L * y + seed) % 251).sum
      cn(k) += 1
    }
    val total = cs.sum
    var (ehi, elo) = (0L, 0L)
    for (k <- 0 until 64 if cs(k) * w * h > total * cn(k))
      if (k < 32) elo |= 1L << k else ehi |= 1L << (k - 32)
    assert((hi, lo) == (ehi, elo))
  }

  test("non-BMP payloads hash to None") {
    assert(MediaCodec.bmpAHash("not a bitmap".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.bmpAHash(MediaCodec.png(20, 17)).isEmpty)
    assert(MediaCodec.bmpAHash(MediaCodec.wav(1, 8000, 100)).isEmpty)
  }

  test("banding equals naive all-pairs at several maxDist, incl. straddling bands") {
    val docs = load(spark, TestSpark.sfDir, "documents")
    val hashes = Multimodal
      .imageAHashes(Multimodal.mediaWithHeaders(spark, docs), 8).toDF()
      .persist()
    try {
      val naive = hashes.as("a").join(hashes.as("b"),
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          (bit_count(col("a.hash_hi").bitwiseXOR(col("b.hash_hi"))) +
            bit_count(col("a.hash_lo").bitwiseXOR(col("b.hash_lo"))))
            .cast("int").as("hamming"))
      // 3 → 16-bit bands on clean boundaries; 4 → a band straddles bit 32;
      // 6 → 9-bit bands, two straddle-adjacent layouts
      for (d <- Seq(3, 4, 6)) {
        val banded = Dedup.hammingPairs64(hashes, "media_id", "hash_hi", "hash_lo", d)
        val expected = naive.filter(col("hamming") <= d)
        assert(banded.exceptAll(expected).isEmpty &&
          expected.exceptAll(banded).isEmpty, s"maxDist=$d diverged")
      }
    } finally hashes.unpersist()
  }

  test("q121b plan: equi join on band bits, no cartesian candidate generation") {
    val p = graft.SparkEntry.queries("q121b_image_neardup")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }
}
