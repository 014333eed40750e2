package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
  * Byte-level golden tests for the REAL media transforms (q109/q110 pin
  * the distributed path against DuckDB formula oracles; these pin the
  * kernels themselves on hand-computable fixtures).
  */
class MediaResizeSpec extends AnyFunSuite {

  test("resizeBmp factor 2: dims ceil-divide, pixels are the strided source values") {
    val src = MediaCodec.bmp(5, 4, seed = 9L) // odd width exercises ceil + padding
    val out = MediaCodec.resizeBmp(src, 2).get
    assert(MediaCodec.parseHeader(out).contains((3, 2, 1)))
    // output pixel (nx, ny) channel c == fill formula at (2nx, 2ny):
    // (6nx + c + 14ny + 9) mod 251
    val dstRow = ((3 * 3 + 3) / 4) * 4
    for (ny <- 0 until 2; nx <- 0 until 3; c <- 0 until 3) {
      val got = out(54 + ny * dstRow + nx * 3 + c) & 0xff
      val want = (6 * nx + c + 14 * ny + 9) % 251
      assert(got == want, s"pixel ($nx,$ny,$c): $got != $want")
    }
    // padding bytes are zero
    for (ny <- 0 until 2; p <- 9 until dstRow)
      assert((out(54 + ny * dstRow + p) & 0xff) == 0)
  }

  test("resizeBmp factor 1 is the pixel identity") {
    val src = MediaCodec.bmp(6, 3, seed = 4L)
    val out = MediaCodec.resizeBmp(src, 1).get
    assert(out.toSeq == src.toSeq)
  }

  test("resizeBmp refuses non-BMP payloads") {
    assert(MediaCodec.resizeBmp(MediaCodec.png(8, 8), 2).isEmpty)
    assert(MediaCodec.resizeBmp("not a bitmap at all".getBytes, 2).isEmpty)
  }

  test("bmpPixelSum matches a direct fill-formula sum") {
    val w = 7; val h = 5; val seed = 3L
    val want = (for (y <- 0 until h; i <- 0 until w * 3)
      yield (i + 7L * y + seed) % 251).sum
    assert(MediaCodec.bmpPixelSum(MediaCodec.bmp(w, h, seed)).contains(want))
  }

  test("wavFrameMeans: stride selection, full-frame truncation, exact integral means") {
    // 2 channels, 150 sample-frames, frames of 32 → 4 full frames (tail
    // of 22 dropped); stride 2 keeps frames 0 and 2
    val payload = MediaCodec.wav(2, 8000, 150, seed = 5L)
    val got = MediaCodec.wavFrameMeans(payload, 32, 2).get
    assert(got.map(_._1) == Seq(0, 2))
    assert(got.forall(_._2 == 64))
    val want = Seq(0, 2).map { k =>
      val s = (k * 64 until (k + 1) * 64)
        .map(j => math.abs((j * 37L + 5L) % 2048 - 1024)).sum
      s / 64
    }
    assert(got.map(_._3) == want)
  }

  test("wavFrameMeans refuses non-WAV payloads") {
    assert(MediaCodec.wavFrameMeans(MediaCodec.bmp(4, 4), 32, 2).isEmpty)
  }

  test("chunkBytes manifest covers every payload byte exactly once, md5s verify") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val payloads = Seq(
      (1L, Array.tabulate[Byte](250)(_.toByte)),   // 3 chunks, short tail
      (2L, Array.tabulate[Byte](100)(i => (i * 7).toByte)), // exactly one chunk
      (3L, Array[Byte](42)))                        // single byte
    val media = payloads.map { case (id, p) =>
      Multimodal.MediaRow(id, p, "video", "s")
    }.toDS()
    val chunks = Multimodal.chunkBytes(media, 100, 2)
      .collect().groupBy(_.media_id)
    for ((id, p) <- payloads) {
      val cs = chunks(id).sortBy(_.chunk_idx)
      // contiguous, complete, non-overlapping cover
      assert(cs.head.off == 0 && cs.map(_.len).sum == p.length)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b.off == a.off + a.len); case _ =>
      }
      // every chunk md5 verifies against the original bytes
      val md = java.security.MessageDigest.getInstance("MD5")
      cs.foreach { c =>
        md.reset(); md.update(p, c.off, c.len)
        assert(md.digest().map(x => f"$x%02x").mkString == c.chunk_md5)
      }
    }
  }
}
