package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Real (pure-JVM) binary construction and header parsing for the three
 * media container formats that need no codec library: BMP
 * (BITMAPINFOHEADER), PNG (signature + IHDR big-endian parse), and WAV
 * (RIFF/PCM). This is what upgrades the multimodal pipeline from
 * "deterministic fake decode" to a genuine parse: q71 CONSTRUCTS valid
 * files in executors from per-row parameters and the decode stage
 * re-derives those parameters by actually reading the headers — any
 * parsing bug (endianness, offset, padding) breaks the oracle match.
 * Codec-bound formats (JPEG/H.264/...) remain behind the documented stub
 * (Multimodal.decodeStub). parseHeader validates the FULL fixed header
 * (signature + structure fields + sane dimensions), never just the first
 * magic bytes: an opaque text payload that happens to start with "BM" or
 * "RIFF" must fall through to the stub, not be misparsed as a container.
 */
object MediaCodec {

  /** Minimal well-formed 24bpp BMP: 14-byte file header +
    * 40-byte BITMAPINFOHEADER + pixel array (rows padded to 4). Pixels
    * are a deterministic pattern of the unpadded byte index i (= x·3+c),
    * storage row y, and `seed`: (i + 7y + seed) mod 251 — simple enough
    * that the q109 resize oracle recomputes the expected DOWNSAMPLED
    * pixel sum in SQL from (doc_id, w, h) alone, so a byte-offset /
    * padding / stride bug in either the writer or the resizer breaks the
    * hash. seed=0 keeps the historical zero-seed layout (byte lengths
    * and headers are unchanged from the zero-filled original). */
  def bmp(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel-array offset
    buf.putInt(40)            // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)
    buf.putShort(1)           // planes
    buf.putShort(24)          // bpp
    buf.putInt(0)             // BI_RGB
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)   // palette
    val a = buf.array()
    var y = 0
    while (y < height) {
      var i = 0
      while (i < width * 3) {
        a(54 + y * rowSize + i) = ((i + 7L * y + seed) % 251).toByte
        i += 1
      }
      y += 1 // padding bytes stay zero
    }
    a
  }

  /** Minimal PCM WAV: 44-byte RIFF header + 16-bit samples filled with
    * the deterministic pattern v(j) = ((j·37 + seed) mod 2048) − 1024
    * over the global interleaved slot index j — the q110 frame-sampling
    * oracle recomputes per-frame mean |v| from (doc_id, channels,
    * nSamples) alone, pinning the reader's byte offsets and endianness. */
  def wav(channels: Int, sampleRate: Int, nSamples: Int,
          seed: Long = 0L): Array[Byte] = {
    val dataSize = nSamples * channels * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                         // PCM fmt chunk size
    buf.putShort(1)                        // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)  // byte rate
    buf.putShort((channels * 2).toShort)   // block align
    buf.putShort(16)                       // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var j = 0
    while (j < nSamples * channels) {
      buf.putShort((((j * 37L + seed) % 2048) - 1024).toShort)
      j += 1
    }
    buf.array()
  }

  /** Nearest-neighbor integer-factor downsample of a 24bpp BMP payload:
    * output pixel (nx, ny) = input pixel (nx·f, ny·f) in STORAGE row
    * order, new dims = ceil(dim/f), emitted as a fresh well-formed BMP
    * (the seed-0 header with the sampled pixel array — the output
    * re-parses under parseHeader, which q109 does). None if the payload
    * is not a BMP this module wrote (same full-header validation as
    * parseHeader). Row padding is recomputed for the new width. */
  def resizeBmp(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, "resize factor must be >= 1")
    parseHeader(payload) match {
      case Some((w, h, _)) if payload.length >= 54 &&
          payload(0) == 'B'.toByte && payload(1) == 'M'.toByte =>
        val srcRow = ((w * 3 + 3) / 4) * 4
        val nw = (w + factor - 1) / factor
        val nh = (h + factor - 1) / factor
        val out = bmp(nw, nh) // header + pattern, pixels overwritten below
        val dstRow = ((nw * 3 + 3) / 4) * 4
        var ny = 0
        while (ny < nh) {
          var nx = 0
          while (nx < nw) {
            var c = 0
            while (c < 3) {
              out(54 + ny * dstRow + nx * 3 + c) =
                payload(54 + (ny * factor) * srcRow + (nx * factor) * 3 + c)
              c += 1
            }
            nx += 1
          }
          // zero the padding the bmp() pattern may have left non-zero
          var p = nw * 3
          while (p < dstRow) { out(54 + ny * dstRow + p) = 0; p += 1 }
          ny += 1
        }
        Some(out)
      case _ => None
    }
  }

  /** Sum of the pixel bytes of a BMP payload (padding excluded, bytes
    * unsigned) — the roundtrip evidence column of q109: computed from
    * the RESIZED bytes, matched against the oracle's formula-recomputed
    * expectation. */
  def bmpPixelSum(payload: Array[Byte]): Option[Long] =
    parseHeader(payload).collect {
      case (w, h, _) if payload(0) == 'B'.toByte =>
        val rowSize = ((w * 3 + 3) / 4) * 4
        var s = 0L
        var y = 0
        while (y < h) {
          var i = 0
          while (i < w * 3) {
            s += payload(54 + y * rowSize + i) & 0xff
            i += 1
          }
          y += 1
        }
        s
    }

  /** Perceptual average-hash (aHash) of a 24bpp BMP payload — the
    * classic 64-bit fingerprint (downsample to an 8×8 grid, one bit per
    * cell: is the cell brighter than the image mean?), in an
    * ALL-INTEGER formulation so the oracle replays it exactly:
    *
    *  - gray(x, y)   = Σ_c pixelByte(x, y, c)   (no luma weights — an
    *    integer sum, not a float dot)
    *  - cell of (x, y) = (x·grid div w, y·grid div h) — floor mapping,
    *    exact for dims not divisible by `grid`
    *  - bit_k = cellSum_k · nPixels > totalSum · cellCount_k  — the
    *    "cell mean > image mean" compare cross-multiplied so no
    *    division ever happens
    *
    * The hash is returned as two non-negative 32-bit halves (hi = bits
    * 32..63) — a single signed 64-bit value would go negative at bit 63
    * and HUGEINT/BIGINT behavior diverges across engines. Returns
    * (w, h, hashHi, hashLo, nBitsSet); None for non-BMP payloads. */
  def bmpAHash(payload: Array[Byte], grid: Int = 8)
    : Option[(Int, Int, Long, Long, Int)] = {
    require(grid >= 2 && grid * grid <= 64, "grid² must fit 64 bits")
    parseHeader(payload).collect {
      case (w, h, _) if payload(0) == 'B'.toByte && w >= grid && h >= grid =>
        val rowSize = ((w * 3 + 3) / 4) * 4
        val cellSum = new Array[Long](grid * grid)
        val cellN = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val by = y * grid / h
          var x = 0
          while (x < w) {
            val k = by * grid + x * grid / w
            var g = 0L
            var c = 0
            while (c < 3) { g += payload(54 + y * rowSize + x * 3 + c) & 0xff; c += 1 }
            cellSum(k) += g
            cellN(k) += 1
            x += 1
          }
          y += 1
        }
        val total = cellSum.sum
        val n = w.toLong * h
        var hi = 0L
        var lo = 0L
        var nBits = 0
        var k = 0
        while (k < grid * grid) {
          if (cellSum(k) * n > total * cellN(k)) {
            nBits += 1
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        (w, h, hi, lo, nBits)
    }
  }

  /** Frame sampling over a PCM WAV payload: consecutive frames of
    * `frameSamples` sample-frames (all channels interleaved), every
    * `stride`-th frame kept, trailing partial frame dropped. Per kept
    * frame: (frameIdx, nSlots, mean |sample|) with an integral-division
    * mean — exact cross-engine arithmetic, genuinely decoded from the
    * little-endian 16-bit data chunk. None for non-WAV payloads. */
  def wavFrameMeans(payload: Array[Byte], frameSamples: Int, stride: Int)
    : Option[Seq[(Int, Int, Long)]] = {
    require(frameSamples >= 1 && stride >= 1)
    def tag(off: Int, s: String): Boolean =
      payload.length >= off + s.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i))
    if (!(payload.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && tag(36, "data"))) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val channels = buf.getShort(22).toInt
    if (channels <= 0) return None
    val dataSize = buf.getInt(40)
    val nFrames = (dataSize / (channels * 2)) / frameSamples
    val slotsPerFrame = frameSamples * channels
    Some((0 until nFrames by stride).map { k =>
      var s = 0L
      var j = 0
      while (j < slotsPerFrame) {
        s += math.abs(buf.getShort(44 + (k * slotsPerFrame + j) * 2).toLong)
        j += 1
      }
      (k, slotsPerFrame, s / slotsPerFrame)
    })
  }

  /** PNG signature: \x89 P N G \r \n \x1a \n. */
  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Minimal well-formed PNG: 8-byte signature + IHDR (8-bit grayscale,
    * no interlace) + one zeroed IDAT chunk of width*height bytes (a
    * layout placeholder, not valid zlib — header parsing never inflates)
    * + IEND. Chunk lengths/fields are big-endian and chunk CRCs are real
    * CRC-32 over type+data, per the PNG spec. Total bytes: 57 + w*h
    * (8 sig + 25 IHDR + 12+w*h IDAT + 12 IEND). */
  def png(width: Int, height: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val buf = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      buf.putInt(crc.getValue.toInt)
      buf.array()
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)                             // bit depth
      .put(0.toByte)                             // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    PngSig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", new Array[Byte](width * height)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Minimal well-formed baseline JPEG (ITU-T T.81): SOI, a COM segment
    * of `commentLen` bytes (variable — it MOVES the SOF, so parsing by
    * fixed offset is impossible by construction), DQT (65-byte table),
    * SOF0 with big-endian height/width, a 1-symbol DHT, SOS, `16 +
    * (w*h) % 64` entropy bytes (values mod 255 — never a 0xFF that
    * could fake a marker), EOI. Total bytes: 122 + commentLen + nData. */
  def jpeg(width: Int, height: Int, commentLen: Int = 0): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      "jpeg: dims must fit unsigned 16-bit")
    require(commentLen >= 0 && commentLen <= 0xFFFD, "jpeg: bad comment length")
    val nData = 16 + (width * height) % 64
    val out = ByteBuffer.allocate(122 + commentLen + nData).order(ByteOrder.BIG_ENDIAN)
    def marker(m: Int): Unit = { out.put(0xFF.toByte); out.put(m.toByte) }
    marker(0xD8)                                        // SOI
    marker(0xFE); out.putShort((2 + commentLen).toShort) // COM
    (0 until commentLen).foreach(i => out.put(((i * 31 + 7) % 127).toByte))
    marker(0xDB); out.putShort(67); out.put(0.toByte)   // DQT, table 0
    (0 until 64).foreach(i => out.put((1 + (i * 3) % 255).toByte))
    marker(0xC0); out.putShort(11)                      // SOF0
    out.put(8.toByte)                                   // precision
    out.putShort(height.toShort); out.putShort(width.toShort)
    out.put(1.toByte)                                   // 1 component
    out.put(1.toByte); out.put(0x11.toByte); out.put(0.toByte)
    marker(0xC4); out.putShort(20); out.put(0.toByte)   // DHT: one 1-bit code
    out.put(1.toByte); (1 until 16).foreach(_ => out.put(0.toByte))
    out.put(0.toByte)                                   // the symbol
    marker(0xDA); out.putShort(8)                       // SOS
    out.put(1.toByte); out.put(1.toByte); out.put(0.toByte)
    out.put(0.toByte); out.put(0x3F.toByte); out.put(0.toByte)
    (0 until nData).foreach(i => out.put(((i * 31 + 7) % 255).toByte))
    marker(0xD9)                                        // EOI
    out.array()
  }

  /** Real JPEG dimension parse: walk the marker stream from SOI, skipping
    * each variable-length segment by its OWN length field, until a SOF
    * marker (C0–CF minus DHT C4 / JPG C8 / DAC CC) yields big-endian
    * height/width — the walk every real JPEG reader does, since nothing
    * in the format sits at a fixed offset past SOI. None for truncated
    * streams, non-FF garbage between segments, out-of-range lengths, or
    * streams that reach SOS/EOI without a frame header. */
  def parseJpegDims(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (payload.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var pos = 2
    while (pos + 4 <= payload.length) {
      if (u8(pos) != 0xFF) return None
      val m = u8(pos + 1)
      if (m == 0xD9 || m == 0xDA) return None // SOS/EOI before any SOF
      val segLen = u16(pos + 2)
      if (segLen < 2 || pos + 2 + segLen > payload.length) return None
      val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
      if (isSof) {
        if (segLen < 9) return None
        val h = u16(pos + 5); val w = u16(pos + 7)
        return if (w > 0 && h > 0) Some((w, h, 1)) else None
      }
      pos += 2 + segLen
    }
    None
  }

  /** Parse a payload's header if it is a format we really decode:
    *  - BMP → (width, height, 1)
    *  - PNG → (width, height, 1)
    *  - JPEG → (width, height, 1) via the real marker walk (parseJpegDims)
    *  - WAV → (channels, sampleRate, nSamples)
    * None for anything else (caller falls back to the documented stub).
    * Each branch validates the full fixed header, not just the leading
    * magic: BMP requires the complete 54-byte header, the
    * BITMAPINFOHEADER size field == 40 and positive dimensions; WAV
    * requires RIFF/WAVE plus the "fmt " and "data" chunk tags at their
    * canonical offsets; PNG requires the full 8-byte signature and the
    * IHDR tag. Text that merely starts with "BM"/"RIFF" stays opaque. */
  def parseHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    def tag(off: Int, s: String): Boolean =
      payload.length >= off + s.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i))
    if (payload.length >= 54 && tag(0, "BM")) {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val w = buf.getInt(18); val h = buf.getInt(22)
      if (buf.getInt(14) == 40 && w > 0 && h > 0) Some((w, h, 1)) else None
    } else if (payload.length >= 33 &&
        PngSig.indices.forall(i => payload(i) == PngSig(i)) && tag(12, "IHDR")) {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      val w = buf.getInt(16); val h = buf.getInt(20)
      if (w > 0 && h > 0) Some((w, h, 1)) else None
    } else if (payload.length >= 4 && (payload(0) & 0xFF) == 0xFF &&
        (payload(1) & 0xFF) == 0xD8) {
      parseJpegDims(payload)
    } else if (payload.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && tag(36, "data")) {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val channels = buf.getShort(22).toInt
      val rate = buf.getInt(24)
      val dataSize = buf.getInt(40)
      val bytesPerFrame = math.max(channels * (buf.getShort(34) / 8), 1)
      if (channels > 0 && rate > 0) Some((channels, rate, dataSize / bytesPerFrame))
      else None
    } else None
  }
}
