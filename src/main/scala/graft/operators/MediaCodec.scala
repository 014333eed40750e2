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
    * 40-byte BITMAPINFOHEADER + zeroed pixel array (rows padded to 4). */
  def bmp(width: Int, height: Int): Array[Byte] = {
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
    buf.array()               // remaining pixel bytes stay zero
  }

  /** Minimal PCM WAV: 44-byte RIFF header + zeroed 16-bit samples. */
  def wav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
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
    buf.array()
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

  /** Parse a payload's header if it is a format we really decode:
    *  - BMP → (width, height, 1)
    *  - PNG → (width, height, 1)
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
