package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Real (pure-JVM) binary construction and header parsing for the two
 * media container formats that need no codec library: BMP
 * (BITMAPINFOHEADER) and WAV (RIFF/PCM). This is what upgrades the
 * multimodal pipeline from "deterministic fake decode" to a genuine
 * parse: q71 CONSTRUCTS valid files in executors from per-row parameters
 * and the decode stage re-derives those parameters by actually reading
 * the headers — any parsing bug breaks the oracle match. Codec-bound
 * formats (JPEG/H.264/...) remain behind the documented stub
 * (Multimodal.decodeStub); the dispatch is by magic bytes.
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

  /** Parse a payload's header if it is a format we really decode:
    *  - BMP → (width, height, 1)
    *  - WAV → (channels, sampleRate, nSamples)
    * None for anything else (caller falls back to the documented stub). */
  def parseHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload.length >= 26 && payload(0) == 'B' && payload(1) == 'M') {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      Some((buf.getInt(18), buf.getInt(22), 1))
    } else if (payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val channels = buf.getShort(22).toInt
      val rate = buf.getInt(24)
      val dataSize = buf.getInt(40)
      val bytesPerFrame = math.max(channels * (buf.getShort(34) / 8), 1)
      Some((channels, rate, dataSize / bytesPerFrame))
    } else None
  }
}
