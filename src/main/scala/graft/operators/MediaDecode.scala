package graft.operators

/** Real pure-JVM media decoders for the two header-parseable formats
  * (VERDICT_r04 item 8): BMP images and RIFF/WAVE audio. These replace
  * the fake decode inside [[Multimodal.decodeStub]] whenever the blob
  * bytes actually ARE one of these formats, so (width, height,
  * channels) come from real bytes; anything else still falls back to
  * the deterministic fake (the container has no jpeg/png/opus codecs —
  * that remains the documented stub boundary).
  *
  * Both parsers are STRICT: every header field is bounds-checked
  * against the byte array (file-size field must match, dimensions and
  * bit depths must be sane) so arbitrary text that happens to start
  * with "BM"/"RIFF" cannot half-parse — which is what keeps
  * MultimodalSpec's stub≡declarative-twin agreement intact for
  * document-derived blobs.
  *
  * Formats are public specifications: BMP = BITMAPFILEHEADER (14 B) +
  * BITMAPINFOHEADER (≥40 B), little-endian; WAV = RIFF container with
  * `fmt ` (PCM geometry) and `data` chunks.
  */
object MediaDecode {

  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** BMP header → (width, height, channels). None unless the bytes are
    * a structurally valid BMP (magic, exact file-size field, plausible
    * geometry and bit depth, data offset inside the file).
    */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val fileSize = le32(b, 2)
    val dataOffset = le32(b, 10)
    val hdrSize = le32(b, 14)
    val width = le32(b, 18)
    val height = le32(b, 22) // negative = top-down row order
    val planes = le16(b, 26)
    val bitCount = le16(b, 28)
    // Long arithmetic for the offset inequality: an adversarial hdrSize
    // near Int.MaxValue would wrap `14 + hdrSize` negative and let a
    // structurally invalid header pass the strict-validation contract.
    val ok = fileSize == b.length && hdrSize >= 40 && hdrSize <= b.length &&
      planes == 1 &&
      width > 0 && width <= (1 << 20) &&
      height != 0 && math.abs(height) <= (1 << 20) &&
      (bitCount == 1 || bitCount == 8 || bitCount == 24 || bitCount == 32) &&
      dataOffset.toLong >= 14L + hdrSize.toLong && dataOffset <= b.length
    if (ok) Some((width, math.abs(height), math.max(1, bitCount / 8)))
    else None
  }

  /** WAV metadata for one RIFF/WAVE blob. `frames` = samples per
    * channel (data bytes / block align). */
  final case class WavMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, frames: Long) {
    def durationMs: Long =
      if (sampleRate > 0) frames * 1000L / sampleRate else 0L
  }

  /** RIFF/WAVE chunk walk → WavMeta. None unless magic, a sane PCM
    * `fmt ` chunk and a `data` chunk are all present.
    */
  def decodeWav(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 44 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (size < 0 || size > b.length.toLong - i - 8) {
        // truncated/corrupt chunk: reject rather than half-parse
        return None
      }
      if (id == "fmt " && size >= 16) {
        fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12),
          le16(b, i + 22)))
      } else if (id == "data") {
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    fmt match {
      // audioFormat must be 1 (WAVE_FORMAT_PCM): the frames math below is
      // PCM block-align math and is meaningless for float/ADPCM payloads.
      case Some((format, ch, rate, bits))
          if format == 1 && ch > 0 && ch <= 64 && rate > 0 &&
            rate <= 1000000 && bits > 0 && bits % 8 == 0 && dataLen >= 0 =>
        Some(WavMeta(rate, ch, bits, dataLen / (ch.toLong * (bits / 8))))
      case _ => None
    }
  }

  /** Minimal valid-BMP writer (24-bit, bottom-up, row-padded) — the
    * fixture/generation half of [[decodeBmp]], used by specs and any
    * pipeline stage that needs a real image payload in tests.
    */
  def encodeBmp24(width: Int, height: Int,
      pixel: (Int, Int) => (Byte, Byte, Byte)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      w16(i, v & 0xffff); w16(i + 2, (v >> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, fileSize); w32(10, 54); w32(14, 40)
    w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24)
    w32(34, dataSize)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (bB, gB, rB) = pixel(x, y)
        val o = 54 + (height - 1 - y) * rowBytes + x * 3
        out(o) = bB; out(o + 1) = gB; out(o + 2) = rB
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal valid-WAV writer (PCM, silence) — fixture half of
    * [[decodeWav]]. */
  def encodeWavPcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
      frames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && bitsPerSample % 8 == 0)
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = frames * blockAlign
    val out = new Array[Byte](44 + dataSize)
    def ascii(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, i)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      w16(i, v & 0xffff); w16(i + 2, (v >> 16) & 0xffff)
    }
    ascii(0, "RIFF"); w32(4, 36 + dataSize); ascii(8, "WAVE")
    ascii(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, channels); w32(24, sampleRate)
    w32(28, sampleRate * blockAlign)
    w16(32, blockAlign); w16(34, bitsPerSample)
    ascii(36, "data"); w32(40, dataSize)
    out
  }
}
