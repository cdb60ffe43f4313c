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

  @inline private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** PNG signature (public spec, RFC 2083 §3.1). */
  private val PngSig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG header → (width, height, channels) from the IHDR chunk
    * (VERDICT_r08 item 3) — pure byte math like the BMP path: 8-byte
    * signature, then the IHDR chunk which MUST come first (length 13,
    * big-endian dims, bit depth, color type). STRICT: signature,
    * chunk length/type, plausible geometry, a legal (bit depth, color
    * type) pair per the spec's table, AND the IHDR CRC32 (the JDK has
    * the reference CRC — free strictness the BMP format cannot offer),
    * so arbitrary bytes starting with the signature cannot half-parse.
    * Channels from color type: gray 1, gray+alpha 2, truecolor 3,
    * truecolor+alpha 4, palette 1 (indexed — the stored sample count).
    */
  def decodePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
    if (be32(b, 8) != 13) return None // IHDR length
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13) // type + data
    if (crc.getValue != (be32(b, 29).toLong & 0xffffffffL)) return None
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
      case 3 => Set(1, 2, 4, 8)(bitDepth)
      case 2 | 4 | 6 => Set(8, 16)(bitDepth)
      case _ => false
    }
    val ok = depthOk && width > 0 && width <= (1 << 24) &&
      height > 0 && height <= (1 << 24)
    if (!ok) None
    else Some((width, height, colorType match {
      case 0 | 3 => 1
      case 4 => 2
      case 2 => 3
      case 6 => 4
    }))
  }

  /** JPEG header → (width, height, channels) from the first SOF
    * segment (VERDICT_r08 item 3): walk the marker-segment chain from
    * SOI — each segment is 0xFF marker + big-endian length including
    * itself — until a start-of-frame marker (SOF0-15 except the
    * DHT/DAC/RST family C4/C8/CC), whose payload is precision(1),
    * height(2), width(2), components(1). STRICT: SOI required at 0,
    * every segment bounds-checked (a truncated chain rejects rather
    * than half-parses), fill bytes (padding FFs) tolerated per spec,
    * standalone markers (RSTn/TEM) skipped, and the component count
    * must match the payload length (8 + 3·n). Height 0 (deferred via
    * DNL) is rejected — a metadata pipeline needs real dims. */
  def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // segment must start at a marker
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
          marker == 0x01) {
        i = j + 1 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF: no frame header
      } else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2 || j + 1 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return None
          val height = be16(b, j + 4)
          val width = be16(b, j + 6)
          val comps = b(j + 8) & 0xff
          val ok = width > 0 && height > 0 &&
            (comps == 1 || comps == 3 || comps == 4) &&
            len == 8 + 3 * comps
          return if (ok) Some((width, height, comps)) else None
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** Minimal valid-PNG writer (8-bit truecolor, one IDAT, real zlib via
    * the JDK Deflater + real CRC32s) — the fixture half of
    * [[decodePng]]: what it emits is a fully spec-conformant PNG any
    * viewer opens, so the golden-file decode test exercises the exact
    * byte layout of real corpus images. */
  def encodePng(width: Int, height: Int,
      pixel: (Int, Int) => (Byte, Byte, Byte)): Array[Byte] = {
    require(width > 0 && height > 0)
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val row = y * (1 + width * 3) // leading filter byte 0 per row
      var x = 0
      while (x < width) {
        val (r, g, bb) = pixel(x, y)
        val o = row + 1 + x * 3
        raw(o) = r; raw(o + 1) = g; raw(o + 2) = bb
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val typeAndData = typ.getBytes("US-ASCII") ++ data
      typeAndData.foreach(x => out.write(x & 0xff))
      val crc = new java.util.zip.CRC32
      crc.update(typeAndData)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def put32(i: Int, v: Int): Unit = {
      ihdr(i) = ((v >> 24) & 0xff).toByte; ihdr(i + 1) = ((v >> 16) & 0xff).toByte
      ihdr(i + 2) = ((v >> 8) & 0xff).toByte; ihdr(i + 3) = (v & 0xff).toByte
    }
    put32(0, width); put32(4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** Minimal structurally-valid JPEG header writer (SOI + APP0/JFIF +
    * SOF0 + EOI — no entropy-coded payload: [[decodeJpeg]] is a header
    * parser and this is its fixture). */
  def encodeJpegHeader(width: Int, height: Int, channels: Int): Array[Byte] = {
    require(width > 0 && width < 65536 && height > 0 && height < 65536)
    require(channels == 1 || channels == 3 || channels == 4)
    val out = new java.io.ByteArrayOutputStream()
    def w(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    w(0xff, 0xd8) // SOI
    // APP0/JFIF v1.1, 72dpi, no thumbnail
    w(0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x01, 0x01, 0x00, 0x48, 0x00, 0x48, 0x00, 0x00)
    w(0xff, 0xc0, 0x00, 8 + 3 * channels, 0x08, // SOF0, 8-bit precision
      (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff,
      channels)
    (1 to channels).foreach(c => w(c, 0x11, 0x00)) // id, 1x1 sampling, DQT 0
    w(0xff, 0xd9) // EOI
    out.toByteArray
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
