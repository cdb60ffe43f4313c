package graft

import graft.operators.{MediaBlob, MediaDecode, Multimodal}

/** The decode stub's contract: the batch-shaped mapPartitions decode and
  * the declarative q_multimodal_meta plan agree row-for-row, so swapping
  * the fake decode for a real codec changes results, not plumbing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("decodeStub (mapPartitions) == q_multimodal_meta (declarative)") {
    val viaStub = Multimodal
      .decodeStub(Multimodal.blobs(spark, dir).as[MediaBlob])
      .collect()
      .map(m => (m.doc_id, m.media_type, m.n_bytes, m.width, m.height, m.channels))
      .toSet
    val viaQuery = Multimodal.qMultimodalMeta(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
        r.getAs[Int]("n_bytes"), r.getAs[Int]("width"),
        r.getAs[Int]("height"), r.getAs[Int]("channels")))
      .toSet
    assert(viaStub.nonEmpty)
    assert(viaStub == viaQuery)
  }

  test("blob column is real binary with UTF-8 byte length") {
    val b = Multimodal.blobs(spark, dir).as[MediaBlob].head()
    assert(b.media_type == "image")
    assert(b.content.nonEmpty)
    assert(new String(b.content, "UTF-8").getBytes("UTF-8").length
      == b.content.length)
  }

  test("real BMP bytes decode to true dimensions through the stub") {
    val bmp = MediaDecode.encodeBmp24(37, 21,
      (x, y) => ((x % 256).toByte, (y % 256).toByte, ((x + y) % 256).toByte))
    // round-trip through the parser directly...
    assert(MediaDecode.decodeBmp(bmp).contains((37, 21, 3)))
    // ...and through the distributed decode stage
    val blobs = Seq(
      MediaBlob(1L, "image", bmp),
      MediaBlob(2L, "image", "just some text".getBytes("UTF-8"))).toDS()
    val metas = Multimodal.decodeStub(blobs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).media_type == "image/bmp")
    assert((metas(1L).width, metas(1L).height, metas(1L).channels)
      == ((37, 21, 3)))
    assert(metas(1L).n_bytes == bmp.length)
    // the text blob falls back to the deterministic fake
    assert(metas(2L).media_type == "image")
  }

  test("real WAV bytes decode to rate/channels/frames through the stub") {
    val wav = MediaDecode.encodeWavPcm(16000, 2, 16, frames = 4800)
    val meta = MediaDecode.decodeWav(wav).get
    assert(meta.sampleRate == 16000 && meta.channels == 2 &&
      meta.bitsPerSample == 16 && meta.frames == 4800L)
    assert(meta.durationMs == 300L)
    val m = Multimodal.decodeStub(
      Seq(MediaBlob(9L, "audio", wav)).toDS()).head()
    assert(m.media_type == "audio/wav")
    assert((m.width, m.height, m.channels) == ((4800, 16000, 2)))
  }

  test("WAV chunk walk: extra odd-sized chunks before data still parse") {
    val base = MediaDecode.encodeWavPcm(8000, 1, 16, frames = 100)
    // splice a 7-byte LIST chunk (odd size → word-aligned with 1 pad)
    // between the fmt chunk (ends at byte 36) and the data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ "junkpad".getBytes("US-ASCII") ++
      Array[Byte](0)
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix the RIFF size field (total - 8), little-endian
    val riffSize = spliced.length - 8
    for (i <- 0 until 4)
      spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val meta = MediaDecode.decodeWav(spliced)
    assert(meta.contains(MediaDecode.WavMeta(8000, 1, 16, 100L)),
      s"chunk walk must skip unknown chunks: $meta")
  }

  test("real PNG bytes decode to true dims through the stub — and the " +
      "fixture is a REAL PNG per the JDK's independent decoder (r9)") {
    val png = MediaDecode.encodePng(41, 17,
      (x, y) => ((x % 256).toByte, (y % 256).toByte, 7.toByte))
    // golden check: javax.imageio is an INDEPENDENT full PNG decoder —
    // if it reads the fixture, the fixture is a real corpus-grade PNG,
    // not a bytes-shaped approximation
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 41 && img.getHeight == 17,
      "encodePng must produce a PNG the JDK decodes")
    assert(MediaDecode.decodePng(png).contains((41, 17, 3)))
    val m = Multimodal.decodeStub(Seq(MediaBlob(3L, "image", png)).toDS()).head()
    assert(m.media_type == "image/png")
    assert((m.width, m.height, m.channels) == ((41, 17, 3)))
    // strictness: one flipped IHDR byte fails the CRC -> reject
    val corrupt = png.clone()
    corrupt(17) = (corrupt(17) ^ 0x01).toByte
    assert(MediaDecode.decodePng(corrupt).isEmpty,
      "a CRC-broken IHDR must not half-parse")
    assert(MediaDecode.decodePng(
      ("\u0089PNG\r\n\u001a\n" + "z" * 60).getBytes("ISO-8859-1")).isEmpty)
  }

  test("JPEG SOF marker walk decodes dims/channels; truncated and " +
      "SOF-less streams reject (r9)") {
    val j = MediaDecode.encodeJpegHeader(640, 480, 3)
    assert(MediaDecode.decodeJpeg(j).contains((640, 480, 3)))
    assert(MediaDecode.decodeJpeg(MediaDecode.encodeJpegHeader(1, 65535, 1))
      .contains((1, 65535, 1)))
    assert(MediaDecode.decodeJpeg(MediaDecode.encodeJpegHeader(8000, 13, 4))
      .contains((8000, 13, 4)))
    val m = Multimodal.decodeStub(Seq(MediaBlob(4L, "image", j)).toDS()).head()
    assert(m.media_type == "image/jpeg")
    assert((m.width, m.height, m.channels) == ((640, 480, 3)))
    // a truncated segment chain rejects rather than half-parses
    assert(MediaDecode.decodeJpeg(j.dropRight(6)).isEmpty)
    // SOI alone, and text that merely starts with FFD8
    assert(MediaDecode.decodeJpeg(Array(0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(MediaDecode.decodeJpeg(
      ("\u00ff\u00d8junkjunkjunk").getBytes("ISO-8859-1")).isEmpty)
  }

  test("strict parsers reject text starting with the magic bytes") {
    val bmTrap = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(MediaDecode.decodeBmp(bmTrap).isEmpty)
    val riffTrap = ("RIFFabcdWAVE" + "y" * 100).getBytes("UTF-8")
    assert(MediaDecode.decodeWav(riffTrap).isEmpty)
    // corrupt size fields: valid prefix, truncated body
    val bmp = MediaDecode.encodeBmp24(8, 8, (_, _) => (0, 0, 0))
    assert(MediaDecode.decodeBmp(bmp.dropRight(10)).isEmpty)
    val wav = MediaDecode.encodeWavPcm(8000, 1, 8, 100)
    assert(MediaDecode.decodeWav(wav.dropRight(5)).isEmpty)
  }
}
