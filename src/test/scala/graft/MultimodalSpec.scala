package graft

import graft.operators.{MediaBlob, Multimodal}

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
}
