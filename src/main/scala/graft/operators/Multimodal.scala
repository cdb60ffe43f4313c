package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. At 100 TB the
  * `content` column is the heavy payload; everything else is cheap typed
  * metadata that partitions/prunes independently of the blobs. */
case class MediaBlob(doc_id: Long, media_type: String, content: Array[Byte])

/** Decoded metadata for one media object (decode stub output). */
case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
                     width: Int, height: Int, channels: Int)

/** Multimodal-column plumbing (SURVEY.md §2.C): media as opaque `binary`
  * columns with typed metadata, and a batch-shaped decode stage.
  *
  * The real decode (image/audio codecs) is STUBBED — the codec libraries
  * are not in this environment — but everything Spark-side is real:
  * binary column schema, `Dataset[MediaBlob]` typed plumbing,
  * per-partition batch iteration (the shape a vectorized/Arrow decode
  * hands you), and a deterministic fake decode so results are testable.
  * Swapping `fakeDecode` for a JNI/codec call changes nothing upstream.
  */
object Multimodal {

  /** documents.text → an opaque binary `content` column, as if each doc
    * carried an image payload. UTF-8 bytes via cast — no UDF. */
  def blobs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lit("image").as("media_type"),
      col("text").cast("binary").as("content"))

  /** Deterministic fake decode: pretend the bytes are an image and derive
    * (width, height, channels) from content hashes. A real decoder reads
    * the header instead; the SHAPE (bytes in, metadata out) is the same.
    */
  private[operators] def fakeDecode(content: Array[Byte]): (Int, Int, Int) = {
    val text = new String(content, java.nio.charset.StandardCharsets.UTF_8)
    ((16 + hash60Jvm("w:" + text) % 1024).toInt,
      (16 + hash60Jvm("h:" + text) % 1024).toInt,
      (1 + hash60Jvm("c:" + text) % 3).toInt)
  }

  /** The decode stage: per-partition batch iteration over typed blobs.
    * `mapPartitions` (not `map`) so a real implementation can amortize
    * codec/model initialization once per batch and hand the iterator to a
    * vectorized decoder — the Spark-side contract of an Arrow/pandas-UDF
    * style decode without the Python runtime. */
  def decodeStub(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { b =>
        val (w, h, c) = fakeDecode(b.content)
        MediaMeta(b.doc_id, b.media_type, b.content.length, w, h, c)
      }
    }
  }

  /** q_multimodal_meta — the same decode expressed as a declarative plan
    * (codegen'd, no JVM lambdas): byte length + fake-decoded metadata
    * from content hashes. MultimodalSpec asserts this query and
    * [[decodeStub]] agree row-for-row, which is what makes the stub's
    * contract real. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir).select(
      col("doc_id"),
      col("media_type"),
      octet_length(col("content")).as("n_bytes"),
      (hash60(concat(lit("w:"), col("content").cast("string"))) % 1024 + 16)
        .cast("int").as("width"),
      (hash60(concat(lit("h:"), col("content").cast("string"))) % 1024 + 16)
        .cast("int").as("height"),
      (hash60(concat(lit("c:"), col("content").cast("string"))) % 3 + 1)
        .cast("int").as("channels"))

  val multimodalMetaSql: String =
    s"""SELECT doc_id, 'image' AS media_type,
       |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |       CAST(${hash60Sql("'w:' || text")} % 1024 + 16 AS INT) AS width,
       |       CAST(${hash60Sql("'h:' || text")} % 1024 + 16 AS INT) AS height,
       |       CAST(${hash60Sql("'c:' || text")} % 3 + 1 AS INT) AS channels
       |FROM documents""".stripMargin
}
