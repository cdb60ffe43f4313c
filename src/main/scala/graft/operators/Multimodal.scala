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
    * style decode without the Python runtime.
    *
    * REAL decode for the four header-parseable formats ([[MediaDecode]]):
    * a structurally valid PNG (signature + IHDR + CRC) or JPEG (marker
    * walk to SOF) yields its true (width, height, channels) — the
    * formats a real image corpus actually carries (r9); a valid BMP
    * yields its true (width, height, channels)
    * and media_type "image/bmp"; a valid RIFF/WAVE yields
    * (frames-per-channel, sample_rate, channels) as "audio/wav" —
    * width = temporal extent, height = rate, the documented mapping
    * into the shared image-shaped meta. Anything else (including all
    * document-text blobs — the strict parsers reject text that merely
    * starts with the magic) falls back to the deterministic fake, which
    * keeps [[qMultimodalMeta]] a faithful declarative twin on text
    * corpora while real media decodes for real.
    */
  def decodeStub(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { b =>
        // real header decodes first (r9 adds JPEG/PNG — the formats a
        // real image corpus actually carries), deterministic fake last
        MediaDecode.decodePng(b.content) match {
          case Some((w, h, c)) =>
            MediaMeta(b.doc_id, "image/png", b.content.length, w, h, c)
          case None => MediaDecode.decodeJpeg(b.content) match {
            case Some((w, h, c)) =>
              MediaMeta(b.doc_id, "image/jpeg", b.content.length, w, h, c)
            case None => MediaDecode.decodeBmp(b.content) match {
              case Some((w, h, c)) =>
                MediaMeta(b.doc_id, "image/bmp", b.content.length, w, h, c)
              case None => MediaDecode.decodeWav(b.content) match {
                case Some(wav) =>
                  MediaMeta(b.doc_id, "audio/wav", b.content.length,
                    math.min(wav.frames, Int.MaxValue.toLong).toInt,
                    wav.sampleRate, wav.channels)
                case None =>
                  val (w, h, c) = fakeDecode(b.content)
                  MediaMeta(b.doc_id, b.media_type, b.content.length, w, h, c)
              }
            }
          }
        }
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

  /** q_frame_sample — video-style uniform temporal sampling: each blob
    * pretends to be a clip with `n_frames = n_bytes div 16` frames; up
    * to 4 frames are sampled at uniform offsets (k·n/4) and emitted as
    * one row each with a per-frame feature hash (the fake stand-in for
    * a real frame decode + embedding). The Spark shape is the real one:
    * metadata sizes a `sequence` → `explode` row fan-out (work ∝ frames
    * SAMPLED, not frames present), the blob column never shuffles (the
    * projection drops it before the distinct's exchange — only doc_id,
    * frame_idx and the 8-byte feature move), and a real decoder slots
    * into the feature expression without touching the plan.
    */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val nFrames = (octet_length(col("content")) / lit(16)).cast("long") + 1L
    blobs(spark, dir)
      .withColumn("n_frames", nFrames)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), lit(3L))).as("k"),
        col("content").cast("string").as("txt"))
      .select(col("doc_id"), col("n_frames"),
        expr("(k * n_frames) div 4").as("frame_idx"), col("txt"))
      .distinct()
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        hash60(concat(col("txt"), lit(":"), col("frame_idx").cast("string")))
          .as("frame_feature"))
  }

  val frameSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, octet_length(encode(text)) // 16 + 1 AS n_frames,
       |         text AS txt
       |  FROM documents),
       |f AS (SELECT DISTINCT doc_id, n_frames, (k * n_frames) // 4 AS frame_idx, txt
       |      FROM b, (SELECT unnest(generate_series(0, 3)) AS k) ks)
       |SELECT doc_id, n_frames, frame_idx,
       |       ${hash60Sql("txt || ':' || CAST(frame_idx AS VARCHAR)")} AS frame_feature
       |FROM f""".stripMargin

  /** q_resize_plan — aspect-preserving resize planning to a 224-long-side
    * target in PURE INTEGER math (`(dim·224) div max(w,h)` — no float
    * scale factor, so the plan is bit-identical everywhere): the metadata
    * half of an image-resize stage. The actual pixel resample is the
    * codec call a production pipeline plugs into the decode stub; the
    * plan (dimensions, scale, per-image output geometry) is what the
    * distributed engine owns, and it stays a single codegen'd projection.
    */
  def qResizePlan(spark: SparkSession, dir: String): DataFrame =
    qMultimodalMeta(spark, dir)
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        expr("CAST((width * 224) div long_side AS INT)").as("out_w"),
        expr("CAST((height * 224) div long_side AS INT)").as("out_h"),
        expr("CAST((224 * 100) div long_side AS INT)").as("scale_pct"),
        (col("long_side") <= 224).as("upscale"))

  val resizePlanSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CAST(${hash60Sql("'w:' || text")} % 1024 + 16 AS INT) AS width,
       |         CAST(${hash60Sql("'h:' || text")} % 1024 + 16 AS INT) AS height
       |  FROM documents),
       |g AS (SELECT *, greatest(width, height) AS long_side FROM m)
       |SELECT doc_id, width, height,
       |       CAST((width * 224) // long_side AS INT) AS out_w,
       |       CAST((height * 224) // long_side AS INT) AS out_h,
       |       CAST((224 * 100) // long_side AS INT) AS scale_pct,
       |       long_side <= 224 AS upscale
       |FROM g""".stripMargin

  /** q_stft_plan — the AUDIO half of multimodal planning: STFT framing
    * for a feature-extraction stage (16 kHz, 400-sample/25 ms window,
    * 160-sample/10 ms hop — the Whisper/Kaldi fbank constants). Each
    * blob pretends to be PCM with `n_samples = 8·n_bytes`; outputs are
    * the numbers a batch scheduler actually needs — duration, frame
    * count (uncentered and centered), padded tail — all in PURE INTEGER
    * math (the n_samples ≥ win CASE keeps every division nonnegative:
    * Spark `div` truncates toward zero, DuckDB `//` floors — they only
    * agree on nonnegative operands). The FFT itself is the codec call
    * that plugs into [[decodeStub]]; the plan stays one codegen'd
    * projection at corpus scale.
    */
  def qStftPlan(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir)
      .select(col("doc_id"),
        (octet_length(col("content")).cast("long") * 8).as("n_samples"))
      .select(col("doc_id"), col("n_samples"),
        expr("(n_samples * 1000) div 16000").as("duration_ms"),
        expr("CASE WHEN n_samples >= 400 THEN (n_samples - 400) div 160 + 1 ELSE 0 END")
          .as("n_frames"),
        expr("n_samples div 160 + 1").as("n_frames_centered"),
        expr("CASE WHEN n_samples >= 400 THEN (n_samples - 400) % 160 ELSE 0 END")
          .as("tail_samples"))

  val stftPlanSql: String =
    """WITH a AS (SELECT doc_id,
      |            CAST(octet_length(encode(text)) AS BIGINT) * 8 AS n_samples
      |           FROM documents)
      |SELECT doc_id, n_samples,
      |       (n_samples * 1000) // 16000 AS duration_ms,
      |       CASE WHEN n_samples >= 400 THEN (n_samples - 400) // 160 + 1
      |            ELSE 0 END AS n_frames,
      |       n_samples // 160 + 1 AS n_frames_centered,
      |       CASE WHEN n_samples >= 400 THEN (n_samples - 400) % 160
      |            ELSE 0 END AS tail_samples
      |FROM a""".stripMargin

  /** q_patch_grid — ViT tokenization planning: from each image's
    * (fake-)decoded dimensions, the 16px patch grid after floor-cropping
    * to patch multiples, the resulting sequence length (+1 CLS token),
    * and the truncation decision against a 1024-token visual budget.
    * Pure integer projection over the metadata — the blob bytes are
    * never touched, so this plans a 100 TB image corpus at metadata
    * scan speed.
    */
  def qPatchGrid(spark: SparkSession, dir: String): DataFrame =
    qMultimodalMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"),
        expr("width div 16").as("gw"),
        expr("height div 16").as("gh"))
      .select(col("doc_id"), col("width"), col("height"),
        col("gw"), col("gh"),
        (col("gw") * col("gh")).as("n_patches"),
        (col("gw") * col("gh") + 1).as("seq_len"),
        (col("gw") * col("gh") + 1 > 1024).cast("int").as("truncated"),
        least(col("gw") * col("gh") + 1, lit(1024)).as("kept_tokens"))

  val patchGridSql: String = {
    val w = s"CAST(${hash60Sql("'w:' || text")} % 1024 + 16 AS INT)"
    val h = s"CAST(${hash60Sql("'h:' || text")} % 1024 + 16 AS INT)"
    s"""WITH m AS (SELECT doc_id, $w AS width, $h AS height FROM documents),
       |g AS (SELECT doc_id, width, height,
       |             width // 16 AS gw, height // 16 AS gh FROM m)
       |SELECT doc_id, width, height, gw, gh,
       |       gw * gh AS n_patches,
       |       gw * gh + 1 AS seq_len,
       |       CAST(gw * gh + 1 > 1024 AS INT) AS truncated,
       |       least(gw * gh + 1, 1024) AS kept_tokens
       |FROM g""".stripMargin
  }

  /** q_modal_balance — multimodal mixture accounting: corpus volume per
    * (channels, power-of-two width bucket) — rows, bytes, visual tokens
    * — the curation dashboard that decides per-modality sampling rates.
    * One map-side-combinable groupBy over metadata; output bounded by
    * 3 channels × ~7 buckets at ANY corpus size. The integer bit-length
    * bucket avoids libm log2 (cross-engine exactness).
    */
  def qModalBalance(spark: SparkSession, dir: String): DataFrame =
    qMultimodalMeta(spark, dir)
      .select(col("channels"), col("n_bytes"), col("width"), col("height"),
        expr("CAST(length(conv(CAST(width AS BIGINT), 10, 2)) AS INT) - 1")
          .as("w_bucket"))
      .groupBy("channels", "w_bucket")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        sum(expr("(width div 16) * (height div 16)")).as("total_patches"))

  val modalBalanceSql: String = {
    val w = s"CAST(${hash60Sql("'w:' || text")} % 1024 + 16 AS INT)"
    val h = s"CAST(${hash60Sql("'h:' || text")} % 1024 + 16 AS INT)"
    val c = s"CAST(${hash60Sql("'c:' || text")} % 3 + 1 AS INT)"
    s"""WITH m AS (SELECT doc_id,
       |            CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |            $w AS width, $h AS height, $c AS channels
       |           FROM documents)
       |SELECT channels,
       |       CAST(length(bin(width)) - 1 AS INT) AS w_bucket,
       |       COUNT(*) AS n_media,
       |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(SUM((width // 16) * (height // 16)) AS BIGINT) AS total_patches
       |FROM m GROUP BY 1, 2""".stripMargin
  }

  /** q_av_sync — audio-video alignment planning: each blob pretends to
    * be a clip (16 kHz audio from [[qStftPlan]]'s framing; 4 fps video);
    * 4 uniformly sampled video frames map to the 10ms-hop STFT frame
    * covering their timestamp, clamped into range, with an
    * audio-coverage flag. The multimodal-training alignment every
    * AV model ingests — pure integer math, the metadata-sized
    * sequence→explode fan-out of [[qFrameSample]] (work ∝ frames
    * sampled), blobs never shuffle.
    */
  def qAvSync(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir)
      .select(col("doc_id"),
        (octet_length(col("content")).cast("long") * 8).as("n_samples"))
      .select(col("doc_id"), col("n_samples"),
        expr("(n_samples * 1000) div 16000").as("dur_ms"),
        expr("CASE WHEN n_samples >= 400 THEN (n_samples - 400) div 160 + 1 ELSE 0 END")
          .as("n_stft"))
      .withColumn("n_vframes", expr("dur_ms * 4 div 1000 + 1"))
      .select(col("doc_id"), col("dur_ms"), col("n_stft"), col("n_vframes"),
        explode(sequence(lit(0L), lit(3L))).as("k"))
      .select(col("doc_id"), col("n_stft"), col("n_vframes"),
        expr("(k * n_vframes) div 4").as("vframe"))
      .distinct()
      .select(col("doc_id"), col("n_stft"), col("n_vframes"), col("vframe"),
        expr("vframe * 250").as("t_ms"),
        expr("CASE WHEN n_stft > 0 THEN least(vframe * 250 div 10, n_stft - 1) ELSE -1 END")
          .as("stft_idx"),
        expr("CAST(n_stft > 0 AND vframe * 250 div 10 < n_stft AS INT)")
          .as("in_audio"))

  val avSyncSql: String =
    """WITH a AS (SELECT doc_id,
      |            CAST(octet_length(encode(text)) AS BIGINT) * 8 AS n_samples
      |           FROM documents),
      |b AS (SELECT doc_id, (n_samples * 1000) // 16000 AS dur_ms,
      |             CASE WHEN n_samples >= 400 THEN (n_samples - 400) // 160 + 1
      |                  ELSE 0 END AS n_stft
      |      FROM a),
      |c AS (SELECT doc_id, n_stft, dur_ms * 4 // 1000 + 1 AS n_vframes FROM b),
      |f AS (SELECT DISTINCT doc_id, n_stft, n_vframes,
      |             (k * n_vframes) // 4 AS vframe
      |      FROM c, (SELECT unnest(generate_series(0, 3)) AS k) ks)
      |SELECT doc_id, n_stft, n_vframes, vframe,
      |       vframe * 250 AS t_ms,
      |       CASE WHEN n_stft > 0 THEN least(vframe * 250 // 10, n_stft - 1)
      |            ELSE -1 END AS stft_idx,
      |       CAST(n_stft > 0 AND vframe * 250 // 10 < n_stft AS INT) AS in_audio
      |FROM f""".stripMargin
}
