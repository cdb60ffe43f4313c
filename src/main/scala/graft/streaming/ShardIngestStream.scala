package graft.streaming

import graft.index.BandIndex
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING shard ingest against the SETTLED corpus (r12,
  * VERDICT_r11 item 5) — the live twin of
  * [[graft.operators.DocPipeline.ingestShard]], closing the near-dup
  * production triad's last seam: a freshly crawled shard arrives as a
  * STREAM and every document is judged against the persisted
  * [[BandIndex]] — the same artifacts, the same probe core
  * ([[BandIndex.probeSigs]]) the batch path runs — so verdicts are
  * identical BY CONSTRUCTION no matter how the shard splits into
  * micro-batches.
  *
  * This is the reference's windowed-incremental story
  * (etl_job.py:357-393: re-deliver a window against settled data,
  * never reprocess the base) applied to the near-dup path end to end:
  *
  *   - STATE DOES NOT GROW WITH THE CORPUS. [[DedupStream]] keeps the
  *     indexed corpus as keyed streaming state (right for dedup
  *     WITHIN a stream); here the settled corpus lives in the
  *     persisted index — the stream carries ZERO keyed state, so a
  *     100 TB base costs a shard ingest exactly one columnar postings
  *     read per micro-batch, like the batch probe.
  *   - Per micro-batch: the JVM signature kernel
  *     ([[DedupStream.sigJvm]] — the spec-proven hash60Jvm twin, the
  *     documented row-wise-imperative case) maps each doc to its 16
  *     MinHash components with no corpus-wide window and no row
  *     amplification; [[BandIndex.probeSigs]] then bands, joins the
  *     persisted (sidecar-capped) buckets, and verifies against the
  *     persisted base signatures. Work ∝ micro-batch.
  *   - foreachBatch is the right harness, not a streaming groupBy: the
  *     probe aggregates per (shard doc, base doc) — an arbitrary-key
  *     aggregation a pure append stream cannot express without
  *     watermark state, while each doc's verdict is already complete
  *     within its own micro-batch (it depends on nothing else in the
  *     stream). Re-delivery of a doc re-emits IDENTICAL rows (the
  *     probe is deterministic and the index static for the shard's
  *     lifetime) — the ReplacingMergeTree idempotence contract: sinks
  *     dedup on (doc_id, base_doc).
  *
  * Parity contract (`StreamShardIngestSpec`): the union of verdicts
  * across all micro-batches == `BandIndex.probe` on the same shard,
  * row-exact, for any split of the shard.
  */
object ShardIngestStream {

  /** (doc_id, s0..s15) via the JVM kernel, for one micro-batch of
    * (doc_id, text) rows. Docs under 3 tokens drop out, exactly like
    * the batch signature frame — and so do NULL-text docs (the batch
    * frame drops them via SQL null semantics; a bare `text.split`
    * here would NPE and kill the whole streaming query on one
    * malformed doc — ADVICE_r12). */
  def sigFrame(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Option(text).flatMap(DedupStream.sigJvm).map(s =>
          (id, s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7),
            s(8), s(9), s(10), s(11), s(12), s(13), s(14), s(15)))
      }
      .toDF("doc_id" +: (0 until 16).map(i => s"s$i"): _*)
  }

  /** One micro-batch's verdicts: the persisted-index probe on the
    * kernel signature frame. Also the batch-side twin the parity spec
    * compares against when called with a plain DataFrame. */
  def probeBatch(batch: DataFrame, root: String): DataFrame =
    BandIndex.probeSigs(batch.sparkSession, root, sigFrame(batch))

  /** Start the ingest stream: per micro-batch, probe the persisted
    * index at `root` and hand the verdict frame to `sink` (a writer —
    * parquet append, a ClickHouse load, a test buffer). The index must
    * already be ensured; the stream never builds or mutates it. */
  def run(docs: DataFrame, root: String, checkpoint: String)(
      sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(probeBatch(batch, root))
      }
      .start()

  /** One micro-batch's KEEP/DROP DECISIONS (r13, VERDICT_r12 item 5 —
    * the streaming path used to stop at probe verdicts): the
    * [[graft.operators.DocPipeline.ingestShard]] exact+near rule,
    * composed per micro-batch from the two PERSISTED tiers —
    *   - exact: the doc's [[Dedup.normFpCol]] fingerprint judged
    *     against the [[FpIndex]] base table (the same expression the
    *     batch rule evaluates, so parity is by construction), and
    *   - near: the [[BandIndex]] probe's est-J ≥ 1/2 verdict.
    * Output row shape == ingestShard's decisions frame: (doc_id,
    * exact_dup, near_dup, keep). Each doc's decision depends only on
    * its own content and the static indices, so the union across
    * micro-batches equals the batch decisions row-exact for ANY split
    * (`StreamShardIngestSpec`). Note the <3-token rule rides along:
    * such docs have no MinHash signature in EITHER path, so near_dup
    * is 0 there exactly like the batch rule. */
  def decisionsBatch(batch: DataFrame, bandRoot: String,
      fpRoot: String): DataFrame = {
    val spark = batch.sparkSession
    val near = probeBatch(batch, bandRoot)
      .filter(col("is_neardup") === 1)
      .select(col("doc_id").as("nd_doc")).distinct()
    val shardFp = batch.select(col("doc_id").cast("long"),
      Dedup.normFpCol.as("fp"))
    graft.index.FpIndex.probeFps(spark, fpRoot, shardFp)
      .select(col("doc_id"), col("is_dup").as("exact_dup"))
      .join(near, col("doc_id") === col("nd_doc"), "left_outer")
      .select(col("doc_id"), col("exact_dup"),
        col("nd_doc").isNotNull.cast("int").as("near_dup"))
      .withColumn("keep",
        (col("exact_dup") === 0 && col("near_dup") === 0).cast("int"))
  }

  /** Start the DECISION stream: per micro-batch, the exact+near
    * keep/drop rule against the two persisted indices. Both must
    * already be ensured; the stream never mutates them — [[settle]]
    * runs once the shard drains. */
  def runDecisions(docs: DataFrame, bandRoot: String, fpRoot: String,
      checkpoint: String)(sink: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(decisionsBatch(batch, bandRoot, fpRoot))
      }
      .start()

  /** SETTLE the drained shard into both persisted tiers — exactly the
    * batch appends ([[BandIndex.append]] + [[FpIndex.append]]), so
    * "streamed ingest then settle" and "batch ingest then settle"
    * leave BIT-IDENTICAL index states (append == rebuild is spec'd on
    * both indices; this is the lifecycle step the r12 streaming path
    * was missing). Call once the shard stream drains; the next
    * shard's stream probes a base that includes this shard. */
  def settle(spark: org.apache.spark.sql.SparkSession, corpusDir: String,
      bandRoot: String, fpRoot: String, nextShardSource: String): Unit = {
    // Idempotent resume (ADVICE_r13): a settle that crashed between
    // the two appends left ONE tier already at nextShardSource — on
    // retry, skip a tier whose meta already records the target
    // shardSource instead of tripping its next!=current guard and
    // stranding the other tier a shard behind.
    val bandDone = BandIndex.readMeta(spark, bandRoot)
      .exists(_.shardSource == nextShardSource)
    if (!bandDone)
      BandIndex.append(spark, corpusDir, bandRoot, nextShardSource)
    val fpDone = graft.index.FpIndex.readMeta(spark, fpRoot)
      .exists(_.shardSource == nextShardSource)
    if (!fpDone)
      graft.index.FpIndex.append(spark, corpusDir, fpRoot, nextShardSource)
  }
}
