package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING Count-Min sketch — the incremental twin of the batch
  * `q_cms_topk` sketch and the proof of its scaladoc's mergeability
  * claim: CMS counters are pure per-(row, bucket) sums, so the SAME
  * declarative plan maintains them over a stream (Spark's streaming
  * aggregation state) or computes them over a batch frame — this
  * object deliberately exposes ONE function that does both, and
  * `SketchStreamSpec` pins streamed-final == batch counters no matter
  * how the documents are split across micro-batches.
  *
  * Unlike [[DedupStream]], no custom fMGWS kernel is needed: the
  * sketch update is commutative + associative, exactly what Spark's
  * built-in streaming aggregation state already models. State is the
  * d·W counter grid — CONSTANT (192 rows) no matter how many documents
  * stream past, the property that makes CMS the production
  * heavy-hitter shape (an exact token groupBy's state grows with the
  * vocabulary; this never does).
  *
  * The bucket math is shared with the batch query
  * ([[TextAnalysis.cmsBuckets]] — hash60(t ∥ "#j") mod W with the same
  * plan-time constants), so a served estimate
  * `min_j counters(j, bucket_j(t))` is comparable across the two
  * paths by construction.
  */
object SketchStream {

  /** The d·W running counters for a document frame — batch or
    * streaming (for a stream, aggregate in `complete`/`update` output
    * mode; each micro-batch folds its token counts into the grid).
    * Input needs a `text` column; everything else is ignored. */
  def counters(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .select(posexplode(array(
        TextAnalysis.cmsBuckets(col("token")): _*)).as(Seq("j", "b")))
      .groupBy("j", "b").agg(count(lit(1)).as("cnt"))

  /** STREAMING K-Minimum-Values sketch — the incremental twin of
    * `q_kmv_union`'s batch bottom-64 build and the consumer the native
    * [[graft.functions.KmvLows]] aggregate exists for: per watched
    * source, the k smallest DISTINCT 5-gram shingle hashes, maintained
    * as streaming aggregation state. KmvLows is a
    * `TypedImperativeAggregate` — partial buffers merge across
    * partitions AND across micro-batches (its serialize/merge path IS
    * the state-store round-trip), and distinctness is the aggregate's
    * own job, so the stream feeds RAW shingle hashes: no growing
    * pre-`distinct` state anywhere, k longs per source — CONSTANT —
    * no matter how many documents stream past. The shingle formula is
    * shared with the batch sketch ([[graft.operators.Dedup.kmvHashes]]),
    * so the streamed-final lows equal the batch `q_kmv_union` sketch
    * frame by construction (`SketchStreamSpec` pins it across
    * micro-batch splits), and any estimate served off the streamed
    * state matches the batch estimator's.
    *
    * Input needs `source` + `text` columns (batch or streaming; for a
    * stream, aggregate in `complete`/`update` output mode). */
  def kmvSketch(docs: DataFrame, k: Int = 64): DataFrame =
    graft.operators.Dedup.kmvHashes(docs)
      .groupBy("source")
      .agg(graft.functions.KmvLows.kmvLows(col("h"), k).as("lows"))
}
