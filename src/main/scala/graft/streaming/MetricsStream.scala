package graft.streaming

import graft.sources.PrometheusJson
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingestion pipeline (BASELINE north star: stream
  * Prometheus metrics → transform → ClickHouse-shaped sink).
  *
  * Layout mirrors the reference's batch loop (etl_job.py:357-543) but
  * lets Spark own the loop: a file source watches a drop directory of
  * `query_range` responses (what the reference's HTTP fetch would write),
  * the SAME PrometheusJson.parse transform used in batch produces metric
  * rows, a watermarked tumbling-window aggregation maintains per-series
  * rollups with bounded state, and `foreachBatch` drives the TabSeparated
  * bulk-load sink. Batch/streaming parity is spec'd in StreamingSpec —
  * identical input files through either path give identical rows.
  */
object MetricsStream {

  /** Streaming source: one JSON response document per line, dropped as
    * text files into `path`. `maxFilesPerTrigger` bounds each
    * micro-batch (backpressure for backfills over a deep drop-dir:
    * without it, the first micro-batch after downtime ingests the whole
    * backlog in one planning unit). */
  def readResponses(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    PrometheusJson.parse(reader.text(path), "value")
  }

  /** Batch twin of [[readResponses]] — same transform, same result. */
  def readResponsesBatch(spark: SparkSession, path: String): DataFrame =
    PrometheusJson.parse(spark.read.text(path), "value")

  /** Streaming idempotency — the R5/R9 story under continuous ingestion:
    * a content-hash row id (same column list as the reference's
    * cityHash64 MATERIALIZED id) plus watermarked `dropDuplicates`.
    * Replayed/overlapping responses (the batch-window overlap WILL
    * re-deliver points, by design) collapse in the dedup state store
    * instead of in ClickHouse's merge; the watermark bounds that state
    * exactly like ReplacingMergeTree's merge horizon bounds the
    * reference's. Works on batch frames too (dropDuplicates is plain
    * distinct-by-id there).
    */
  def dedupedMetrics(metrics: DataFrame): DataFrame = {
    import graft.functions.Portable._
    metrics
      .withColumn("id", hash60(concat_ws("\u0001",
        col("ts_us").cast("string"), col("name"),
        array_join(col("label_keys"), ","),
        array_join(col("label_values"), ","),
        formatFloat(col("value")))))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      // the event-time column MUST be part of the dedup key — that is
      // what lets the watermark evict state; dropDuplicates("id") alone
      // keeps every id forever. Result-identical: id already encodes
      // ts_us, so adding ts splits no group.
      .dropDuplicates("id", "ts")
      .drop("ts")
  }

  /** Streaming dedup via `dropDuplicatesWithinWatermark` — the Spark
    * 3.5+ API for the case where the dedup key does NOT encode event
    * time: duplicates are only guaranteed to collapse while they arrive
    * within the watermark delay of the first copy, and state is evicted
    * purely by that clock. This is the exact semantic of the reference's
    * batch-window overlap (re-deliveries happen within one overlap span,
    * never a day later), so the weaker-but-bounded contract is the
    * honest production dial next to [[dedupedMetrics]]'s
    * key-encodes-time variant.
    */
  def dedupedMetricsWithinWatermark(metrics: DataFrame): DataFrame = {
    import graft.functions.Portable._
    metrics
      .withColumn("id", hash60(concat_ws("\u0001",
        col("ts_us").cast("string"), col("name"),
        array_join(col("label_keys"), ","),
        array_join(col("label_values"), ","),
        formatFloat(col("value")))))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .drop("ts")
  }

  /** Stream-stream INTERVAL join: pair each `nameA` point with the
    * `nameB` points on the SAME series labels within `[a.ts, a.ts+30m]`
    * — the streaming counterpart of [[graft.operators.Olap.qRangeJoin]].
    * Both sides carry the same watermark (they are two filters of one
    * source) and the join condition bounds event-time distance, which
    * is what lets Spark evict join state: a row older than
    * watermark + range can never match again. Inner join, so matches
    * emit as soon as both sides arrive — no flush needed for output,
    * only for state cleanup. Works identically on batch frames (the
    * parity spec pins it).
    */
  def intervalJoin(metrics: DataFrame, nameA: String = "click",
      nameB: String = "purchase"): DataFrame = {
    val base = metrics
      .select(col("name"),
        concat_ws("\u0001", array_join(col("label_keys"), ","),
          array_join(col("label_values"), ",")).as("sig"),
        timestamp_micros(col("ts_us")).as("ts"), col("value"))
      .withWatermark("ts", "10 minutes")
    val a = base.filter(col("name") === nameA)
      .select(col("sig"), col("ts").as("a_ts"), col("value").as("a_value"))
    val b = base.filter(col("name") === nameB)
      .select(col("sig").as("b_sig"), col("ts").as("b_ts"),
        col("value").as("b_value"))
    a.join(b, col("sig") === col("b_sig") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 30 minutes"))
      .select(col("sig"), unix_micros(col("a_ts")).as("a_ts_us"),
        unix_micros(col("b_ts")).as("b_ts_us"),
        col("a_value"), col("b_value"))
  }

  /** LEFT OUTER stream-stream interval join — the conversion-tracking
    * twin of [[intervalJoin]] that also surfaces the NON-converting
    * side ("every click, with its purchase if one came"): unmatched
    * `nameA` rows emit NULL-padded, but — the semantic this exists to
    * pin — only once the WATERMARK passes `a.ts + range + delay`,
    * because until then a matching `nameB` row could still arrive.
    * Inner matches still emit immediately. This is the streaming join
    * mode with the strictest state/correctness coupling: the same
    * eviction bound that caps state size is what licenses the null
    * emission, so neither can be tuned without the other. Identical
    * plan runs on batch frames (nulls appear immediately there — the
    * parity spec compares final result sets, not emission times).
    */
  def intervalJoinOuter(metrics: DataFrame, nameA: String = "click",
      nameB: String = "purchase"): DataFrame = {
    val base = metrics
      .select(col("name"),
        concat_ws("\u0001", array_join(col("label_keys"), ","),
          array_join(col("label_values"), ",")).as("sig"),
        timestamp_micros(col("ts_us")).as("ts"), col("value"))
      .withWatermark("ts", "10 minutes")
    val a = base.filter(col("name") === nameA)
      .select(col("sig"), col("ts").as("a_ts"), col("value").as("a_value"))
    val b = base.filter(col("name") === nameB)
      .select(col("sig").as("b_sig"), col("ts").as("b_ts"),
        col("value").as("b_value"))
    a.join(b, col("sig") === col("b_sig") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 30 minutes"),
      "left_outer")
      .select(col("sig"), unix_micros(col("a_ts")).as("a_ts_us"),
        unix_micros(col("b_ts")).as("b_ts_us"),
        col("a_value"), col("b_value"))
  }

  /** Watermarked tumbling-window per-series aggregation: the streaming
    * materialization of q_over_time. Watermark bounds state: windows
    * older than 10 min beyond max event time are finalized and evicted —
    * at 100 TB/day this is what keeps state size O(active windows), not
    * O(history). Works on batch frames too (watermark is a no-op there),
    * which is exactly how the parity spec uses it.
    */
  def windowedAgg(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("name"))
      .agg(count(lit(1)).as("n"),
        sum("value").as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("name"), col("n"), col("sum_value"))

  /** Watermarked SESSION-window per-series aggregation — Spark's native
    * `session_window` (gap-based): a session closes when no point
    * arrives for 30 minutes, the streaming counterpart of
    * [[graft.operators.Olap.qSessionize]]'s lag/cumsum gap logic. The
    * watermark finalizes and EVICTS a session once event time passes
    * its end + 10 min, so state is O(open sessions) — the only
    * sessionization that works on an unbounded stream (the batch form
    * needs each key's full history under a window function). Works on
    * batch frames too (watermark is a no-op there), which is how the
    * parity spec pins streaming == batch.
    */
  def sessionAgg(metrics: DataFrame): DataFrame =
    metrics
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("name"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(unix_micros(col("sw.start")).as("s_start_us"),
        unix_micros(col("sw.end")).as("s_end_us"),
        col("name"), col("n"), col("sum_value"))

  /** Stream-static broadcast enrichment: join the metrics stream to a
    * static dimension frame (user → tier) on the `user` label extracted
    * from the dynamic label arrays. The static side is re-resolved per
    * micro-batch (Spark's stream-static contract — a dim-table update
    * is picked up on the next batch) and explicitly `broadcast()` so
    * the stream side never shuffles and the join keeps NO stream state:
    * unlike a stream-stream join there is nothing to watermark. Works
    * identically on batch frames — the parity spec pins it.
    */
  def enrich(metrics: DataFrame, userTiers: DataFrame): DataFrame = {
    val pos = array_position(col("label_keys"), "user")
    metrics
      .withColumn("user",
        when(pos > 0, element_at(col("label_values"), pos.cast("int"))))
      .join(broadcast(userTiers), Seq("user"), "left_outer")
      .select(col("ts_us"), col("name"), col("user"), col("value"),
        coalesce(col("tier"), lit("unknown")).as("tier"))
  }

  /** End-to-end stream: responses dir → parse → TSV bulk files, one
    * atomically-committed batch per micro-batch (the reference's
    * insert_from_file loop, clickhouse_client.py:131-218). Skips are
    * dropped per R2 — accounting for them is the job ledger's business
    * (JobStateMachine), not the data sink's. `Trigger.AvailableNow` so
    * tests and backfills drain everything then stop; a live deployment
    * passes a processing-time trigger instead. Re-invoking with the
    * same checkpoint resumes INCREMENTALLY — only files the source log
    * has not committed are processed (the reference's ledger-gated
    * "don't re-fetch what's loaded" rule, owned by Spark's offset log).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpointDir: String,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readResponses(spark, inDir, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sinks.TsvSink.write(
          PrometheusJson.metricRows(batch), outDir)
      }
      .start()

  /** The BASELINE north-star composition end-to-end: streaming source →
    * parse → per-micro-batch TSV render → immediate HTTP POST into
    * ClickHouse via [[graft.sinks.ClickHouseHttpClient.loadDir]] — the
    * reference's fetch→temp-file→insert_from_file loop
    * (etl_job.py:357-543 + clickhouse_client.py:131-218) with Spark
    * owning the loop. Each micro-batch writes to its OWN
    * `outDir/batch-<id>` directory (mode overwrite, so a replayed batch
    * rewrites identical part-files rather than appending duplicates)
    * and POSTs exactly that directory's part-files; earlier batches'
    * files are never re-sent. Duplicate rows a replayed POST could
    * still produce collapse server-side on the content-hash id
    * (ReplacingMergeTree, R5/R9) — the reference's own idempotency
    * story, unchanged. The POST runs on the driver (one HTTP stream per
    * micro-batch, the reference's exact shape); a deployment needing
    * parallel loads points N workers at the same part-file pile
    * instead.
    */
  def runToClickHouse(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, ch: graft.sinks.ClickHouseHttpClient,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readResponses(spark, inDir, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchDir = s"$outDir/batch-$batchId"
        PrometheusJson.tsvLines(PrometheusJson.metricRows(batch))
          .write.mode("overwrite").text(batchDir)
        ch.loadDir(batchDir)
        ()
      }
      .start()
}
