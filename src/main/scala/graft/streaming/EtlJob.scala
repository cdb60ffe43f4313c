package graft.streaming

import graft.sources.PrometheusJson
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's main batch loop (etl_job.py run(): load state → calc
  * window → fetch → transform → bulk insert → save state) as a
  * runnable Spark job over a response drop-directory, with the ledger
  * kept in parquet instead of a ClickHouse table. Each `runOnce` is one
  * loop iteration; progress survives restarts through the ledger — the
  * same crash-recovery contract as the reference (an aborted run leaves
  * no closed record, so the next run resumes from the previous valid
  * progress and the overlap re-covers the gap).
  */
object EtlJob {

  /** get_state (clickhouse_client.py:219-296): the latest VALID COMPLETED
    * ledger record — progress set, end set, end > start — ordered by
    * timestampStart. Invalid/open records are skipped, which is what
    * makes a crashed run harmless. */
  def latestState(ledger: Dataset[LedgerRecord]): Option[LedgerRecord] = {
    import ledger.sparkSession.implicits._
    ledger
      .filter(r => r.timestampProgress.isDefined &&
        r.timestampEnd.exists(_ > r.timestampStart))
      .orderBy(col("timestampStart").desc)
      .limit(1).collect().headOption
  }

  def readLedger(spark: SparkSession, ledgerDir: String): Dataset[LedgerRecord] = {
    import spark.implicits._
    if (new java.io.File(ledgerDir).exists())
      spark.read.parquet(ledgerDir).as[LedgerRecord]
    else spark.emptyDataset[LedgerRecord]
  }

  /** R8 probe over the persisted ledger (has_running_job,
    * clickhouse_client.py:440-524): any open record without a matching
    * valid closed record means a run is in flight (or died mid-run). */
  def hasRunningJob(spark: SparkSession, ledgerDir: String): Boolean =
    JobStateMachine.runningJobs(readLedger(spark, ledgerDir))
      .limit(1).count() > 0

  /** One reference-loop iteration:
    *  1. refuse if a running job exists (R8) unless `force` — the
    *     reference's concurrency gate; `force` is the operator's manual
    *     takeover after a crashed run
    *  2. progress ← latest valid completed ledger record (or initial)
    *  3. append the OPEN record — mark-start (R8); a crash after this
    *     point leaves the open record as the tombstone the next gate
    *     trips on, exactly like the reference
    *  4. (window_start, window_end) ← calcWindow(progress) — R6
    *  5. parse the drop-dir responses, keep points in [start, end) —
    *     the query_range the reference would have issued
    *  6. bulk-write TabSeparated part-files (idempotent: content-hashed
    *     rows collapse in a ReplacingMergeTree, R5/R9)
    *  7. append the CLOSED record with progress = min(end, now),
    *     rows/skipped accounting — mark-end (R7)
    * Returns the closed record it wrote.
    */
  def runOnce(spark: SparkSession, conf: EtlConfig, jobId: String,
              inDir: String, outDir: String, ledgerDir: String,
              initialProgress: Long, now: Long,
              force: Boolean = false): LedgerRecord = {
    import spark.implicits._
    if (hasRunningJob(spark, ledgerDir)) {
      if (!force) throw new IllegalStateException(
        s"running job exists in $ledgerDir (open record without close); " +
          "pass force=true to take over")
      // takeover: close every stale open record with an ABORT close —
      // end set (so the pair stops counting as running) but progress
      // NULL (so state reads never resume from it). The reference-side
      // equivalent is the operator inserting a closing row by hand.
      val stale = JobStateMachine
        .runningJobs(readLedger(spark, ledgerDir)).collect().toSeq
      if (stale.nonEmpty)
        stale.map { case (jid, start) =>
          LedgerRecord(jid, start, Some(math.max(now, start + 1)),
            None, None, None, None)
        }.toDS().write.mode("append").parquet(ledgerDir)
    }
    val progress = latestState(readLedger(spark, ledgerDir))
      .flatMap(_.timestampProgress).getOrElse(initialProgress)
    val (records, _) = JobStateMachine.step(
      jobId, progress, BatchEvent(jobId, now, 0L, 0L), conf)
    val Seq(open, _) = records
    Seq(open).toDS().write.mode("append").parquet(ledgerDir)

    val (start, end) = JobStateMachine.calcWindow(progress, conf)
    // persist: the stats aggregation AND the sink write both consume the
    // parsed window — without it the whole drop-dir is read and parsed
    // twice per iteration, and a file landing between the two jobs would
    // make batchRows disagree with what the sink actually wrote
    val parsed = PrometheusJson.parse(spark.read.text(inDir), "value")
      .filter(col("ts_us") >= start * 1000000L &&
        col("ts_us") < end * 1000000L)
      .persist()
    try {
      val stats = parsed.agg(
        sum(when(col("ok"), 1L).otherwise(0L)),
        sum(when(!col("ok"), 1L).otherwise(0L))).head()
      val (rows, skipped) =
        (if (stats.isNullAt(0)) 0L else stats.getLong(0),
          if (stats.isNullAt(1)) 0L else stats.getLong(1))
      graft.sinks.TsvSink.write(PrometheusJson.metricRows(parsed), outDir)

      val closed = JobStateMachine.step(
        jobId, progress, BatchEvent(jobId, now, rows, skipped), conf)._1.last
      Seq(closed).toDS().write.mode("append").parquet(ledgerDir)
      closed
    } finally parsed.unpersist()
  }
}
