package graft.streaming

import graft.logging.StructuredLogger
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
  *
  * Concurrency (R8): the gate + mark-start sequence runs under
  * [[LedgerLock]], so racing `runOnce`/[[tryMarkStart]] calls — even
  * from separate processes — serialize through an atomic critical
  * section and exactly one appends the open record; the rest observe it
  * and refuse. This closes the round-2 check-then-act caveat and
  * matches the reference's atomic INSERT-with-subquery
  * (clickhouse_client.py:536-613). Structured JSON events (reference
  * logging_config.py conventions) surround each phase.
  */
object EtlJob {

  private def defaultLogger = new StructuredLogger(
    "etl_job", sys.env.getOrElse("LOG_LEVEL", "INFO"))

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
    * clickhouse_client.py:440-524): any (job, start) whose latest
    * record is still open means a run is in flight (or died mid-run). */
  def hasRunningJob(spark: SparkSession, ledgerDir: String): Boolean =
    JobStateMachine.runningJobs(readLedger(spark, ledgerDir))
      .limit(1).count() > 0

  /** seq = max(existing)+1, NOT System.nanoTime(): nanoTime has an
    * arbitrary per-boot origin, so after a reboot (the crash-recovery
    * scenario this ledger exists for) fresh records could sort BELOW
    * older ones and the latest-wins read would resurrect stale state.
    * Deriving from the ledger itself is monotonic across restarts. */
  private def maxSeq(ledger: Dataset[LedgerRecord]): Long = {
    val m = ledger.agg(max(col("seq"))).head()
    if (m.isNullAt(0)) 0L else m.getLong(0)
  }

  /** try_mark_start (clickhouse_client.py:536-613): atomically append
    * this job's OPEN ledger record iff NO job is currently running.
    * The check and the append form one [[LedgerLock]] critical section,
    * so of N concurrent callers exactly one wins (returns the open
    * record it wrote) and the rest get None — the reference's
    * INSERT-with-subquery CAS, with the same "any running job blocks"
    * breadth. */
  def tryMarkStart(spark: SparkSession, conf: EtlConfig, jobId: String,
                   ledgerDir: String, initialProgress: Long, now: Long,
                   logger: StructuredLogger = defaultLogger)
      : Option[LedgerRecord] = {
    import spark.implicits._
    LedgerLock.withLock(ledgerDir) {
      val ledger0 = readLedger(spark, ledgerDir)
      val running = JobStateMachine.runningJobs(ledger0).collect().toSeq
      if (running.nonEmpty) {
        logger.info(s"Found ${running.size} running job(s)", Map(
          "clickhouse_client.has_running_job.running_count" -> running.size,
          "clickhouse_client.has_running_job.running_timestamps" ->
            running.map(_._2)))
        None
      } else {
        val progress = latestState(ledger0)
          .flatMap(_.timestampProgress).getOrElse(initialProgress)
        val (records, _) = JobStateMachine.step(
          jobId, progress, BatchEvent(jobId, now, 0L, 0L), conf)
        val open = records.head.copy(seq = maxSeq(ledger0) + 1L)
        Seq(open).toDS().write.mode("append").parquet(ledgerDir)
        Some(open)
      }
    }
  }

  /** One reference-loop iteration:
    *  1. gate + mark-start under [[LedgerLock]] (R8, atomic): refuse if
    *     THIS job is already running unless `force` — `force` is the
    *     operator's manual takeover after a crashed run (abort-closes
    *     only this job's stale records)
    *  2. progress ← latest valid completed ledger record (or initial)
    *  3. append the OPEN record — mark-start; a crash after this point
    *     leaves the open record as the tombstone the next gate trips
    *     on, exactly like the reference
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
              force: Boolean = false,
              logger: StructuredLogger = defaultLogger): LedgerRecord = {
    import spark.implicits._
    // --- critical section: gate + mark-start are atomic across
    // processes; everything after rides on the open record ---
    val (progress, closedSeq) = LedgerLock.withLock(ledgerDir) {
      val ledger0 = readLedger(spark, ledgerDir)
      var nextSeq = maxSeq(ledger0) + 1L
      def stamp(r: LedgerRecord): LedgerRecord = {
        val s = nextSeq; nextSeq += 1L; r.copy(seq = s)
      }
      // one ledger pass serves the gate, the takeover list, and progress
      val mine = JobStateMachine.runningJobs(ledger0)
        .filter(_._1 == jobId).collect().toSeq
      if (mine.nonEmpty) {
        if (!force) throw new IllegalStateException(
          s"job $jobId already running in $ledgerDir (latest record open); " +
            "pass force=true to take over")
        // takeover: close THIS job's stale open records with an ABORT
        // close — end set (stops counting as running) but progress NULL
        // (state reads never resume from it). Other jobs' in-flight runs
        // are untouched. The reference-side equivalent is the operator
        // inserting a closing row by hand.
        mine.map { case (jid, start) =>
          stamp(LedgerRecord(jid, start, Some(math.max(now, start + 1)),
            None, None, None, None))
        }.toDS().write.mode("append").parquet(ledgerDir)
      }
      val progress = latestState(ledger0)
        .flatMap(_.timestampProgress).getOrElse(initialProgress)
      val (records, _) = JobStateMachine.step(
        jobId, progress, BatchEvent(jobId, now, 0L, 0L), conf)
      Seq(stamp(records.head)).toDS().write.mode("append").parquet(ledgerDir)
      (progress, nextSeq)
    }

    val (start, end) = JobStateMachine.calcWindow(progress, conf)
    logger.info("ETL batch started", Map(
      "etl_job.batch_started.job_id" -> jobId,
      "etl_job.batch_started.window_start" -> start,
      "etl_job.batch_started.window_end" -> end,
      "etl_job.batch_started.progress" -> progress))
    // One raw read of the drop-dir per iteration: the validity gate and
    // parse() both consume this cached frame, so the gate costs a cached
    // scan, not a second read+parse job — and a file landing between the
    // two cannot make the gate and the load disagree about dir contents.
    val raw = spark.read.text(inDir).persist()
    // persist: the stats aggregation AND the sink write both consume the
    // parsed window — without it the whole drop-dir is read and parsed
    // twice per iteration, and a file landing between the two jobs would
    // make batchRows disagree with what the sink actually wrote
    val parsed = PrometheusJson.parse(raw, "value")
      .filter(col("ts_us") >= start * 1000000L &&
        col("ts_us") < end * 1000000L)
      .persist()
    try {
      // FAIL-FAST on malformed response documents (reference parity: the
      // reference raises on an invalid response; silently dropping a
      // truncated drop-dir file would advance progress past data that was
      // never loaded). The throw lands after mark-start, so the open
      // tombstone + force-takeover recovery applies, same as any other
      // mid-batch failure. Deliberately DIR-WIDE, not window-scoped: a
      // malformed document has no trustworthy timestamp to scope by, so
      // one corrupt file halts ALL future windows until it is repaired or
      // removed — stricter than the reference's per-response check, by
      // design (a drop-dir is an ingest queue; corruption anywhere in it
      // is an operator-attention event, not a skippable row).
      val nBad = PrometheusJson.docValidity(raw, "value")
        .filter(!col("doc_ok")).count()
      if (nBad > 0) throw new IllegalStateException(
        s"$nBad malformed response document(s) in $inDir — failing the " +
          "batch (repair or remove them, then force-take-over)")
      val stats = parsed.agg(
        sum(when(col("ok"), 1L).otherwise(0L)),
        sum(when(!col("ok"), 1L).otherwise(0L))).head()
      val (rows, skipped) =
        (if (stats.isNullAt(0)) 0L else stats.getLong(0),
          if (stats.isNullAt(1)) 0L else stats.getLong(1))
      graft.sinks.TsvSink.write(PrometheusJson.metricRows(parsed), outDir)

      val closed = JobStateMachine.step(
        jobId, progress, BatchEvent(jobId, now, rows, skipped), conf)
        ._1.last.copy(seq = closedSeq)
      Seq(closed).toDS().write.mode("append").parquet(ledgerDir)
      logger.info("ETL batch completed", Map(
        "etl_job.batch_completed.job_id" -> jobId,
        "etl_job.batch_completed.rows" -> rows,
        "etl_job.batch_completed.skipped_count" -> skipped,
        "etl_job.batch_completed.progress" ->
          closed.timestampProgress.getOrElse(-1L),
        "etl_job.batch_completed.window_seconds" ->
          closed.batchWindowSeconds.getOrElse(-1L)))
      closed
    } catch {
      case e: Exception =>
        logger.error("ETL batch failed", Map(
          "etl_job.batch_failed.job_id" -> jobId,
          "etl_job.batch_failed.error" -> e.toString,
          "etl_job.batch_failed.error_type" -> e.getClass.getSimpleName))
        throw e
    } finally { parsed.unpersist(); raw.unpersist() }
  }
}
