package graft

import graft.operators.MetricsEtl
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming alert-rule parity: the fMGWS for-duration evaluator must
  * emit VALUE-IDENTICAL rows to the batch `q_alert_for` operator on
  * the same samples, no matter how the stream splits into
  * micro-batches — pending/firing transitions, active_since anchoring,
  * lookback-carried instants and gap-broken runs all ride per-series
  * state that crosses batch boundaries (the time-tercile split below
  * guarantees some runs do). A far-future mover advances the watermark
  * past every real eval step so all of them close; its own sample is
  * below threshold and emits nothing in either engine.
  */
class StreamAlertSpec extends SparkSpec {

  private type Row6 = (String, Long, Long, Long, String, Long)

  /** Stream `dir`'s events through streamingAlertFor in 3 strictly-
    * ordered time-tercile micro-batches + a watermark mover. */
  private def streamAlert(dir: String, sinkName: String): Set[Row6] = {
    import spark.implicits._
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id"),
      col("ts"), col("event_id"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val inDir = tmpDir(s"${sinkName}_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(inDir)
    writeChunk(1)
    val stream = spark.readStream.schema(samples.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingAlertFor(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", 0L, maxUs + 86400L * 1000000L, -1L, 1.0))
        .toDF("name", "user_id", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "user_id", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName).collect().map(r =>
      (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("eval_ts_s"), r.getAs[Long]("value_cents"),
        r.getAs[String]("state"), r.getAs[Long]("active_since_s")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some eval step")
    rows.toSet
  }

  private def batchAlert(dir: String): Set[Row6] =
    MetricsEtl.qAlertFor(spark, dir).collect().map(r =>
      (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("eval_ts_s"), r.getAs[Long]("value_cents"),
        r.getAs[String]("state"), r.getAs[Long]("active_since_s"))).toSet

  test("streamed alerting == q_alert_for on the real fixture across micro-batches") {
    val sf = "/root/testdata/sf0.001"
    val batch = batchAlert(sf)
    assert(batch.exists(_._5 == "firing") && batch.exists(_._5 == "pending"),
      "fixture must exercise both alert states")
    val streamed = streamAlert(sf, "stream_alert_fixture")
    assert(streamed == batch,
      s"missing ${(batch -- streamed).take(3)}, extra ${(streamed -- batch).take(3)}")
  }

  test("streamed alerting == q_alert_for on a dense breach/gap/flap synthetic") {
    import spark.implicits._
    // hand-shaped series: (hot) a long breach run with a gap that
    // resets active_since; (flap) above/below alternation where the
    // lookback CARRY keeps a broken-looking run alive — the subtle
    // case: a below-threshold sample at step s kills the run at s, but
    // the NEXT steps re-breach on the carried older sample only if a
    // newer above-threshold sample still wins the (ts, event_id)
    // row_number race; (cold) never breaches.
    val t0 = 1704067200L // aligned to the 600 s step grid
    def at(step: Long, offS: Long): Long = (t0 + step * 600L + offS) * 1000000L
    val rows =
      // hot: breach steps 0-5, silent 6-11 (carry keeps 6-7 breaching,
      // 8+ instant-less), re-breach 12-13
      (0 to 5).map(i => (100L + i, "hot", 1L, at(i, 30L), 80.0, "{}")) ++
        Seq((120L, "hot", 1L, at(12, 30L), 90.0, "{}"),
          (121L, "hot", 1L, at(13, 30L), 90.0, "{}")) ++
        // flap: above at step 0, below at step 1 (newer sample wins the
        // instant), above again at 2 — runs of length 1, 1+carry
        Seq((200L, "flap", 2L, at(0, 30L), 70.0, "{}"),
          (201L, "flap", 2L, at(1, 30L), 10.0, "{}"),
          (202L, "flap", 2L, at(2, 30L), 70.0, "{}")) ++
        // two samples in ONE step: the later (ts, event_id) one is the
        // instant in both engines
        Seq((300L, "dup", 3L, at(0, 10L), 90.0, "{}"),
          (301L, "dup", 3L, at(0, 40L), 20.0, "{}")) ++
        (0 to 3).map(i => (400L + i, "cold", 4L, at(i, 30L), 5.0, "{}"))
    val dir = tmpDir("stream_alert_dense")
    rows.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchAlert(dir)
    // the synthetic must exercise: firing, pending, a reset
    // active_since, and the dup-step instant rule
    assert(batch.exists(_._5 == "firing"))
    assert(batch.count(t => t._1 == "hot" && t._5 == "pending") == 2,
      "hot must restart pending after the gap")
    assert(!batch.exists(_._1 == "cold"))
    assert(!batch.exists(t => t._1 == "dup" && t._3 == t0),
      "dup step 0: the newer below-threshold sample must win")
    assert(streamAlert(dir, "stream_alert_dense_sink") == batch)
  }
}
