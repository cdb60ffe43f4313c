package graft

import graft.operators.NativeHistogram
import graft.streaming.MetricsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming native-histogram rate parity (VERDICT_r09 item 7): the
  * per-series carry kernel must emit VALUE-IDENTICAL rows to the batch
  * `q_native_rate` scalar recording rule on the same samples, no
  * matter how the stream is split into micro-batches — including
  * windows whose samples span a micro-batch boundary (the time-tercile
  * split guarantees some do). A far-future mover advances the
  * watermark past every real window; its own window has no adjacent
  * predecessor and emits nothing in either engine. The fixture pins
  * the end-to-end path; a dense synthetic with an engineered COUNT
  * DECREASE pins the histogram reset rule specifically (both scalars
  * restarting from the newer window's own totals).
  */
class StreamNativeRateSpec extends SparkSpec {

  private type Row6 = (String, Long, Long, Long, Long, Long)

  /** Stream `dir`'s events through streamingNativeRate in 3
    * strictly-ordered time-tercile micro-batches + a watermark mover;
    * return the emitted row set. */
  private def streamNativeRate(dir: String, sinkName: String): Set[Row6] = {
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
    val q = MetricsStream.streamingNativeRate(stream)
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
    val rows = spark.table(sinkName).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("w_start"), r.getAs[Long]("reset"),
        r.getAs[Long]("count_rate_x1e6"), r.getAs[Long]("sum_rate_x1e6")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some window")
    rows.toSet
  }

  private def batchNativeRate(dir: String): Set[Row6] =
    NativeHistogram.qNativeRate(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("w_start"), r.getAs[Long]("reset"),
        r.getAs[Long]("count_rate_x1e6"), r.getAs[Long]("sum_rate_x1e6")))
      .toSet

  test("streamed native rate == q_native_rate on the real fixture " +
      "across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchNativeRate(sf)
    assert(batch.nonEmpty, "fixture must yield adjacent-window pairs")
    assert(streamNativeRate(sf, "stream_nh_rate_fixture") == batch)
  }

  test("histogram reset rule: an engineered count decrease restarts " +
      "both scalars from the newer window's totals") {
    import spark.implicits._
    val t0 = 1704067200L // window-aligned (divisible by 3600)
    assert(t0 % 3600 == 0)
    val dir = tmpDir("stream_nh_rate_reset")
    // one series, three adjacent 1h windows: 6 samples, then 2 (the
    // RESET: count 6 -> 2), then 5 — plus a negative observation so
    // the truncating division's negative branch is exercised
    val rows =
      (0 until 6).map(i => (100L + i, "lat", 7L, t0 + 300L * i, 2.0 + i)) ++
      Seq((200L, "lat", 7L, t0 + 3600L + 100L, -3.5),
          (201L, "lat", 7L, t0 + 3600L + 200L, 1.25)) ++
      (0 until 5).map(i => (300L + i, "lat", 7L, t0 + 7200L + 400L * i, 10.0 * i))
    rows.toDF("event_id", "event_type", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_micros(col("ts_s") * 1000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchNativeRate(dir)
    // two adjacent pairs; the first is the reset
    assert(batch.size == 2, s"expected 2 rate rows, got $batch")
    assert(batch.exists { case (_, _, w, reset, cr, _) =>
      w == t0 + 3600L && reset == 1L && cr == 2L * 1000000L / 3600L },
      s"reset window must restart the count rate from its own totals: $batch")
    assert(streamNativeRate(dir, "stream_nh_rate_reset_sink") == batch)
  }
}
