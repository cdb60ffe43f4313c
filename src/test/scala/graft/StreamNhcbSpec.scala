package graft

import graft.operators.NativeHistogram
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming NHCB quantile∘rate parity (r14, VERDICT_r13 item 7): the
  * per-series bucket-count carry kernel must emit VALUE-IDENTICAL rows
  * to the batch `q_nhcb_rate_q` stacked rule on the same samples, no
  * matter how the stream is split into micro-batches — including
  * windows whose samples span a micro-batch boundary (the time-tercile
  * split guarantees some do). A far-future mover advances the
  * watermark past every real window. The fixture pins the end-to-end
  * path; a dense synthetic with an engineered TOTAL DECREASE pins the
  * histogram reset rule (the increase IS the newer window's counts)
  * and a crafted bucket distribution pins the overflow-bucket clamp
  * (rank in +∞ returns the highest finite bound).
  */
class StreamNhcbSpec extends SparkSpec {

  private type Row6 = (String, Long, Long, Long, Long, Double)

  private def streamNhcb(dir: String, sinkName: String): Set[Row6] = {
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
    val q = MetricsStream.streamingNhcbRateQ(stream)
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
        r.getAs[Long]("w_start"), r.getAs[Long]("phi_x100"),
        r.getAs[Long]("reset"), r.getAs[Double]("q_value")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some (window, phi)")
    rows.toSet
  }

  private def batchNhcb(dir: String): Set[Row6] =
    NativeHistogram.qNhcbRateQ(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("w_start"), r.getAs[Long]("phi_x100"),
        r.getAs[Long]("reset"), r.getAs[Double]("q_value")))
      .toSet

  test("streamed NHCB quantile == q_nhcb_rate_q on the real fixture " +
      "across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchNhcb(sf)
    assert(batch.nonEmpty, "fixture must yield adjacent-window pairs")
    assert(streamNhcb(sf, "stream_nhcb_fixture") == batch)
  }

  test("reset rule + overflow clamp: a total decrease restarts the " +
      "increase from the newer window's counts, and a rank landing " +
      "in the +inf bucket returns the highest finite bound") {
    import spark.implicits._
    val t0 = 1704067200L
    assert(t0 % 3600 == 0)
    val dir = tmpDir("stream_nhcb_reset")
    // one series, three adjacent 1h windows:
    //  w0: 8 samples across buckets (values in units; bounds are
    //      5/20/80/200 units)
    //  w1: 3 samples, total 3 < 8 → RESET; two land PAST the last
    //      bound (+inf bucket) so p90 must clamp to 200.0
    //  w2: 6 samples, no reset; growth in bucket 1
    val w0 = (0 until 8).map(i => (100L + i, "lat", 7L, t0 + 300L * i,
      Seq(1.0, 3.0, 10.0, 15.0, 50.0, 60.0, 100.0, 250.0)(i)))
    val w1 = Seq((200L, "lat", 7L, t0 + 3600L + 100L, 2.0),
      (201L, "lat", 7L, t0 + 3600L + 200L, 300.0),
      (202L, "lat", 7L, t0 + 3600L + 300L, 500.0))
    val w2 = (0 until 6).map(i => (300L + i, "lat", 7L, t0 + 7200L + 400L * i,
      Seq(2.0, 6.0, 7.0, 9.0, 12.0, 30.0)(i)))
    (w0 ++ w1 ++ w2)
      .toDF("event_id", "event_type", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_micros(col("ts_s") * 1000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchNhcb(dir)
    assert(batch.size == 4, s"two pairs x two phis expected: $batch")
    assert(batch.exists { case (_, _, w, phi, reset, qv) =>
      w == t0 + 3600L && phi == 90L && reset == 1L && qv == 200.0 },
      s"reset-window p90 must clamp to the highest finite bound: $batch")
    assert(streamNhcb(dir, "stream_nhcb_reset_sink") == batch)
  }
}
