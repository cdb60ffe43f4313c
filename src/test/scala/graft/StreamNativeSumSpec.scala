package graft

import graft.operators.NativeHistogram
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming native-histogram SUM parity (r11): the per-(name, window)
  * count-map kernel must emit VALUE-IDENTICAL rows — including the
  * exact contributing-series count — to the batch `q_native_sum`
  * cross-series merge on the same samples, across micro-batch splits.
  * Counts commute, so the time-tercile split (some windows span a
  * boundary) is the load-bearing case; the far-future mover closes
  * every real window and its own row is filtered by name.
  */
class StreamNativeSumSpec extends SparkSpec {

  private type Row6 = (String, Long, Long, Long, Long, Long)

  private def streamNs(dir: String, sinkName: String): Set[Row6] = {
    import spark.implicits._
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id").as("series"),
      col("ts"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "series")))
    val inDir = tmpDir(s"${sinkName}_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(inDir)
    writeChunk(1)
    val stream = spark.readStream.schema(samples.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingNativeSum(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", 0L, maxUs + 86400L * 1000000L, 1.0))
        .toDF("name", "series", "ts_us", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName).collect()
      .filter(_.getAs[String]("name") != "__mover")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("w_start"),
        r.getAs[Long]("sgn"), r.getAs[Long]("bucket_idx"),
        r.getAs[Long]("cnt"), r.getAs[Long]("n_series")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some bucket")
    rows.toSet
  }

  private def batchNs(dir: String): Set[Row6] =
    NativeHistogram.qNativeSum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("streamed native-histogram sum == q_native_sum on the real " +
      "fixture across micro-batches (counts AND series counts exact)") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchNs(sf)
    assert(batch.nonEmpty, "fixture must populate native buckets")
    assert(streamNs(sf, "stream_ns_fixture") == batch)
  }

  test("cross-boundary merge synthetic: one bucket fed by two series " +
      "from different micro-batches merges counts and n_series") {
    import spark.implicits._
    val t0 = 1704067200L
    val dir = tmpDir("stream_ns_synth")
    // same 1h window, same bucket (cents 700..799 → idx0 10), two
    // series delivered in DIFFERENT terciles; plus a zero-value and a
    // negative observation to pin the sgn split
    val rows = Seq(
      (1L, "lat", 7L, t0 + 100L, 7.10),
      (2L, "lat", 8L, t0 + 200L, 7.30),
      (3L, "lat", 7L, t0 + 2000L, 7.90),
      (4L, "lat", 9L, t0 + 300L, 0.0),
      (5L, "lat", 9L, t0 + 400L, -7.20))
    rows.toDF("event_id", "event_type", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_micros(col("ts_s") * 1000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchNs(dir)
    assert(batch == Set(
      ("lat", t0 / 3600L * 3600L, 1L, 10L, 3L, 2L),  // 710,730,790 merged
      ("lat", t0 / 3600L * 3600L, 0L, 0L, 1L, 1L),   // the zero bucket
      ("lat", t0 / 3600L * 3600L, -1L, 10L, 1L, 1L)), // the negative side
      s"batch synthetic mismatch: $batch")
    assert(streamNs(dir, "stream_ns_synth_sink") == batch)
  }
}
