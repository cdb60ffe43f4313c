package graft

import graft.operators.MetricsEtl
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming staleness-marker parity: the per-series single-long-state
  * timeout kernel must emit VALUE-IDENTICAL rows to the batch
  * `q_stale_markers` lead() synthesis on the same samples, across
  * micro-batch splits. Both marker paths are exercised: the fixture's
  * sparse series close most gaps via the ROWS path (a newer sample
  * reveals the gap) and the far-future mover closes every series'
  * FINAL marker via the TIMEOUT path — which is exactly the batch
  * operator's `lead IS NULL` row, so streamed == batch without any
  * filtering beyond the mover itself. A dense synthetic pins the
  * horizon boundary (a gap of exactly the horizon does NOT mark; one
  * µs past it does) and post-gap resumption (state re-created after
  * the timeout removed it — no duplicate, no missed marker).
  */
class StreamStaleSpec extends SparkSpec {

  private type Row4 = (String, Long, Long, Long)

  private def streamStale(dir: String, sinkName: String): Set[Row4] = {
    import spark.implicits._
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"),
      col("user_id").cast("string").as("series"), col("ts"))
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
    val q = MetricsStream.streamingStaleMarkers(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      // the mover must advance the watermark past every series'
      // last + horizon + delay so all FINAL markers fire
      Seq(("__mover", "0", maxUs + 86400L * 1000000L))
        .toDF("name", "series", "ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName).collect()
      .filter(_.getAs[String]("name") != "__mover")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("last_ts_s"), r.getAs[Long]("marker_ts_s")))
    assert(rows.length == rows.toSet.size, "duplicate marker emission")
    rows.toSet
  }

  private def batchStale(dir: String): Set[Row4] =
    MetricsEtl.qStaleMarkers(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("last_ts_s"), r.getAs[Long]("marker_ts_s"))).toSet

  test("streamed stale markers == q_stale_markers on the real fixture " +
      "across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchStale(sf)
    assert(batch.nonEmpty, "fixture must yield staleness gaps")
    assert(streamStale(sf, "stream_stale_fixture") == batch)
  }

  test("horizon boundary + post-gap resumption synthetic") {
    import spark.implicits._
    val t0 = 1704067200L
    val dir = tmpDir("stream_stale_synth")
    // one series: samples at t0, t0+3600 (gap EXACTLY the horizon —
    // strictly-greater rule, no marker), then a 7201 s gap (> horizon:
    // marker at the pre-gap sample), then a tight resumption
    val rows = Seq(
      (1L, "lat", 7L, t0, 1.0),
      (2L, "lat", 7L, t0 + 3600L, 1.0),          // gap == horizon: no marker
      (3L, "lat", 7L, t0 + 3600L + 7201L, 1.0),  // gap 7201 > horizon: marker
      (4L, "lat", 7L, t0 + 3600L + 7261L, 1.0))  // tight follow-up: no marker
    rows.toDF("event_id", "event_type", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_micros(col("ts_s") * 1000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchStale(dir)
    val lastS = t0 + 3600L + 7261L
    assert(batch == Set(
      ("lat", 7L, t0 + 3600L, t0 + 7200L),       // the in-history gap
      ("lat", 7L, lastS, lastS + 3600L)),        // the final marker
      s"batch synthetic mismatch: $batch")
    assert(streamStale(dir, "stream_stale_synth_sink") == batch)
  }
}
