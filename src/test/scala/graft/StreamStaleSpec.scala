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

  /** Deliver hand-scripted batches (one parquet file = one trigger)
    * and return the emitted marker set. `delay` must admit every
    * scripted arrival (the test constructs them in-watermark). */
  private def streamScripted(batches: Seq[Seq[(String, Long, Long)]],
      sinkName: String, delay: String): Set[Row4] = {
    import spark.implicits._
    val inDir = tmpDir(s"${sinkName}_in")
    val ckpt = tmpDir(s"${sinkName}_ckpt")
    def write(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("name", "series_l", "ts_us")
        .select(col("name"), col("series_l").cast("string").as("series"),
          timestamp_micros(col("ts_us")).as("ts"))
        .coalesce(1).write.mode("append").parquet(inDir)
    write(batches.head)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("series",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingStaleMarkers(stream, delay = delay)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      batches.tail.foreach { b => write(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(sinkName).collect()
      .filter(_.getAs[String]("name") != "__mover")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id"),
        r.getAs[Long]("last_ts_s"), r.getAs[Long]("marker_ts_s"))).toSet
  }

  test("out-of-order within-watermark arrival can NOT re-split an " +
      "already-observed gap (r11: gaps judged only from settled " +
      "samples — the r10 single-long state double-emitted here)") {
    val t0 = 1704067200L * 1000000L
    val m = 60L * 1000000L
    // series 9: samples at t0, t0+120m, t0+50m — the 120m sample
    // arrives FIRST (revealing an apparent 2 h gap at t0), then the
    // 50m sample arrives one trigger later, still inside the 2 h
    // watermark, SPLITTING that gap into 50m (no marker) + 70m
    // (marker at t0+50m). Batch truth: markers at t0+50m and the
    // final sample only — nothing at t0.
    val batches = Seq(
      Seq(("lat", 9L, t0)),
      Seq(("lat", 9L, t0 + 120L * m)),
      Seq(("lat", 9L, t0 + 50L * m)),
      // mover: a different series far in the future settles everything
      Seq(("__mover", 0L, t0 + 9999L * m)))
    val got = streamScripted(batches, "stream_stale_ooo", "2 hours")
    val expect = Set(
      ("lat", 9L, t0 / 1000000L + 50L * 60L,
        t0 / 1000000L + 50L * 60L + 3600L),
      ("lat", 9L, t0 / 1000000L + 120L * 60L,
        t0 / 1000000L + 120L * 60L + 3600L))
    assert(got == expect,
      s"out-of-order split mis-judged: got $got, expected $expect")
  }

  test("randomized deferred delivery (every sample shifted 0-2 " +
      "triggers late, all within watermark) stays row-exact vs batch") {
    import spark.implicits._
    // synthetic: 5 series, 40 samples each on a 25-minute cadence with
    // planted over-horizon gaps; horizon 1 h, delay 2 h, trigger
    // blocks of 1 h → a sample deferred ≤2 blocks is always within
    // watermark (ts ≥ blockStart ≥ wmAfter(block+2))
    val t0 = 1704067200L * 1000000L
    val hourUs = 3600L * 1000000L
    val rows = for {
      s <- 0 until 5
      i <- 0 until 40
    } yield {
      // plant a >1h hole per series by skipping a band of indices
      val skipFrom = 10 + 3 * s
      val idx = if (i >= skipFrom) i + 4 else i // 4×25 min = 100 min gap
      ("lat", s.toLong, t0 + idx * 25L * 60L * 1000000L)
    }
    val dir = tmpDir("stream_stale_rand")
    rows.zipWithIndex.map { case ((n, u, ts), j) =>
      (j.toLong, n, u, ts, 1.0, "{}")
    }.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchStale(dir)
    assert(batch.nonEmpty, "the planted holes must mark")
    // deterministic defer: block(ts) + (hash of (series, ts) mod 3)
    def block(ts: Long): Long = (ts - t0) / hourUs
    def defer(u: Long, ts: Long): Long =
      math.floorMod(java.util.Objects.hash(
        java.lang.Long.valueOf(u), java.lang.Long.valueOf(ts)), 3).toLong
    val maxB = rows.map(r => block(r._3) + defer(r._2, r._3)).max
    val batches = (0L to maxB).map { b =>
      rows.filter(r => block(r._3) + defer(r._2, r._3) == b)
    }.filter(_.nonEmpty) :+
      Seq(("__mover", 0L, t0 + 10000L * hourUs))
    val got = streamScripted(batches, "stream_stale_rand_sink", "2 hours")
    assert(got == batch,
      s"deferred delivery diverged: extra=${got -- batch} " +
        s"missing=${batch -- got}")
  }
}
