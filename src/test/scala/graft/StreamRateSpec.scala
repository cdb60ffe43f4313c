package graft

import graft.operators.MetricsEtl
import graft.streaming.MetricsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PromQL rate() parity (VERDICT_r07 item 7): the
  * watermark-closed fMGWS rate must emit VALUE-IDENTICAL rows to the
  * batch `q_rate` operator on the same samples, no matter how the
  * stream is split into micro-batches — including windows whose
  * samples span a micro-batch boundary (the time-tercile split below
  * guarantees some do). A far-future mover advances the watermark past
  * every real window so all of them close; its own single-sample
  * window emits nothing in either engine (rate needs ≥2 samples).
  * The real fixture is sparse (few windows hold ≥2 samples), so a
  * dense synthetic counter WITH RESETS pins the delta/reset kernel and
  * the fixture pins the end-to-end path.
  */
class StreamRateSpec extends SparkSpec {

  /** Stream `dir`'s events through streamingRate in 3 strictly-ordered
    * time-tercile micro-batches + a watermark mover; return the emitted
    * row set. */
  private def streamRate(dir: String, sinkName: String): Set[(String, String, Long, Double)] = {
    import spark.implicits._
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"),
      col("user_id").cast("string").as("series"),
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
    val q = MetricsStream.streamingRate(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", "0", maxUs + 86400L * 1000000L, -1L, 1.0))
        .toDF("name", "series", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("series"),
        r.getAs[Long]("w_start"), r.getAs[Double]("rate")))
    assert(rows.length == rows.toSet.size, "duplicate emission for some window")
    rows.toSet
  }

  private def batchRate(dir: String): Set[(String, String, Long, Double)] =
    MetricsEtl.qRate(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id").toString,
        r.getAs[Long]("w_start"), r.getAs[Double]("rate"))).toSet

  test("streamed rate() == q_rate on the real fixture across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchRate(sf)
    assert(batch.nonEmpty, "fixture must yield at least one rate window")
    assert(streamRate(sf, "stream_rate_fixture") == batch)
  }

  test("rate state survives a checkpoint RESTART (separate queries, shared checkpoint)") {
    import spark.implicits._
    // same dense fixture shape as below, but delivered across TWO
    // SEPARATE StreamingQuery lifetimes sharing one checkpoint: the
    // buffered per-window state must be restored by the second query,
    // or windows spanning the restart emit wrong rates
    val t0 = 1704067200L
    val dir = tmpDir("stream_rate_restart")
    val rows = for {
      (name, user) <- Seq(("req", 1L), ("err", 2L)); i <- 0 until 60
    } yield (user * 1000 + i, name, user, (t0 + 20L * i) * 1000000L,
      (i * 7 % 101) / 2.0, "{}")
    rows.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))
    val inDir = tmpDir("stream_rate_restart_in")
    val ckpt = tmpDir("stream_rate_restart_ckpt")
    val outDir = tmpDir("stream_rate_restart_out")
    def runOnce(): Unit = {
      val q = MetricsStream.streamingRate(
          spark.readStream.schema(samples.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[MetricsStream.RateRow], _: Long) =>
            b.write.mode("append").parquet(outDir); ()
        }.start()
      q.awaitTermination()
    }
    // first half of every window arrives before the restart
    val half = samples.withColumn("b",
      ntile(2).over(org.apache.spark.sql.expressions.Window
        .orderBy("ts", "event_id")))
    half.filter(col("b") === 1).drop("b").coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()
    half.filter(col("b") === 2).drop("b").coalesce(1)
      .write.mode("append").parquet(inDir)
    Seq(("__mover", "0", (t0 + 200000L) * 1000000L, -1L, 1.0))
      .toDF("name", "series", "ts_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("name", "series", "ts", "event_id", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    runOnce()
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("series"),
        r.getAs[Long]("w_start"), r.getAs[Double]("rate"))).toSet
    val batch = batchRate(dir)
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"restart broke parity: missing ${(batch -- streamed).take(3)}, " +
        s"extra ${(streamed -- batch).take(3)}")
  }

  test("streamed rate() == q_rate on a dense counter with resets (windows span batches)") {
    import spark.implicits._
    // 3 series × 6 aligned 5m windows, a sample every 20 s, value
    // pattern (i*13 mod 211)/2 → frequent counter RESETS inside and at
    // window edges — the delta/reset kernel has real work in every
    // window, unlike the sparse fixture
    val t0 = 1704067200L
    val dir = tmpDir("stream_rate_dense")
    val rows = for {
      (name, user) <- Seq(("req", 1L), ("req", 2L), ("err", 1L))
      i <- 0 until 90
    } yield (name.hashCode.toLong * 1000 + user * 90 + i, name, user,
      (t0 + 20L * i) * 1000000L, (i * 13 % 211) / 2.0, "{}")
    rows.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchRate(dir)
    assert(batch.size == 18, s"3 series x 6 windows expected: ${batch.size}")
    val streamed = streamRate(dir, "stream_rate_dense_out")
    assert(streamed == batch,
      s"streamed\\batch: ${(streamed -- batch).take(3)}; " +
        s"batch\\streamed: ${(batch -- streamed).take(3)}")
  }

  test("streamed increase() == q_increase (cross-window carry, resets at window edges)") {
    import spark.implicits._
    // 2 series × ~4.4 aligned 1h windows, a sample every 150 s with
    // frequent resets — every window's first delta reaches back to the
    // PREVIOUS window's last sample (the carry the per-series state
    // exists for), and the stream delivers three time chunks so open
    // windows span micro-batches
    val t0 = 1704067200L
    val dir = tmpDir("stream_inc_dense")
    val rows = for {
      (name, user) <- Seq(("req", 1L), ("err", 2L)); i <- 0 until 107
    } yield (user * 1000 + i, name, user, (t0 + 150L * i) * 1000000L,
      (i * 17 % 241) / 2.0, "{}")
    rows.toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val inDir = tmpDir("stream_inc_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b").coalesce(1)
        .write.mode("append").parquet(inDir)
    writeChunk(1)
    val q = MetricsStream.streamingIncrease(
        spark.readStream.schema(samples.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir))
      .writeStream.format("memory").queryName("stream_inc_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("stream_inc_ckpt")).start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", "0", maxUs + 86400L * 1000000L, -1L, 1.0))
        .toDF("name", "series", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_inc_out").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("series"),
        r.getAs[Long]("w_start"), r.getAs[Double]("rate"))).toSet
    val batch = MetricsEtl.qIncrease(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("user_id").toString,
        r.getAs[Long]("w_start"), r.getAs[Double]("increase"))).toSet
    assert(batch.size >= 8, s"multi-window fixture expected: ${batch.size}")
    assert(streamed == batch,
      s"streamed\\batch: ${(streamed -- batch).take(3)}; " +
        s"batch\\streamed: ${(batch -- streamed).take(3)}")
  }

  test("streamed recording rule sum by(name)(rate()) == q_sum_rate " +
      "across micro-batches, POSTed to the ClickHouse sink (r9)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val samples = Tables.events(spark, sf).select(
      col("event_type").as("name"),
      col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val inDir = tmpDir("stream_sumrate_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b").coalesce(1)
        .write.mode("append").parquet(inDir)
    writeChunk(1)
    val q = MetricsStream.streamingSumRate(
        spark.readStream.schema(samples.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir))
      .writeStream.format("memory").queryName("stream_sumrate_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("stream_sumrate_ckpt")).start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", "0", maxUs + 86400L * 1000000L, -1L, 1.0))
        .toDF("name", "series", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_sumrate_out").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("w_start"),
        r.getAs[Long]("n_series"), r.getAs[Long]("rate_x1e6"))).toSet
    val batch = MetricsEtl.qSumRate(spark, sf).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("w_start"),
        r.getAs[Long]("n_series"), r.getAs[Long]("rate_x1e6"))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed\\batch: ${(streamed -- batch).take(3)}; " +
        s"batch\\streamed: ${(batch -- streamed).take(3)}")

    // the SINK half: replay the same rule into the recording-table
    // writer against a stub ClickHouse — the derived rows must arrive
    // as one CREATE TABLE plus TabSeparated INSERT bodies that parse
    // back to exactly the batch rows
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val ch = new graft.sinks.ClickHouseHttpClient(
        graft.config.ClickHouseSettings(
          s"http://127.0.0.1:${server.getAddress.getPort}"),
        new graft.logging.StructuredLogger("test", "CRITICAL",
          new java.io.PrintStream(new java.io.ByteArrayOutputStream()),
          new java.io.PrintStream(new java.io.ByteArrayOutputStream())))
      val sq = MetricsStream.sumRateToClickHouse(
        MetricsStream.streamingSumRate(
          spark.readStream.schema(samples.schema).parquet(inDir)),
        tmpDir("stream_sumrate_ch_ckpt"), ch)
      sq.awaitTermination()
      val all = bodies.toArray(Array.empty[String])
      assert(all.exists(_.contains("CREATE TABLE IF NOT EXISTS")),
        "sink must bootstrap the recording table")
      val posted = all.filter(_.startsWith("INSERT INTO"))
        .flatMap(_.split("\n").drop(1))
        .map { line =>
          val f = line.split("\t")
          (f(0), f(1).toLong, f(2).toLong, f(3).toLong)
        }.toSet
      assert(posted == batch,
        s"posted rows must be exactly the batch rows: " +
          s"missing ${(batch -- posted).take(3)}, extra ${(posted -- batch).take(3)}")
    } finally server.stop(0)
  }

  test("increase() idle expiry drops the carry after the horizon — a " +
      "resumed series starts fresh; within the horizon it bridges (r9)") {
    import spark.implicits._
    val t0 = 1704067200L
    val dir = tmpDir("stream_inc_expiry")
    // window A (3 samples, inc 2.00), 5h silence, window B (3 samples,
    // in-window inc 5.00; the A.last->B.first bridge adds 7.00)
    val rows = Seq(
      (1L, "req", 1L, t0 + 0L, 1.0), (2L, "req", 1L, t0 + 600L, 2.0),
      (3L, "req", 1L, t0 + 1200L, 3.0),
      (4L, "req", 1L, t0 + 21600L, 10.0), (5L, "req", 1L, t0 + 22200L, 12.0),
      (6L, "req", 1L, t0 + 22800L, 15.0))
    rows.map { case (id, n, u, t, v) => (id, n, u, t * 1000000L, v, "{}") }
      .toDF("event_id", "event_type", "user_id", "ts_us", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))

    def run(tag: String, idleWindows: Int): Set[(Long, Double)] = {
      val inDir = tmpDir(s"${tag}_in")
      def mover(n: Int, tSec: Long): Unit =
        Seq((s"__m$n", "0", tSec * 1000000L, -100L - n, 1.0))
          .toDF("name", "series", "ts_us", "event_id", "value")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .select("name", "series", "ts", "event_id", "value")
          .coalesce(1).write.mode("append").parquet(inDir)
      samples.filter(col("event_id") <= 3).coalesce(1)
        .write.mode("append").parquet(inDir)
      val q = MetricsStream.streamingIncrease(
          spark.readStream.schema(samples.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir),
          idleExpireWindows = idleWindows)
        .writeStream.format("memory").queryName(tag).outputMode("append")
        .option("checkpointLocation", tmpDir(s"${tag}_ckpt")).start()
      try {
        q.processAllAvailable()
        // wm -> t0+7200: closes window A, schedules the idle expiry
        mover(1, t0 + 7800L); q.processAllAvailable()
        // wm -> t0+18000: past A's expiry (t0+7200 + 1*3600) when
        // idleWindows = 1 — the carry drops; far below it at 100
        mover(2, t0 + 18600L); q.processAllAvailable()
        samples.filter(col("event_id") > 3).coalesce(1)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
        mover(3, t0 + 72000L); q.processAllAvailable()
      } finally q.stop()
      spark.table(tag).collect()
        .filter(_.getAs[String]("name") == "req")
        .map(r => (r.getAs[Long]("w_start"), r.getAs[Double]("rate"))).toSet
    }

    val batch = MetricsEtl.qIncrease(spark, dir).collect()
      .filter(_.getAs[String]("name") == "req")
      .map(r => (r.getAs[Long]("w_start"), r.getAs[Double]("increase"))).toSet
    assert(batch == Set((t0, 2.00), (t0 + 21600L, 12.00)),
      s"batch bridges the gap: $batch")
    // within the horizon: carry survives, streamed == batch (bridged)
    assert(run("stream_inc_keep", 100) == batch)
    // beyond the horizon: the expiry dropped the carry — window B
    // counts only its own deltas, the designed divergence
    assert(run("stream_inc_drop", 1) ==
      Set((t0, 2.00), (t0 + 21600L, 5.00)))
  }

  test("streamed delta() == q_delta and irate() == q_irate on the real fixture") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val samples = Tables.events(spark, sf).select(
      col("event_type").as("name"),
      col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    def runKernel(tag: String,
        mk: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.Dataset[MetricsStream.RateRow])
        : Set[(String, String, Long, Double)] = {
      val inDir = tmpDir(s"${tag}_in")
      samples.coalesce(1).write.mode("append").parquet(inDir)
      val q = mk(spark.readStream.schema(samples.schema).parquet(inDir))
        .writeStream.format("memory").queryName(tag).outputMode("append")
        .option("checkpointLocation", tmpDir(s"${tag}_ckpt")).start()
      try {
        q.processAllAvailable()
        Seq(("__mover", "0", maxUs + 86400L * 1000000L, -1L, 1.0))
          .toDF("name", "series", "ts_us", "event_id", "value")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .select("name", "series", "ts", "event_id", "value")
          .coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(tag).collect()
        .map(r => (r.getAs[String]("name"), r.getAs[String]("series"),
          r.getAs[Long]("w_start"), r.getAs[Double]("rate"))).toSet
    }
    def batchOf(df: org.apache.spark.sql.DataFrame, valueCol: String) =
      df.collect().map(r => (r.getAs[String]("name"),
        r.getAs[Long]("user_id").toString, r.getAs[Long]("w_start"),
        r.getAs[Double](valueCol))).toSet
    val deltaBatch = batchOf(MetricsEtl.qDelta(spark, sf), "delta")
    assert(deltaBatch.nonEmpty)
    assert(runKernel("stream_delta_out",
      MetricsStream.streamingDelta(_)) == deltaBatch)
    val irateBatch = batchOf(MetricsEtl.qIrate(spark, sf), "irate")
    assert(irateBatch.nonEmpty)
    assert(runKernel("stream_irate_out",
      MetricsStream.streamingIrate(_)) == irateBatch)
  }

  test("streamed downsample rollup == q_downsample across micro-batch splits") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val samples = Tables.events(spark, sf).select(
      col("event_type").as("name"),
      col("user_id").cast("string").as("series"),
      col("ts"), col("event_id"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    // time-tercile split so some 5m windows SPAN a micro-batch boundary
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val inDir = tmpDir("stream_ds_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(inDir)
    writeChunk(1)
    val q = MetricsStream.streamingDownsample(
        spark.readStream.schema(samples.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir))
      .writeStream.format("memory").queryName("stream_ds_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("stream_ds_ckpt")).start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", "0", maxUs + 86400L * 1000000L, -1L, 1.0))
        .toDF("name", "series", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "series", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_ds_out").collect()
      .filter(_.getAs[String]("name") != "__mover")
      .map(r => (r.getAs[String]("name"), r.getAs[String]("series"),
        r.getAs[Long]("w_start"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("min_cents"),
        r.getAs[Long]("max_cents"), r.getAs[Long]("first_cents"),
        r.getAs[Long]("last_cents")))
    assert(streamed.length == streamed.toSet.size,
      "duplicate emission for some window")
    val batch = MetricsEtl.qDownsample(spark, sf).collect()
      .map(r => (r.getAs[String]("name"),
        r.getAs[Long]("user_id").toString, r.getAs[Long]("w_start"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
        r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"),
        r.getAs[Long]("first_cents"), r.getAs[Long]("last_cents"))).toSet
    assert(batch.nonEmpty)
    // every window closed (the mover pushed the watermark past all of
    // them) — streamed is exactly the batch rollup, including n=1
    // single-sample blocks (first == last there by construction)
    assert(streamed.toSet == batch,
      s"rollup parity broke: missing ${(batch -- streamed.toSet).take(3)}, " +
        s"extra ${(streamed.toSet -- batch).take(3)}")
    assert(streamed.exists(r => r._4 == 1L),
      "fixture should contain single-sample blocks")
    assert(streamed.filter(_._4 == 1L).forall(r => r._8 == r._9))
  }

  test("recording-rule sink POSTs from the partitions, not the driver " +
      "(r13, VERDICT_r12 item 2): a multi-partition micro-batch lands " +
      "as multiple TabSeparated bodies that union to exactly the rows") {
    import spark.implicits._
    val rows = (1 to 12).map(i =>
      MetricsStream.SumRateRow(s"m$i", 1704067200L + i * 300L,
        i.toLong, i * 1000L)).toSet
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val conf = graft.config.ClickHouseSettings(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      MetricsStream.postSumRatePartitions(
        rows.toSeq.toDS().repartition(3), conf, "default.graft_sum_rate")
      val all = bodies.toArray(Array.empty[String])
        .filter(_.startsWith("INSERT INTO"))
      assert(all.length > 1,
        "a 3-partition batch must land as multiple per-partition posts")
      val posted = all.flatMap(_.split("\n").drop(1)).map { line =>
        val f = line.split("\t")
        MetricsStream.SumRateRow(f(0), f(1).toLong, f(2).toLong,
          f(3).toLong)
      }.toSet
      assert(posted == rows,
        "per-partition bodies must parse back to exactly the rows")
    } finally server.stop(0)
  }
}
