package graft

import graft.operators.MetricsEtl
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming classic-histogram quantile parity (VERDICT_r09 "missing"
  * item 3): the algebraic (name, window)-keyed bucket-count kernel
  * must emit VALUE-IDENTICAL rows to the batch `q_histogram_quantile`
  * recording rule on the same samples, no matter how the stream is
  * split into micro-batches — the time-tercile split guarantees some
  * windows' observations span a boundary, which is exactly the case
  * the algebraic state exists for (counts commute; no sort needed).
  * The far-future mover advances the watermark past every real window
  * so all of them close; its own single-observation window DOES emit a
  * quantile (any count ≥ 1 yields a CDF) so it is filtered by name,
  * like the downsample parity test. A synthetic pins the in-bucket
  * interpolation on a fractional rank and the +Inf-bucket collapse
  * (all observations above the highest finite bound).
  */
class StreamHistQuantileSpec extends SparkSpec {

  private type Row3 = (String, Long, Double)

  /** Stream `dir`'s events through streamingHistogramQuantile in 3
    * strictly-ordered time-tercile micro-batches + a watermark mover;
    * return the emitted row set (mover excluded). */
  private def streamHistQ(dir: String, sinkName: String): Set[Row3] = {
    import spark.implicits._
    val samples = Tables.events(spark, dir).select(
      col("event_type").as("name"), col("ts"), col("value"))
    val maxUs = samples.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = samples.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "value")))
    val inDir = tmpDir(s"${sinkName}_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(inDir)
    writeChunk(1)
    val stream = spark.readStream.schema(samples.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingHistogramQuantile(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq(("__mover", maxUs + 86400L * 1000000L, 1.0))
        .toDF("name", "ts_us", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("name", "ts", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName).collect()
      .filter(_.getAs[String]("name") != "__mover")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("w_start"),
        r.getAs[Double]("q90")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some window")
    rows.toSet
  }

  private def batchHistQ(dir: String): Set[Row3] =
    MetricsEtl.qHistogramQuantile(spark, dir).collect()
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("w_start"),
        r.getAs[Double]("q90"))).toSet

  test("streamed histogram_quantile == q_histogram_quantile on the " +
      "real fixture across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val batch = batchHistQ(sf)
    assert(batch.nonEmpty, "fixture must yield quantile windows")
    assert(streamHistQ(sf, "stream_histq_fixture") == batch)
  }

  test("interpolation synthetic: fractional rank inside a finite " +
      "bucket, and an all-overflow window collapsing to the +Inf " +
      "bucket's lower bound") {
    import spark.implicits._
    val t0 = 1704067200L // window-aligned (divisible by 3600)
    assert(t0 % 3600 == 0)
    val dir = tmpDir("stream_histq_synth")
    // window 1: 11 observations — buckets le1:3, le2:2, le5:3,
    // le10:2, Inf:1; total 11, rank 9.9 lands inside le10:
    // q90 = 5 + (10-5)·(9.9-8)/2 = 9.75
    val w1 = Seq(0.5, 0.8, 0.9, 1.5, 1.7, 3.0, 4.0, 2.2, 7.0, 9.9, 12.0)
      .zipWithIndex.map { case (v, i) => (900L + i, "lat", 7L, t0 + 60L * i, v) }
    // window 2: every observation above the highest finite bound —
    // the +Inf bucket is selected and collapses to lower = 0.0
    // (no finite bucket observed)
    val w2 = Seq(15.0, 20.0, 11.0)
      .zipWithIndex.map { case (v, i) => (950L + i, "lat", 7L, t0 + 3600L + 60L * i, v) }
    (w1 ++ w2).toDF("event_id", "event_type", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_micros(col("ts_s") * 1000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "event_type", "user_id", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = batchHistQ(dir)
    assert(batch == Set(("lat", t0, 9.75), ("lat", t0 + 3600L, 0.0)),
      s"batch synthetic mismatch: $batch")
    assert(streamHistQ(dir, "stream_histq_synth_sink") == batch)
  }
}
