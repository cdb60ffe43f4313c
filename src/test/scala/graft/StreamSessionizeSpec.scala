package graft

import graft.operators.Olap
import graft.streaming.MetricsStream
import org.apache.spark.sql.functions._

/** Streaming sessionization parity: the `session_window`-based
  * [[MetricsStream.streamingSessionize]] must emit the SAME session
  * partition as the batch `q_sessionize` (same (t_start, t_end,
  * n_events, session_value) per user; the batch ordinal session_id is
  * cross-history by construction and excluded) — no matter how the
  * stream is split into micro-batches, including sessions whose events
  * span a split (the time-tercile delivery below guarantees some do).
  * A far-future mover advances the watermark past every real
  * session's end + gap so all of them close; the mover's own session
  * never closes and is excluded by its sentinel user id.
  */
class StreamSessionizeSpec extends SparkSpec {

  private type Sess = (Long, Long, Long, Long, Double)

  private def streamed(dir: String, sinkName: String): Set[Sess] = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val terc = events.withColumn("b", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val inDir = tmpDir(s"${sinkName}_in")
    def writeChunk(b: Int): Unit =
      terc.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(inDir)
    writeChunk(1)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingSessionize(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", tmpDir(s"${sinkName}_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      writeChunk(2); q.processAllAvailable()
      writeChunk(3); q.processAllAvailable()
      Seq((-1L, maxUs + 86400L * 1000000L, -1L, 0.0))
        .toDF("user_id", "ts_us", "event_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .select("user_id", "ts", "event_id", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sinkName)
      .filter(col("user_id") >= 0).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t_start"),
        r.getAs[Long]("t_end"), r.getAs[Long]("n_events"),
        r.getAs[Double]("session_value")))
    assert(rows.length == rows.toSet.size,
      "duplicate emission for some session")
    rows.toSet
  }

  private def batch(dir: String): Set[Sess] =
    Olap.qSessionize(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t_start"),
        r.getAs[Long]("t_end"), r.getAs[Long]("n_events"),
        r.getAs[Double]("session_value"))).toSet

  test("streamed sessionize == q_sessionize on the real fixture across micro-batches") {
    val sf = "/root/testdata/sf0.01"
    val b = batch(sf)
    assert(b.nonEmpty, "fixture must yield at least one session")
    val s = streamed(sf, "stream_sessionize_fixture")
    assert(s == b)
  }

  test("an exactly-gap-width gap merges, matching the batch > rule") {
    import spark.implicits._
    // two events exactly 1800 s apart: batch keeps them in ONE session
    // (split is strictly >); the +1 µs streaming gap must agree. A third
    // event at 1800 s + 1 µs after the second splits in both.
    val inDir = tmpDir("sess_boundary_in")
    val base = 1705300000000000L
    Seq(
      (7L, base, 1L, 1.0),
      (7L, base + 1800L * 1000000L, 2L, 2.0),
      (7L, base + 3600L * 1000000L + 1L, 3L, 4.0),
      (-1L, base + 86400L * 1000000L, 4L, 0.0))
      .toDF("user_id", "ts_us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("user_id", "ts", "event_id", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = MetricsStream.streamingSessionize(stream)
      .writeStream.format("memory").queryName("sess_boundary")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sess_boundary_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sess_boundary")
      .filter(col("user_id") >= 0).collect()
      .map(r => (r.getAs[Long]("t_start"), r.getAs[Long]("t_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
      .toSet
    assert(rows == Set(
      (base, base + 1800L * 1000000L, 2L, 3.0),
      (base + 3600L * 1000000L + 1L, base + 3600L * 1000000L + 1L, 1L, 4.0)))
  }
}
