package graft

import graft.operators.Dedup
import graft.streaming.DedupStream
import org.apache.spark.sql.functions._

/** Parity + state semantics for the STREAMING near-dup path
  * (`graft.streaming.DedupStream`): the streamed candidate-pair set
  * must equal the batch `q_minhash_lsh` pair set on the same corpus —
  * regardless of how documents are split across micro-batches — and
  * re-delivered documents must not re-pair.
  */
class StreamDedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private def batchPairs: Set[(Long, Long)] =
    Dedup.qMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed candidate pairs == batch q_minhash_lsh across micro-batches") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val streamDir = tmpDir("dedup_stream_in")
    // three chunks by doc_id mod 3 → three micro-batches via
    // maxFilesPerTrigger=1; near-dup pairs must be found ACROSS chunks,
    // which exercises cross-micro-batch bucket state
    (0 until 3).foreach { m =>
      docs.filter(pmod(col("doc_id"), lit(3)) === m)
        .coalesce(1).write.mode("append").parquet(streamDir)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = DedupStream.candidatePairs(stream)
      .writeStream.format("memory").queryName("stream_dedup_pairs")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dedup_stream_ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()

    val raw = spark.table("stream_dedup_pairs")
      .select("docA", "docB", "bandId").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // within one band a pair is emitted exactly once
    assert(raw.size == raw.distinct.size)
    val streamed = raw.map(t => (t._1, t._2)).toSet
    val batch = batchPairs
    assert(batch.nonEmpty, "fixture must contain planted near-dup pairs")
    assert(streamed == batch)
    // at least one pair spans two micro-batches — the state actually
    // carried members across triggers
    assert(streamed.exists { case (a, b) => a % 3 != b % 3 })
  }

  test("re-delivered documents do not re-pair (ingest retry idempotency)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val streamDir = tmpDir("dedup_stream_in2")
    docs.coalesce(1).write.mode("append").parquet(streamDir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = DedupStream.candidatePairs(stream)
      .writeStream.format("memory").queryName("stream_dedup_pairs2")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dedup_stream_ckpt2"))
      .start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("stream_dedup_pairs2").count()
      // the overlap re-delivers the whole corpus in a later micro-batch
      docs.coalesce(1).write.mode("append").parquet(streamDir)
      q.processAllAvailable()
      val n2 = spark.table("stream_dedup_pairs2").count()
      assert(n1 > 0)
      assert(n2 == n1, "re-delivery must emit zero new pairs")
    } finally q.stop()
  }
}
