package graft

import graft.index.BandIndex
import graft.operators.Dedup
import graft.streaming.ShardIngestStream
import org.apache.spark.sql.functions._

/** Parity for the STREAMING shard ingest (r12, VERDICT_r11 item 5):
  * a shard delivered as a stream must produce EXACTLY the batch
  * `BandIndex.probe` verdicts — for any micro-batch split — with zero
  * keyed streaming state (the settled corpus lives in the persisted
  * index, so state never grows with the base). Plus the kernel parity
  * that makes it true: the JVM signature frame == the relational
  * MinHash signature frame, row-exact.
  */
class StreamShardIngestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def shardDocs = Tables.documents(spark, dir)
    .filter(col("source") === Dedup.newShardSource)
    .select("doc_id", "text")

  test("JVM signature kernel == the relational MinHash frame, " +
      "row-exact (the equality the probe parity rests on)") {
    val jvm = ShardIngestStream.sigFrame(shardDocs).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    val rel = Dedup.minhashSigWithSource(spark, dir)
      .filter(col("source") === Dedup.newShardSource).drop("source")
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    assert(jvm.nonEmpty && jvm == rel,
      "kernel signatures must equal the batch frame component-wise")
  }

  test("NULL-text docs drop out of the kernel frame exactly like the " +
      "batch frame's SQL null semantics — never an NPE that kills the " +
      "stream (ADVICE_r12)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null),
      (3L, "x")).toDF("doc_id", "text")
    val got = ShardIngestStream.sigFrame(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L),
      "null text and <3-token docs must drop silently")
  }

  test("streamed shard verdicts == BandIndex.probe on the same shard, " +
      "across three micro-batches, with re-delivered docs idempotent") {
    val root = BandIndex.ensure(spark, dir, tmpDir("shard_stream_idx"))
    val batch = BandIndex.probe(spark, dir, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(batch.nonEmpty, "fixture must produce cross-shard near-dups")

    // three time-ordered chunks → three micro-batches; chunk 0 is
    // delivered TWICE (the re-delivery contract under test)
    val streamDir = tmpDir("shard_stream_in")
    (0 until 3).foreach { m =>
      shardDocs.filter(pmod(col("doc_id"), lit(3)) === m)
        .coalesce(1).write.mode("append").parquet(streamDir)
    }
    shardDocs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .coalesce(1).write.mode("append").parquet(streamDir)

    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[((Long, Long), (Long, Long, Int))]())
    val stream = spark.readStream.schema(shardDocs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = ShardIngestStream.run(stream, root,
      tmpDir("shard_stream_ckpt")) { verdicts =>
      verdicts.collect().foreach(r => collected.add(
        (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getInt(4))))
    }
    try q.processAllAvailable() finally q.stop()

    import scala.jdk.CollectionConverters._
    val rows = collected.asScala.toSeq
    // re-delivered docs re-emit IDENTICAL rows: grouping by pair key
    // leaves exactly one distinct verdict per key
    val byKey = rows.groupBy(_._1).map { case (k, vs) =>
      assert(vs.map(_._2).distinct.size == 1,
        s"re-delivery produced diverging verdicts at $k")
      k -> vs.head._2
    }
    assert(byKey == batch,
      "streamed verdict set must equal the batch probe row-exact")
    // verdicts span more than one micro-batch chunk (not every mod-3
    // class need carry a candidate at this SF, but parity across a
    // single chunk would prove nothing about the split)
    assert(byKey.keys.map(_._1 % 3).toSet.size > 1,
      "verdicts must span multiple micro-batches")
  }

  test("streamed keep/drop DECISIONS == DocPipeline.ingestShard across " +
      "micro-batches with re-delivery idempotent (r13, VERDICT_r12 " +
      "item 5 — the lifecycle used to stop at probe verdicts)") {
    import graft.index.FpIndex
    val bandRoot = BandIndex.ensure(spark, dir,
      tmpDir("shard_dec_band"))
    val fpRoot = FpIndex.ensure(spark, dir, tmpDir("shard_dec_fp"))
    // the batch rule on the SAME band index
    val (batchDecisions, summary) =
      graft.operators.DocPipeline.ingestShard(spark, dir, bandRoot)
    val batch = batchDecisions.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(batch.nonEmpty && summary.nKept < summary.nShardDocs,
      "fixture shard must carry both kept and dropped docs")

    val streamDir = tmpDir("shard_dec_in")
    (0 until 3).foreach { m =>
      shardDocs.filter(pmod(col("doc_id"), lit(3)) === m)
        .coalesce(1).write.mode("append").parquet(streamDir)
    }
    // chunk 1 delivered twice — re-delivery must re-emit identical rows
    shardDocs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .coalesce(1).write.mode("append").parquet(streamDir)
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, (Int, Int, Int))]())
    val stream = spark.readStream.schema(shardDocs.schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
    val q = ShardIngestStream.runDecisions(stream, bandRoot, fpRoot,
      tmpDir("shard_dec_ckpt")) { decisions =>
      decisions.collect().foreach(r => collected.add(
        r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))))
    }
    try q.processAllAvailable() finally q.stop()

    import scala.jdk.CollectionConverters._
    val byDoc = collected.asScala.toSeq.groupBy(_._1).map { case (k, vs) =>
      assert(vs.map(_._2).distinct.size == 1,
        s"re-delivery produced diverging decisions at doc $k")
      k -> vs.head._2
    }
    assert(byDoc == batch,
      "streamed decisions must equal the batch ingestShard rule " +
        "row-exact for this split")
    assert(byDoc.keys.map(_ % 3).toSet.size > 1,
      "decisions must span multiple micro-batches")
  }

  test("settle == the batch appends: after the shard stream drains, " +
      "both persisted tiers equal one-shot builds over the widened " +
      "base, and the NEXT shard's stream probes a base including " +
      "this one (r13)") {
    import graft.index.FpIndex
    val bandRoot = tmpDir("shard_settle_band")
    val fpRoot = tmpDir("shard_settle_fp")
    BandIndex.ensure(spark, dir, bandRoot)
    FpIndex.ensure(spark, dir, fpRoot)
    ShardIngestStream.settle(spark, dir, bandRoot, fpRoot, "__future__")
    // == one-shot builds with the widened settled set
    val bandRebuild = tmpDir("shard_settle_band2")
    val fpRebuild = tmpDir("shard_settle_fp2")
    BandIndex.write(spark, dir, bandRebuild, shardSource = "__future__")
    FpIndex.write(spark, dir, fpRebuild, shardSource = "__future__")
    def bandSnap(root: String) =
      spark.read.parquet(s"$root/buckets").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def fpSnap(root: String) =
      spark.read.parquet(s"$root/fps").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bandSnap(bandRoot) == bandSnap(bandRebuild),
      "settled band postings must equal the rebuild's")
    assert(fpSnap(fpRoot) == fpSnap(fpRebuild),
      "settled fps must equal the rebuild's")
    // the next shard's decisions now judge against a base that
    // includes src0: a doc re-delivered as "__future__" content equal
    // to a settled src0 doc must read exact_dup=1
    import spark.implicits._
    val settledDoc = Tables.documents(spark, dir)
      .filter(col("source") === "src0")
      .select(col("doc_id"), col("text")).limit(1).collect().head
    val nextBatch = Seq((900000L, settledDoc.getString(1)))
      .toDF("doc_id", "text")
    val dec = ShardIngestStream.decisionsBatch(nextBatch, bandRoot, fpRoot)
      .collect().map(r =>
        r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(dec(900000L)._1 == 1 && dec(900000L)._3 == 0,
      "a clone of a settled src0 doc must be an exact dup post-settle")
  }

  test("settle is retryable after a partial failure (r14, ADVICE_r13): " +
      "a crash between the two appends leaves one tier ahead — the " +
      "retry skips the already-landed tier instead of tripping its " +
      "next!=current guard and stranding the other tier a shard behind") {
    import graft.index.FpIndex
    val bandRoot = tmpDir("shard_resume_band")
    val fpRoot = tmpDir("shard_resume_fp")
    BandIndex.ensure(spark, dir, bandRoot)
    FpIndex.ensure(spark, dir, fpRoot)
    // simulate the crash window: band append landed, fp append did not
    BandIndex.append(spark, dir, bandRoot, "__future__")
    // the retry must complete the fp tier (and not throw on the band)
    ShardIngestStream.settle(spark, dir, bandRoot, fpRoot, "__future__")
    assert(FpIndex.readMeta(spark, fpRoot)
      .exists(_.shardSource == "__future__"),
      "the lagging fp tier must land on retry")
    assert(BandIndex.readMeta(spark, bandRoot)
      .exists(_.shardSource == "__future__"))
    // a second settle at the same target is a full no-op, not a crash
    ShardIngestStream.settle(spark, dir, bandRoot, fpRoot, "__future__")
    // settled state == one-shot rebuilds (the existing exactness bar)
    val fpRebuild = tmpDir("shard_resume_fp2")
    FpIndex.write(spark, dir, fpRebuild, shardSource = "__future__")
    def fpSnap(root: String) =
      spark.read.parquet(s"$root/fps").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpSnap(fpRoot) == fpSnap(fpRebuild),
      "resumed settle must leave the fp tier bit-equal to a rebuild")
  }
}
