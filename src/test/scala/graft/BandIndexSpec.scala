package graft

import graft.index.{BandIndex, BandMeta}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted band-bucket lifecycle (VERDICT_r10 item 2): build
  * once, probe many — the batch incremental near-dup contract. The
  * load-bearing test is the REUSE one: two consecutive shard ingests
  * (ensure→probe, twice) must pay exactly ONE base build, because at
  * 100 TB rebuilding the base buckets per ingest is the difference
  * between work ∝ shard and work ∝ corpus.
  */
class BandIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("consecutive shard ingests REUSE the persisted base buckets: " +
      "two ensure→probe rounds pay exactly one build, identical rows") {
    val root = tmpDir("band_idx")
    val before = BandIndex.builds.get()
    val r1 = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root)).collect().toSet
    assert(BandIndex.builds.get() == before + 1, "first ensure builds")
    val r2 = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root)).collect().toSet
    assert(BandIndex.builds.get() == before + 1,
      "second ingest must NOT rebuild the base buckets (work ∝ shard)")
    assert(r1 == r2 && r1.nonEmpty,
      "the served probe must be deterministic and non-empty")
  }

  test("probe == the from-scratch in-session twin (persisted buckets " +
      "and signatures carry the full pairing + verify state)") {
    val root = tmpDir("band_idx_twin")
    val served = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    // in-session twin: same split, same banding, same cap, no parquet
    val sigs = Dedup.minhashSigWithSource(spark, dir)
    val shard = Dedup.bandedSig(
      sigs.filter(col("source") === "src0").drop("source"))
    val base = Dedup.bandedSig(
      sigs.filter(col("source") =!= "src0").drop("source"))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band_id", "band_hash")))
      .filter(col("bsz") <= Dedup.BandBucketCap).drop("bsz")
      .withColumnRenamed("doc_id", "base_doc")
    val cand = shard.join(base, Seq("band_id", "band_hash"))
      .groupBy("doc_id", "base_doc").agg(count(lit(1)).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(served.keySet == cand.keySet,
      "candidate pair sets must match the in-session banding")
    served.foreach { case (k, (nb, m, dup)) =>
      assert(nb == cand(k), s"shared-band count diverged at $k")
      assert(m >= 0 && m <= 16 && (dup == 1) == (m >= 8),
        s"verify verdict inconsistent at $k: matches=$m dup=$dup")
    }
  }

  test("append == rebuild (r11): settling the ingested shard into the " +
      "index equals a from-scratch build over the widened base — " +
      "banding is content-pure, so no drift is possible") {
    val rootA = tmpDir("band_idx_append")
    val rootB = tmpDir("band_idx_rebuild")
    // A: build excluding src0, then APPEND src0 (next shard = a
    // source that does not exist yet → settled set = all docs)
    BandIndex.write(spark, dir, rootA, shardSource = "src0")
    BandIndex.append(spark, dir, rootA, nextShardSource = "__future__")
    // B: one-shot build with the same settled set
    BandIndex.write(spark, dir, rootB, shardSource = "__future__")
    def snap(root: String) = (
      spark.read.parquet(s"$root/buckets").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      spark.read.parquet(s"$root/sizes").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      spark.read.parquet(s"$root/sigs").count())
    val (ba, sa, na) = snap(rootA)
    val (bb, sb, nb) = snap(rootB)
    assert(ba == bb, "appended postings must equal the rebuild's")
    assert(sa == sb, "merged sidecar sizes must equal the rebuild's")
    assert(na == nb)
    // the appended index now VALIDATES for the next shard: ensure must
    // not rebuild it
    val before = BandIndex.builds.get()
    BandIndex.ensure(spark, dir, rootA, shardSource = "__future__")
    assert(BandIndex.builds.get() == before,
      "an appended index must validate as-is for the next shard")
    // and probing a NONEXISTENT next shard yields no candidates
    assert(BandIndex.probe(spark, dir, rootA, "__future__").count() == 0)
  }

  test("sidecar crash-repair (r12, VERDICT_r11 item 4): a deleted " +
      "`sizes/` heals from the persisted postings — builds stay flat, " +
      "probe verdicts unchanged") {
    val root = tmpDir("band_idx_repair")
    val served = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root)).collect().toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/sizes"), true))
    val (b0, r0) = (BandIndex.builds.get(), BandIndex.sizeRepairs.get())
    val healed = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root)).collect().toSet
    assert(BandIndex.builds.get() == b0,
      "repairing the sidecar must NOT rebuild the corpus index")
    assert(BandIndex.sizeRepairs.get() == r0 + 1,
      "the sidecar must be recomputed from buckets/")
    assert(healed == served && healed.nonEmpty,
      "post-repair probe must serve the identical verdicts")
  }

  test("append REFUSES an already-landed next shard (r12, ADVICE_r11): " +
      "its docs sit inside the persisted base, so probing it would " +
      "self-pair") {
    val root = tmpDir("band_idx_selfpair")
    BandIndex.write(spark, dir, root, shardSource = "src0")
    val e = intercept[IllegalArgumentException] {
      BandIndex.append(spark, dir, root, nextShardSource = "src1")
    }
    assert(e.getMessage.contains("self-pair"))
  }

  test("half-appended index reads as STALE (r12): postings landed but " +
      "the meta was never rewritten (the append crash window) → the " +
      "v3 nPostings pin forces a rebuild instead of serving self-pairs") {
    import spark.implicits._
    val root = tmpDir("band_idx_halfappend")
    BandIndex.ensure(spark, dir, root)
    // simulate the crash: extra postings land, meta stays
    Seq((0L, 12345L, 999999L)).toDF("band_id", "band_hash", "doc_id")
      .write.mode("append").parquet(s"$root/buckets")
    val before = BandIndex.builds.get()
    BandIndex.ensure(spark, dir, root)
    assert(BandIndex.builds.get() == before + 1,
      "a postings/meta count mismatch must force a rebuild")
  }

  test("corrupt buckets/ with intact meta reads as STALE and rebuilds " +
      "instead of crashing ensure (ADVICE_r12): the validity guard " +
      "tolerates an unreadable postings dir like readMeta tolerates " +
      "an unreadable meta") {
    val root = tmpDir("band_idx_corrupt")
    BandIndex.ensure(spark, dir, root)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // partial deletion: meta/ survives, buckets/ is gone — the guard's
    // postingCount read throws; that must mean "stale", never a crash
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/buckets"), true))
    val before = BandIndex.builds.get()
    val served = BandIndex.probe(spark, dir,
      BandIndex.ensure(spark, dir, root))
    assert(BandIndex.builds.get() == before + 1,
      "an unreadable buckets/ must force a rebuild")
    assert(served.count() > 0, "the rebuilt index must serve verdicts")
  }

  test("baseFingerprint covers ALL 16 signature components (r12, " +
      "ADVICE_r11): a regeneration that preserves (doc_id, s0, s15) " +
      "but moves s1 must move the fingerprint") {
    val cols = "doc_id" +: (0 until 16).map(i => s"s$i")
    val base = Seq(Seq(1L, 10L, 11L) ++ (2 until 16).map(i => 100L + i))
      .map(s => org.apache.spark.sql.Row.fromSeq(s))
    val schema = org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.LongType)))
    val a = spark.createDataFrame(
      spark.sparkContext.parallelize(base), schema)
    val moved = Seq(Seq(1L, 10L, 999L) ++ (2 until 16).map(i => 100L + i))
      .map(s => org.apache.spark.sql.Row.fromSeq(s))
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(moved), schema)
    assert(BandIndex.baseFingerprint(a) != BandIndex.baseFingerprint(b),
      "an s1-only change must be visible to the staleness check")
  }

  test("staleness: a base regenerated in place (content fingerprint " +
      "moves) rebuilds; a newer-format root is never clobbered") {
    import spark.implicits._
    val root = tmpDir("band_idx_stale")
    BandIndex.ensure(spark, dir, root)
    val meta = spark.read.parquet(s"$root/meta").as[BandMeta].head()
    // poison the fingerprint: ensure must detect and rebuild
    Seq(meta.copy(baseFp = meta.baseFp ^ 1L)).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta")
    val before = BandIndex.builds.get()
    BandIndex.ensure(spark, dir, root)
    assert(BandIndex.builds.get() == before + 1,
      "a moved content fingerprint must force a rebuild")
    // claim a newer format: ensure must refuse, not overwrite
    Seq(meta.copy(formatVersion = BandIndex.FormatVersion + 1)).toDS()
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val e = intercept[IllegalStateException] {
      BandIndex.ensure(spark, dir, root)
    }
    assert(e.getMessage.contains("refusing to overwrite"))
  }
}
