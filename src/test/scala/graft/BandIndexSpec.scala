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

  test("delete(): masked probe == an index rebuilt without the docs; " +
      "idempotent; refuses unknown ids; vacuum compacts with meta as " +
      "commit record and nPostings re-pinned (r13, VERDICT_r12 item 4)") {
    import spark.implicits._
    val root = tmpDir("band_idx_delete")
    BandIndex.ensure(spark, dir, root)
    val before = BandIndex.probe(spark, dir, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(before.nonEmpty)
    // retract two base docs that actually surface as candidates
    val dead = before.keySet.map(_._2).toSeq.sorted.take(2)
    assert(BandIndex.delete(spark, root, dead.toDF("doc_id")) == 2L)
    assert(BandIndex.delete(spark, root, dead.toDF("doc_id")) == 0L,
      "re-deleting the same ids must be a counted no-op")
    intercept[IllegalArgumentException] {
      BandIndex.delete(spark, root, Seq(999999999L).toDF("doc_id"))
    }
    val masked = BandIndex.probe(spark, dir, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(masked.keySet.forall { case (_, b) => !dead.contains(b) },
      "tombstoned base docs must never surface as candidates")
    // the exactness contract: == an index REBUILT over a corpus that
    // never contained the dead docs, probed with the same shard sigs
    val dir2 = tmpDir("band_idx_delete_corpus2")
    Tables.documents(spark, dir)
      .filter(!col("doc_id").isin(dead: _*))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val root2 = tmpDir("band_idx_delete_root2")
    BandIndex.ensure(spark, dir2, root2)
    val shardSig = Dedup.minhashSigWithSource(spark, dir)
      .filter(col("source") === "src0").drop("source")
    val rebuilt = BandIndex.probeSigs(spark, root2, shardSig).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(masked == rebuilt,
      "masked probe must equal the rebuilt-without index row-exact")
    // vacuum physically reclaims: postings shrink by the dead docs'
    // rows, meta re-pins nPostings (the commit record), tombstones
    // drop, probe unchanged; a second vacuum is a no-op
    val metaBefore = spark.read.parquet(s"$root/meta")
      .as[BandMeta].head()
    val meta = BandIndex.vacuum(spark, root)
    assert(meta.nPostings < metaBefore.nPostings,
      "vacuum must shrink the pinned posting count")
    assert(spark.read.parquet(s"$root/buckets").count() == meta.nPostings,
      "meta must pin the rewritten postings exactly")
    assert(!new java.io.File(s"$root/tombstones").exists,
      "vacuum must drop the tombstone set")
    val afterVacuum = BandIndex.probe(spark, dir, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(afterVacuum == masked, "vacuum must not change served verdicts")
    assert(BandIndex.vacuum(spark, root) == meta,
      "vacuum with nothing tombstoned is a no-op")
  }

  test("delete() re-admits a bucket that only the dead postings pushed " +
      "over the hot-bucket cap — the live-df exactness case a stale " +
      "sidecar read would miss (r13)") {
    import spark.implicits._
    // synthetic corpus: 10001 identical base docs saturate every band
    // bucket past BandBucketCap (10000) → the probe is blind; deleting
    // two brings live df to 9999 → candidates must appear
    val d = tmpDir("band_idx_readmit_corpus")
    val n = (Dedup.BandBucketCap + 1).toInt
    spark.range(n).select(col("id").as("doc_id"),
        lit("alpha beta gamma delta epsilon").as("text"),
        lit("base").as("source"))
      .union(spark.range(2).select((col("id") + n).as("doc_id"),
        lit("alpha beta gamma delta epsilon").as("text"),
        lit("src0").as("source")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val root = tmpDir("band_idx_readmit_root")
    BandIndex.ensure(spark, d, root)
    assert(BandIndex.probe(spark, d, root).count() == 0L,
      "every bucket sits over the cap — the saturated probe is blind")
    assert(BandIndex.delete(spark, root,
      Seq(0L, 1L).toDF("doc_id")) == 2L)
    val served = BandIndex.probe(spark, d, root)
    assert(served.count() == 2L * (n - 2),
      "live df 9999 <= cap must re-admit the bucket for both shard docs")
    assert(served.filter(col("base_doc") < 2).count() == 0L,
      "dead docs stay masked inside the re-admitted bucket")
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

  test("rebuild clears stale tombstones (r14, ADVICE_r13): delete -> " +
      "corpus regenerated in place -> ensure rebuilds -> probe must " +
      "include the reused ids") {
    import spark.implicits._
    val d = tmpDir("band_idx_regen_corpus")
    def writeCorpus(text: String): Unit =
      spark.range(10).select(col("id").as("doc_id"),
          lit(text).as("text"), lit("base").as("source"))
        .union(spark.range(1).select(lit(100L).as("doc_id"),
          lit(text).as("text"), lit("src0").as("source")))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    writeCorpus("alpha beta gamma delta epsilon")
    val root = tmpDir("band_idx_regen_root")
    BandIndex.ensure(spark, d, root)
    assert(BandIndex.delete(spark, root, Seq(0L, 1L).toDF("doc_id")) == 2L)
    assert(BandIndex.probe(spark, d, root)
      .filter(col("base_doc") < 2).count() == 0L,
      "the tombstoned ids are masked before the regen")
    // regenerate IN PLACE: the common 0..n id layout reuses the ids,
    // content moves, so ensure() rebuilds — the rebuild must START
    // from a clean tombstone mask or the reused ids stay silently
    // dropped from every served verdict
    writeCorpus("zeta eta theta iota kappa lambda")
    // drop the memoized signature frame so ensure() sees the new
    // generation (a fresh serving session's view of the regen)
    graft.operators.MaterializeOnce.releaseSession(spark)
    val before = BandIndex.builds.get()
    BandIndex.ensure(spark, d, root)
    assert(BandIndex.builds.get() == before + 1,
      "the in-place regeneration must force a rebuild")
    val served = BandIndex.probe(spark, d, root)
    assert(served.filter(col("base_doc").isin(0L, 1L)).count() > 0L,
      "reused ids must serve again after the rebuild — stale " +
        "tombstones from the previous generation must not mask them")
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
