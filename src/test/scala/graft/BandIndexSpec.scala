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
