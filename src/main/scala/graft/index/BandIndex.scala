package graft.index

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** What a band-index directory claims to be — persisted as a 1-row
  * parquet and validated on every probe/ensure, the [[AnnIndex]]
  * `IndexMeta` device applied to the dedup band frame. `baseFp` is a
  * content fingerprint of the SETTLED corpus's signature frame, so a
  * base regenerated in place (same row count, new text) rebuilds
  * instead of silently probing stale buckets. */
case class BandMeta(formatVersion: Int, corpusDir: String,
    shardSource: String, nBaseDocs: Long, baseFp: Long)

/** PERSISTED MinHash-LSH band buckets for INCREMENTAL near-dup — the
  * batch shard-vs-corpus shape (VERDICT_r10 item 2) that completes the
  * dedup family's production story:
  *
  *   - [[Dedup.qCrossDedup]]       — exact fingerprints, incremental
  *   - [[graft.streaming.DedupStream]] — near-dup, STREAMING state
  *   - THIS                        — near-dup, BATCH shard ingest
  *
  * The reference's idempotent-reload story (ReplacingMergeTree + the
  * R9 ledger: reference README + etl_job.py:357-393) re-delivers a
  * WINDOW against settled data without reprocessing the base; applied
  * to documents, that means a freshly crawled shard must dedup against
  * the settled corpus WITHOUT re-pairing base↔base — that work was
  * paid once, when each base shard landed, and at 100 TB re-pairing it
  * per ingest is the difference between a daily job and an impossible
  * one.
  *
  * Artifacts under one root, plain parquet:
  *   - `buckets/` (band_id, band_hash, doc_id) — the base side's band
  *     postings, HOT-BUCKET-CAPPED at write time
  *     ([[Dedup.BandBucketCap]]; a saturated bucket carries no pairing
  *     signal — the r10 simhash law) — the only thing a probe joins
  *   - `sigs/`    (doc_id, s0..s15) — base signatures, so the
  *     estimated-Jaccard verify needs NO access to base text at all
  *   - `meta/`    ([[BandMeta]]) — 1 row, the validity claim
  *
  * BUILD ([[write]]): one pass over the base side of the shared
  * signature frame (itself one shingle pass over the corpus — the same
  * scan any dedup consumer pays). PROBE ([[probe]]): the shard's
  * signatures band identically ([[Dedup.bandedSig]] — shared code, so
  * divergence is impossible by construction) and equality-join the
  * PERSISTED buckets: candidates = shard∩base band collisions only.
  * Base↔base is never re-paired — the probe's pairing work is bounded
  * by |shard bands| × capped bucket membership, and the base enters
  * only as one columnar scan of its posting list. [[ensure]] is the
  * same deployment contract as [[AnnIndex.ensure]]: serve a valid
  * index untouched, rebuild missing/stale, refuse to clobber a newer
  * format.
  */
object BandIndex {

  /** Bump when the artifact layout changes.
    * v2 (r11): `buckets/` is stored UNCAPPED with a vocab-sized
    * `sizes/` sidecar (band_id, band_hash, df); the hot-bucket cap is
    * applied at PROBE time from the sidecar. That is what makes
    * [[append]] EXACTLY equal to a rebuild: appending can push a
    * bucket over the cap, and the probe-time filter sees the updated
    * df where a write-time cap would have frozen the stale verdict. */
  val FormatVersion = 2

  private def p(root: String, part: String) = s"$root/$part"

  /** Test hook: how many times [[write]] actually ran in this JVM —
    * the spec's proof that consecutive shard ingests REUSE the base
    * buckets (work ∝ shard, the whole point). */
  private[graft] val builds = new AtomicInteger(0)

  /** Default per-corpus index location (scratch space — a deployment
    * points `root` at its lake instead). */
  def defaultRoot(corpusDir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_band_index/" +
      corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Content fingerprint of the BASE side's signature frame: order-
    * independent xor over (doc_id, s0, s15) hashes. Rides the shared
    * materialized signature frame — no extra corpus scan. */
  private def baseFingerprint(base: DataFrame): Long =
    base.select(coalesce(expr("bit_xor(xxhash64(doc_id, s0, s15))"),
      lit(0L)).as("fp")).head().getLong(0)

  private def baseSigs(spark: SparkSession, corpusDir: String,
      shardSource: String): DataFrame =
    Dedup.minhashSigWithSource(spark, corpusDir)
      .filter(col("source") =!= shardSource).drop("source")

  /** Build the base band buckets + signatures for `corpusDir`, treating
    * `shardSource` as the NOT-YET-SETTLED shard (excluded from the
    * base). Overwrites `root`. Buckets are UNCAPPED (v2) — the cap is
    * the probe's, fed by the `sizes/` sidecar. */
  def write(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): Unit = {
    builds.incrementAndGet()
    val base = baseSigs(spark, corpusDir, shardSource)
    val buckets = Dedup.bandedSig(base)
    buckets.write.mode("overwrite").parquet(p(root, "buckets"))
    buckets.groupBy("band_id", "band_hash").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(p(root, "sizes"))
    base.write.mode("overwrite").parquet(p(root, "sigs"))
    writeMeta(spark, root, BandMeta(FormatVersion, corpusDir,
      shardSource, base.count(), baseFingerprint(base)))
  }

  private def writeMeta(spark: SparkSession, root: String,
      meta: BandMeta): Unit = {
    import spark.implicits._
    Seq(meta).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(p(root, "meta"))
  }

  /** SETTLE an ingested shard into the index (r11) — the lifecycle
    * step after [[probe]] + ingest decisions: the appended source's
    * band postings and signatures are ADDED, the bucket-size sidecar
    * is merged algebraically (old df + shard df — vocab-sized, never a
    * posting rescan), and the meta moves to the NEXT shard source, so
    * the next ingest probes against a base that includes this shard.
    * Banding is content-pure (no trained state), so append == a full
    * rebuild with the shard included EXACTLY — spec'd; the frozen-book
    * drift [[AnnIndex.append]] documents does not exist here. Cost ∝
    * shard (+ the sidecar rewrite). The appended source must be the
    * meta's current `shardSource` (the set the probes excluded). */
  def append(spark: SparkSession, corpusDir: String, root: String,
      nextShardSource: String): Unit = {
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"BandIndex: no index at $root to append into"))
    require(meta.formatVersion == FormatVersion,
      s"BandIndex: cannot append into format v${meta.formatVersion}")
    require(meta.corpusDir == corpusDir, "BandIndex: corpus mismatch")
    require(nextShardSource != meta.shardSource,
      "BandIndex: next shard must differ from the appended one")
    val shard = Dedup.minhashSigWithSource(spark, corpusDir)
      .filter(col("source") === meta.shardSource).drop("source")
    // derived twice (append + sidecar counts) — bandedSig over the
    // materialized signature frame is cheap; no checkpoint blocks held
    val shardBuckets = Dedup.bandedSig(shard)
    shardBuckets.write.mode("append").parquet(p(root, "buckets"))
    shard.write.mode("append").parquet(p(root, "sigs"))
    // algebraic sidecar merge, swapped in via the vacuum rename device
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val merged = spark.read.parquet(p(root, "sizes"))
      .unionByName(shardBuckets.groupBy("band_id", "band_hash")
        .agg(count(lit(1)).as("df")))
      .groupBy("band_id", "band_hash").agg(sum("df").as("df"))
    merged.write.mode("overwrite").parquet(p(root, "sizes.next"))
    fs.delete(new org.apache.hadoop.fs.Path(p(root, "sizes")), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(p(root, "sizes.next")),
      new org.apache.hadoop.fs.Path(p(root, "sizes"))),
      s"BandIndex: sizes swap failed at $root")
    val newBase = baseSigs(spark, corpusDir, nextShardSource)
    writeMeta(spark, root, meta.copy(shardSource = nextShardSource,
      nBaseDocs = newBase.count(), baseFp = baseFingerprint(newBase)))
  }

  private def readMeta(spark: SparkSession, root: String): Option[BandMeta] =
    try {
      import spark.implicits._
      Some(spark.read.parquet(p(root, "meta")).as[BandMeta].head())
    } catch { case _: Exception => None }

  private val ensuring = new ConcurrentHashMap[String, AnyRef]()

  /** The deployment contract ([[AnnIndex.ensure]]'s): return a root
    * holding VALID base buckets for `corpusDir`, building only when the
    * existing ones are missing or stale (version / corpus / base count /
    * content fingerprint). A root claiming a NEWER format is a hard
    * error, never clobbered. */
  def ensure(spark: SparkSession, corpusDir: String,
      root0: String = null,
      shardSource: String = Dedup.newShardSource): String = {
    val root = Option(root0).getOrElse(defaultRoot(corpusDir))
    val lock = ensuring.computeIfAbsent(root, _ => new AnyRef)
    lock.synchronized {
      readMeta(spark, root) match {
        case Some(m) if m.formatVersion > FormatVersion =>
          throw new IllegalStateException(
            s"BandIndex: $root is format v${m.formatVersion} (newer than " +
              s"v$FormatVersion) — refusing to overwrite")
        case Some(m) if m.formatVersion == FormatVersion &&
            m.corpusDir == corpusDir && m.shardSource == shardSource && {
              val base = baseSigs(spark, corpusDir, shardSource)
              m.nBaseDocs == base.count() &&
                m.baseFp == baseFingerprint(base)
            } =>
          () // valid — serve as-is
        case _ => write(spark, corpusDir, root, shardSource)
      }
    }
    root
  }

  /** Probe the shard against the persisted base buckets: per (shard
    * doc, base doc) candidate pair, the shared-band count, the MinHash
    * estimated-similarity verify (matching signature components, 0..16
    * — integer-exact, computed from the PERSISTED base sigs, never
    * base text), and the near-dup verdict at est-J ≥ 1/2 (≥ 8 of 16
    * components). Work ∝ shard: the base enters as one columnar scan
    * of `buckets` + a |candidates|-bounded `sigs` join. */
  def probe(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): DataFrame = {
    val shardSig = Dedup.minhashSigWithSource(spark, corpusDir)
      .filter(col("source") === shardSource).drop("source")
    val shardBands = Dedup.bandedSig(shardSig)
    // probe-time hot-bucket cap (v2): the vocab-sized sidecar names
    // the admissible buckets; a bucket the appends pushed over the cap
    // drops whole, exactly as a rebuild would have dropped it
    val ok = spark.read.parquet(p(root, "sizes"))
      .filter(col("df") <= Dedup.BandBucketCap)
      .select("band_id", "band_hash")
    val buckets = spark.read.parquet(p(root, "buckets"))
      .withColumnsRenamed(Map("doc_id" -> "base_doc"))
      .join(ok, Seq("band_id", "band_hash"), "left_semi")
    val cand = shardBands.join(buckets, Seq("band_id", "band_hash"))
      .groupBy("doc_id", "base_doc")
      .agg(count(lit(1)).as("n_shared_bands"))
    val baseSig = spark.read.parquet(p(root, "sigs"))
      .withColumnsRenamed(
        (0 until 16).map(i => s"s$i" -> s"b$i").toMap + ("doc_id" -> "base_doc"))
    val matches = (0 until 16)
      .map(i => when(col(s"s$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(shardSig, Seq("doc_id"))
      .join(baseSig, Seq("base_doc"))
      .select(col("doc_id"), col("base_doc"), col("n_shared_bands"),
        matches.as("sig_matches"))
      .withColumn("is_neardup", (col("sig_matches") >= 8L).cast("int"))
  }
}
