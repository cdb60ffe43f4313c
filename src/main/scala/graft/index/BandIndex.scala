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

  /** Bump when the artifact layout changes. */
  val FormatVersion = 1

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
    * base). Overwrites `root`. */
  def write(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): Unit = {
    import spark.implicits._
    builds.incrementAndGet()
    val base = baseSigs(spark, corpusDir, shardSource)
    val buckets = Dedup.bandedSig(base)
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy("band_id", "band_hash")))
      .filter(col("bsz") <= Dedup.BandBucketCap).drop("bsz")
    buckets.write.mode("overwrite").parquet(p(root, "buckets"))
    base.write.mode("overwrite").parquet(p(root, "sigs"))
    val meta = BandMeta(FormatVersion, corpusDir, shardSource,
      base.count(), baseFingerprint(base))
    Seq(meta).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(p(root, "meta"))
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
    val buckets = spark.read.parquet(p(root, "buckets"))
      .withColumnsRenamed(Map("doc_id" -> "base_doc"))
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
