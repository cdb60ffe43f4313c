package graft.index

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** What an fp-index directory claims to be — the [[BandMeta]] device
  * for the EXACT tier. `contentFp` is an order-free fingerprint of the
  * persisted (fp, n_base) rows; `nFps` pins the persisted row count so
  * a torn append reads as stale (the BandIndex v3 nPostings device). */
case class FpMeta(formatVersion: Int, corpusDir: String,
    shardSource: String, nBaseDocs: Long, contentFp: Long, nFps: Long)

/** PERSISTED exact-dedup fingerprints — the BandIndex pattern applied
  * to the EXACT tier (r13, VERDICT_r12 item 8): the settled corpus's
  * DISTINCT normalized-content hashes land once as a parquet artifact,
  * and every shard ingest — batch or streaming — judges its docs with
  * one broadcast-or-shuffle hash join against it, instead of
  * re-aggregating the 100 TB base per ingest (what
  * [[Dedup.qCrossDedup]]'s in-session rule costs when run repeatedly;
  * fine for one batch job, wrong for a per-micro-batch stream).
  *
  * Artifacts under one root, plain parquet:
  *   - `fps/`  (fp, n_base) — distinct base fingerprints + their doc
  *     counts (8-byte keys; the corpus collapses ~|distinct contents|
  *     rows, never text)
  *   - `meta/` ([[FpMeta]]) — 1 row, the validity claim
  *
  * The fingerprint expression is [[Dedup.normFpCol]] — shared with the
  * in-session rule and the streaming decision path, so parity is by
  * construction. Lifecycle mirrors [[BandIndex]]: [[ensure]]
  * serve-valid/rebuild-stale/refuse-newer, [[append]] settles an
  * ingested shard algebraically (old n_base + shard counts — content-
  * pure, so append == rebuild EXACTLY, spec'd), and a crash between
  * the fps swap and the meta rewrite reads as stale via the `nFps`
  * pin. */
object FpIndex {

  val FormatVersion = 1

  private def p(root: String, part: String) = s"$root/$part"

  /** Test hook: actual builds in this JVM (the reuse proof). */
  private[graft] val builds = new AtomicInteger(0)

  def defaultRoot(corpusDir: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_fp_index/" +
      corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")

  private def baseFps(spark: SparkSession, corpusDir: String,
      shardSource: String): DataFrame =
    Dedup.normFps(spark, corpusDir)
      .filter(col("source") =!= shardSource)
      .groupBy("fp").agg(count(lit(1)).as("n_base"))

  /** Order-free content fingerprint over the (fp, n_base) rows. */
  private def contentFingerprint(fps: DataFrame): Long =
    fps.select(coalesce(expr("bit_xor(xxhash64(fp, n_base))"), lit(0L)))
      .head().getLong(0)

  private def fpCount(spark: SparkSession, root: String): Long =
    spark.read.parquet(p(root, "fps")).count()

  /** Build the base fingerprint table, treating `shardSource` as the
    * not-yet-settled shard (excluded). Overwrites `root`. */
  def write(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): Unit = {
    builds.incrementAndGet()
    val fps = baseFps(spark, corpusDir, shardSource)
    fps.write.mode("overwrite").parquet(p(root, "fps"))
    val nBase = Dedup.normFps(spark, corpusDir)
      .filter(col("source") =!= shardSource).count()
    // contentFp is derived from the CORPUS (what ensure() revalidates
    // against), not from the just-written artifact — fingerprinting
    // the index against itself would be circular and a base
    // regenerated in place would serve stale verdicts forever
    writeMeta(spark, root, FpMeta(FormatVersion, corpusDir, shardSource,
      nBase, contentFingerprint(fps), fpCount(spark, root)))
  }

  private def writeMeta(spark: SparkSession, root: String,
      meta: FpMeta): Unit = {
    import spark.implicits._
    Seq(meta).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(p(root, "meta"))
  }

  private def readMeta(spark: SparkSession, root: String): Option[FpMeta] =
    try {
      import spark.implicits._
      val df = spark.read.parquet(p(root, "meta"))
      val ver = df.select("formatVersion").head().getInt(0)
      if (ver != FormatVersion) Some(FpMeta(ver, "", "", -1L, 0L, -1L))
      else Some(df.as[FpMeta].head())
    } catch { case _: Exception => None }

  private val ensuring = new ConcurrentHashMap[String, AnyRef]()

  /** The deployment contract ([[BandIndex.ensure]]'s): serve a valid
    * index untouched, rebuild missing/stale/corrupt, refuse to clobber
    * a newer format. */
  def ensure(spark: SparkSession, corpusDir: String,
      root0: String = null,
      shardSource: String = Dedup.newShardSource): String = {
    val root = Option(root0).getOrElse(defaultRoot(corpusDir))
    val lock = ensuring.computeIfAbsent(root, _ => new AnyRef)
    lock.synchronized {
      readMeta(spark, root) match {
        case Some(m) if m.formatVersion > FormatVersion =>
          throw new IllegalStateException(
            s"FpIndex: $root is format v${m.formatVersion} (newer than " +
              s"v$FormatVersion) — refusing to overwrite")
        case Some(m) if m.formatVersion == FormatVersion &&
            m.corpusDir == corpusDir && m.shardSource == shardSource && {
              // unreadable artifacts read as stale → rebuild
              // (the ADVICE_r12 BandIndex guard contract)
              try {
                m.nBaseDocs == Dedup.normFps(spark, corpusDir)
                  .filter(col("source") =!= shardSource).count() &&
                  // the torn-append pin: persisted row count vs meta
                  m.nFps == fpCount(spark, root) &&
                  // regeneration check: the fingerprint re-derives
                  // from the CORPUS, never from the persisted artifact
                  // (which would compare the index against itself)
                  m.contentFp == contentFingerprint(
                    baseFps(spark, corpusDir, shardSource))
              } catch { case scala.util.control.NonFatal(_) => false }
            } => // valid — serve as-is
        case _ => write(spark, corpusDir, root, shardSource)
      }
    }
    root
  }

  /** Judge an arbitrary shard fingerprint frame (doc_id, fp) against
    * the persisted base: (doc_id, n_base_matches, is_dup) — the exact
    * row shape of [[Dedup.qCrossDedup]], so the streaming decision
    * path and the served query share the in-session rule's contract.
    * Each doc's verdict depends only on its own fp and the static
    * index — any micro-batch split yields identical rows. */
  def probeFps(spark: SparkSession, root: String,
      shardFp: DataFrame): DataFrame =
    shardFp
      .join(spark.read.parquet(p(root, "fps"))
        .withColumnRenamed("fp", "base_fp"),
        col("fp") === col("base_fp"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base_matches"),
        (col("n_base").isNotNull).cast("int").as("is_dup"))

  /** Probe the named shard of `corpusDir` against the persisted base. */
  def probe(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): DataFrame =
    probeFps(spark, root, Dedup.normFps(spark, corpusDir)
      .filter(col("source") === shardSource).select("doc_id", "fp"))

  /** SETTLE an ingested shard: merge its fingerprint counts into the
    * persisted table algebraically (old n_base + shard counts — one
    * groupBy over |distinct fps|, the base corpus never re-scanned),
    * move the meta to the NEXT shard source, re-pin `nFps`. Fp
    * counting is content-pure, so append == a full rebuild with the
    * shard included EXACTLY (spec'd). Refuses an already-landed next
    * shard (its docs sit inside this index's base — probing them would
    * self-match; the [[BandIndex.append]] hazard). */
  def append(spark: SparkSession, corpusDir: String, root: String,
      nextShardSource: String): Unit = {
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"FpIndex: no index at $root to append into"))
    require(meta.formatVersion == FormatVersion,
      s"FpIndex: cannot append into format v${meta.formatVersion}")
    require(meta.corpusDir == corpusDir, "FpIndex: corpus mismatch")
    require(nextShardSource != meta.shardSource,
      "FpIndex: next shard must differ from the appended one")
    val nNext = Dedup.normFps(spark, corpusDir)
      .filter(col("source") === nextShardSource).count()
    require(nNext == 0L,
      s"FpIndex: next shard '$nextShardSource' already has $nNext docs " +
        "in the corpus — they are inside this index's persisted base; " +
        "rebuild (ensure) with the new shard split instead of appending")
    val shardFps = Dedup.normFps(spark, corpusDir)
      .filter(col("source") === meta.shardSource)
      .groupBy("fp").agg(count(lit(1)).as("n_base"))
    val merged = spark.read.parquet(p(root, "fps"))
      .unionByName(shardFps)
      .groupBy("fp").agg(sum("n_base").as("n_base"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.write.mode("overwrite").parquet(p(root, "fps.next"))
    fs.delete(new org.apache.hadoop.fs.Path(p(root, "fps")), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(p(root, "fps.next")),
      new org.apache.hadoop.fs.Path(p(root, "fps"))),
      s"FpIndex: fps swap failed at $root")
    writeMeta(spark, root, meta.copy(shardSource = nextShardSource,
      nBaseDocs = Dedup.normFps(spark, corpusDir)
        .filter(col("source") =!= nextShardSource).count(),
      contentFp = contentFingerprint(spark.read.parquet(p(root, "fps"))),
      nFps = fpCount(spark, root)))
  }
}
