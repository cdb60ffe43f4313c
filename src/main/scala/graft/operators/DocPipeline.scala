package graft.operators

import graft.Tables
import graft.functions.Portable.hash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-set writer — the §2.C operators assembled into
  * the job a user actually runs, the LLM-data counterpart of
  * [[graft.streaming.EtlPipeline]]'s metrics loop:
  *
  *   1. rule filter  — [[TextAnalysis.qFilter]]'s KEEP decision
  *                     (language, length, quality, exact-dup canonical)
  *   2. DSIR gate    — [[TextAnalysis.qDsir]]'s importance score; docs
  *                     with non-positive target-likelihood importance
  *                     drop (the resampling stage of Xie et al.)
  *   3. near-dedup   — n-gram Jaccard pairs → connected components
  *                     ([[Dedup.connectedComponents]]); only each
  *                     cluster's minimum doc_id survives
  *   4. PII redact   — digit-run redaction on the outgoing text (the
  *                     [[TextAnalysis.qPii]] rewrite, applied at write
  *                     time so no un-redacted text reaches a shard)
  *   5. shard order  — the deterministic epoch permutation of
  *                     [[TextAnalysis.qShardOrder]]: shard + position
  *                     are pure functions of (salt, ORIGINAL content) —
  *                     redaction does not perturb the permutation
  *   6. write        — parquet partitioned by shard, one directory per
  *                     shard, rows carrying (pos, doc_id, text)
  *
  * Everything is deterministic, so a rerun (or a resumed run after
  * preemption) produces bit-identical shards — the property that makes
  * the output safe to feed a resumable trainer. Scale shape: rules,
  * DSIR, and redaction are projections; both dedups shuffle only 8-byte
  * hashes; the write shuffles (doc text travels exactly once,
  * scan → shard writer).
  */
object DocPipeline {

  /** Drop/keep accounting returned by [[run]] — the numbers an operator
    * alerts on (sudden jumps in any drop class mean upstream drift). */
  case class Summary(
      nDocs: Long,
      nRuleDropped: Long,
      nDsirDropped: Long,
      nNearDupDropped: Long,
      nWritten: Long,
      nRedacted: Long,
      nShards: Int,
      nearDupRoute: String = "exact")

  /** doc_ids that LOSE near-dedup: in some near-dup cluster but not
    * its minimum-id representative. The cluster source is the
    * PRE-FLIGHT's choice (VERDICT_r08 item 4): the exact n-gram
    * Jaccard clusters on a healthy shingle space, the LSH banded
    * clusters when `Dedup.preflight` says the space has saturated
    * (where the exact join's Σ C(df,2) input is quadratic death — the
    * sf10 measurement). Same fixpoint, same keep rule either way. */
  private def nearDupLosers(spark: SparkSession, dir: String,
      routeToLsh: Boolean): DataFrame = {
    val cl = if (routeToLsh) Dedup.qDedupClustersLsh(spark, dir)
             else Dedup.clusters(spark, dir)
    cl.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
  }

  def run(spark: SparkSession, dir: String, outDir: String,
          shards: Int = 16, salt: String = "epoch0",
          maxJoinRows: Long = Dedup.PreflightMaxJoinRows): Summary = {
    val docs = Tables.documents(spark, dir)
    val verdicts = TextAnalysis.qFilter(spark, dir)
      .select("doc_id", "keep")
    val dsir = TextAnalysis.qDsir(spark, dir)
      .select(col("doc_id"), (col("importance") > 0).as("dsir_keep"))
    val pf = Dedup.preflight(spark, dir, maxJoinRows)
    val losers = nearDupLosers(spark, dir, pf.routeToLsh)

    val kept = docs.join(verdicts, "doc_id")
      .filter(col("keep"))
      .join(dsir, "doc_id")
      .filter(col("dsir_keep"))
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        // redact at write time; order by the ORIGINAL content hash so
        // the permutation is independent of redaction policy changes
        regexp_replace(col("text"), "[0-9]+", "<NUM>").as("text"),
        (col("text") =!= regexp_replace(col("text"), "[0-9]+", "<NUM>"))
          .as("redacted"),
        col("lang"), col("source"),
        hash60(concat_ws(":", lit(salt), col("text"))).as("ord_hash"))
      .withColumn("shard", (col("ord_hash") % shards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("ord_hash", "doc_id")))

    kept.write.mode("overwrite").partitionBy("shard").parquet(outDir)

    val written = spark.read.parquet(outDir)
    val nDocs = docs.count()
    val nKeepRule = verdicts.filter(col("keep")).count()
    val nKeepDsir = TextAnalysis.qFilter(spark, dir).filter(col("keep"))
      .join(dsir, "doc_id").filter(col("dsir_keep")).count()
    val nWritten = written.count()
    Summary(
      nDocs = nDocs,
      nRuleDropped = nDocs - nKeepRule,
      nDsirDropped = nKeepRule - nKeepDsir,
      nNearDupDropped = nKeepDsir - nWritten,
      nWritten = nWritten,
      nRedacted = written.filter(col("redacted")).count(),
      nShards = shards,
      nearDupRoute = if (pf.routeToLsh) "lsh" else "exact")
  }

  /** Accounting for one incremental shard ingest. */
  case class ShardSummary(nShardDocs: Long, nExactDup: Long,
      nNearDup: Long, nKept: Long, indexRoot: String)

  /** INCREMENTAL shard ingest (r11) — the production APPEND path next
    * to [[run]]'s full-corpus build, the reference's idempotent
    * window-reload story (etl_job.py:357-393, R9) applied to
    * documents: only the NEW shard (`shardSource`) is judged; the
    * settled base is consulted through (a) its distinct normalized
    * fingerprints ([[Dedup.qCrossDedup]]'s exact rule — one
    * map-side-combinable aggregation of the base, 8-byte keys) and
    * (b) its PERSISTED MinHash band buckets
    * ([[graft.index.BandIndex]] — near-dup at est-J ≥ 1/2 against any
    * base doc). Work ∝ shard plus one columnar read of the persisted
    * postings; base text is never touched and base↔base is never
    * re-paired — which is what lets a 100 TB corpus take daily shard
    * appends. Deterministic, so re-delivery of the same shard yields
    * identical decisions (the ReplacingMergeTree re-deliver contract).
    *
    * Returns one decision row per shard doc: (doc_id, exact_dup,
    * near_dup, keep) plus the accounting summary.
    */
  def ingestShard(spark: SparkSession, dir: String,
      root0: String = null,
      shardSource: String = Dedup.newShardSource): (DataFrame, ShardSummary) = {
    val root = graft.index.BandIndex.ensure(spark, dir, root0, shardSource)
    // the exact rule judges the SAME shard as the near-dup probe
    // (ADVICE_r11: qCrossDedup hardcodes src0 — with any other
    // shardSource the two verdicts would silently disagree on WHICH
    // docs are being ingested)
    val exact = Dedup.crossDedupFor(spark, dir, shardSource)
      .select(col("doc_id"), col("is_dup").as("exact_dup"))
    val near = graft.index.BandIndex.probe(spark, dir, root, shardSource)
      .filter(col("is_neardup") === 1)
      .select(col("doc_id").as("nd_doc")).distinct()
    val decisions = exact
      .join(near, col("doc_id") === col("nd_doc"), "left_outer")
      .select(col("doc_id"), col("exact_dup"),
        col("nd_doc").isNotNull.cast("int").as("near_dup"))
      .withColumn("keep",
        (col("exact_dup") === 0 && col("near_dup") === 0).cast("int"))
    val agg = decisions.agg(
      count(lit(1)).as("n"),
      sum("exact_dup").as("ne"),
      sum("near_dup").as("nn"),
      sum("keep").as("nk")).head()
    (decisions, ShardSummary(agg.getLong(0), agg.getLong(1),
      agg.getLong(2), agg.getLong(3), root))
  }
}
