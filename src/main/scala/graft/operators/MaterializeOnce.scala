package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MATERIALIZE-ONCE session cache (shared by Dedup and Similarity): a
  * frame computed and checkpointed ONCE per (session, dir, tag) and
  * returned to every consumer — the shape a 100 TB pipeline actually
  * runs (the reference analogue: the ledger is written once and read by
  * all consumers; here the "ledger" is a pair list / cluster
  * assignment / signature frame). `localCheckpoint` materializes the
  * frame and truncates its lineage, so consumers plan against an
  * in-memory scan, not a re-derivation; a cluster deployment swaps the
  * same call site to a reliable `checkpoint` or an explicit parquet
  * materialization. Cache only corpus-row-bounded frames (one narrow
  * row per doc/vector or less) — never a fanned-out intermediate.
  */
private[operators] object MaterializeOnce {

  private val materialized = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame =
    materialized.computeIfAbsent((spark, dir, tag),
      _ => build.localCheckpoint())

  /** Test hook: drop all materialized frames (forces recomputation). */
  private[graft] def invalidate(): Unit = materialized.clear()
}
