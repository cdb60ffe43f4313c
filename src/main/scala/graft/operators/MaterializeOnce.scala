package graft.operators

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

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
  *
  * CONCURRENCY: the build thunk is NEVER run while holding the map's
  * lock. A per-key cell is claimed with `putIfAbsent` and the thunk is
  * forced afterwards, so one build may freely call [[apply]] for a
  * DIFFERENT key (e.g. `clusters` builds on top of `ngram_pairs`) —
  * `computeIfAbsent` would throw `IllegalStateException: Recursive
  * update` whenever the two keys landed in the same hash bin, a
  * per-JVM coin flip on the session's identity hash. Same-key
  * recursion (a build that transitively demands itself) is detected
  * via the claiming thread and fails fast instead of deadlocking; a
  * failed build is evicted so the next caller retries rather than
  * caching the exception.
  */
private[operators] object MaterializeOnce {

  /** One claimed slot: the future every consumer joins on, plus the
    * thread that owns the build (to turn same-key recursion into an
    * eager error instead of a self-join deadlock). */
  private final class Cell(val owner: Thread) {
    val result = new CompletableFuture[DataFrame]()
  }

  private val materialized =
    new ConcurrentHashMap[(SparkSession, String, String), Cell]()

  def apply(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val key = (spark, dir, tag)
    val fresh = new Cell(Thread.currentThread())
    val existing = materialized.putIfAbsent(key, fresh)
    if (existing != null) await(key, existing)
    else {
      try {
        val df = build.localCheckpoint()
        fresh.result.complete(df)
        df
      } catch {
        case t: Throwable =>
          materialized.remove(key, fresh)
          fresh.result.completeExceptionally(t)
          throw t
      }
    }
  }

  private def await(key: (SparkSession, String, String), cell: Cell): DataFrame = {
    if (!cell.result.isDone && (cell.owner eq Thread.currentThread()))
      throw new IllegalStateException(
        s"MaterializeOnce: build for tag '${key._3}' recursively demands itself")
    try cell.result.join()
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }
  }

  /** Test hook: drop all materialized frames (forces recomputation). */
  private[graft] def invalidate(): Unit = materialized.clear()
}
