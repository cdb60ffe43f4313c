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
  *
  * LIFECYCLE (round 8): a long-lived session — the 208-query bench run,
  * or a production service holding one SparkSession for days — must be
  * able to RELEASE a frame, not just drop the reference: the
  * checkpointed RDD's blocks live in the block manager until explicitly
  * unpersisted, and round 7's closing bench measured the accumulation
  * (alphabetical-tail queries inflated 3-5× vs isolated A/B under
  * 208 frames of heap pressure). [[release]] / [[releaseSession]] evict
  * the key AND unpersist the blocks, so the next demand rebuilds from
  * scratch. A released frame is NOT recomputable (localCheckpoint
  * truncates lineage by design) — release only between query
  * boundaries, never while a consumer still holds the frame.
  * [[invalidate]] keeps its original semantics (evict without
  * unpersist) because tests hold pre-invalidation frames across it.
  */
private[graft] object MaterializeOnce {

  /** One claimed slot: the future every consumer joins on, plus the
    * thread that owns the build (to turn same-key recursion into an
    * eager error instead of a self-join deadlock). */
  private final class Cell(val owner: Thread) {
    val result = new CompletableFuture[DataFrame]()
  }

  private val materialized =
    new ConcurrentHashMap[(SparkSession, String, String), Cell]()

  /** One frame materialization: which frame, and how long the build +
    * checkpoint took. */
  private[graft] final case class BuildEvent(tag: String, dir: String,
      seconds: Double)

  /** Append-only log of every frame build in this JVM — the bench's
    * COST-ATTRIBUTION source (VERDICT_r09 item 3): the first consumer
    * of a shared frame pays its materialization inside its own timing,
    * which made innocent consumers read as 100×+ outliers at the scale
    * probes (q_token_drift 187× was the frame, not the query). The
    * bench snapshots [[buildLogSize]] around each timed run and
    * attributes any builds that landed inside the window to the frame,
    * not the query. */
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[BuildEvent]()

  /** Per-thread build-nesting depth: a build that demands ANOTHER frame
    * (clusters → ngram_pairs) already contains the inner build's time,
    * so only the OUTERMOST build logs an event — the log's per-window
    * sum is subtractable without double counting. */
  private val buildDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private[graft] def buildLogSize: Int = buildLog.size
  private[graft] def buildLogSnapshot: Seq[BuildEvent] = {
    import scala.jdk.CollectionConverters._
    buildLog.iterator().asScala.toSeq
  }

  def apply(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val key = (spark, dir, tag)
    val fresh = new Cell(Thread.currentThread())
    val existing = materialized.putIfAbsent(key, fresh)
    if (existing != null) await(key, existing)
    else {
      try {
        val t0 = System.nanoTime()
        buildDepth.set(buildDepth.get + 1)
        val df =
          try build.localCheckpoint()
          finally buildDepth.set(buildDepth.get - 1)
        if (buildDepth.get == 0)
          buildLog.add(BuildEvent(tag, dir, (System.nanoTime() - t0) / 1e9))
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

  /** Unpersist the checkpointed blocks behind a materialized frame.
    * `localCheckpoint` leaves the frame's plan as a bare [[LogicalRDD]]
    * over the persisted RDD, so the blocks are reachable directly from
    * the analyzed plan — no reflection, no block-manager diffing. */
  private def unpersistBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
    }

  /** Release ONE frame: evict the key and free its blocks. In-flight
    * builds are left alone (the builder still holds the frame). Returns
    * true iff a completed frame was released. */
  private[graft] def release(spark: SparkSession, dir: String, tag: String): Boolean = {
    val cell = materialized.get((spark, dir, tag))
    if (cell == null || !cell.result.isDone ||
        cell.result.isCompletedExceptionally) false
    else if (materialized.remove((spark, dir, tag), cell)) {
      unpersistBlocks(cell.result.join()); true
    } else false
  }

  /** Release every COMPLETED frame owned by `spark` (any dir/tag);
    * skips in-flight builds. Returns the number released. The bench
    * calls this between query blocks so the artifact measures
    * steady-state per-query cost, not N-frame heap accumulation. */
  private[graft] def releaseSession(spark: SparkSession): Int = {
    var released = 0
    materialized.forEach { (key, cell) =>
      if ((key._1 eq spark) && cell.result.isDone &&
          !cell.result.isCompletedExceptionally &&
          materialized.remove(key, cell)) {
        unpersistBlocks(cell.result.join())
        released += 1
      }
    }
    released
  }

  /** Test hook: drop all materialized frames (forces recomputation)
    * WITHOUT unpersisting — specs hold pre-invalidation frames across
    * this call and still act on them. */
  private[graft] def invalidate(): Unit = materialized.clear()

  /** Test hook: evict ONE tag's frames (any session/dir), evict-only
    * like [[invalidate]] — the keyed form (ADVICE_r14): a spec that
    * needs a fresh build of one frame must not force every OTHER
    * frame in the shared test session to leak its blocks and rebuild
    * as a duplicate. Returns the number evicted. */
  private[graft] def invalidateTag(tag: String): Int = {
    var evicted = 0
    materialized.forEach { (key, cell) =>
      if (key._3 == tag && materialized.remove(key, cell)) evicted += 1
    }
    evicted
  }
}
