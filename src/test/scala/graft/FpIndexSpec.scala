package graft

import graft.index.{FpIndex, FpMeta}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The persisted EXACT-dedup tier (r13) — the BandIndexSpec contract
  * set applied to FpIndex: served == the in-session rule, builds are
  * reused, append == rebuild, torn appends read as stale, newer
  * formats are never clobbered. */
class FpIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

  test("served probe == q_cross_dedup row-exact, and consecutive " +
      "ingests pay exactly one build") {
    val root = tmpDir("fp_idx_serve")
    val b0 = FpIndex.builds.get()
    val served = rows(FpIndex.probe(spark, dir,
      FpIndex.ensure(spark, dir, root)))
    val inSession = rows(Dedup.qCrossDedup(spark, dir))
    assert(served.nonEmpty && served == inSession,
      "persisted fingerprints must serve the in-session rule's verdicts")
    val again = rows(FpIndex.probe(spark, dir,
      FpIndex.ensure(spark, dir, root)))
    assert(again == served)
    assert(FpIndex.builds.get() == b0 + 1,
      "the second ensure must reuse the persisted table")
  }

  test("append == rebuild: settling the shard equals a one-shot build " +
      "over the widened base (fp counting is content-pure)") {
    val rootA = tmpDir("fp_idx_append")
    val rootB = tmpDir("fp_idx_rebuild")
    FpIndex.write(spark, dir, rootA, shardSource = "src0")
    FpIndex.append(spark, dir, rootA, nextShardSource = "__future__")
    FpIndex.write(spark, dir, rootB, shardSource = "__future__")
    val fa = spark.read.parquet(s"$rootA/fps").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fb = spark.read.parquet(s"$rootB/fps").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fa == fb, "appended fps must equal the rebuild's")
    // the appended index validates for the next shard — no rebuild —
    // and probing a nonexistent next shard yields no rows
    val before = FpIndex.builds.get()
    FpIndex.ensure(spark, dir, rootA, shardSource = "__future__")
    assert(FpIndex.builds.get() == before)
    assert(FpIndex.probe(spark, dir, rootA, "__future__").count() == 0)
    // appending an already-landed shard is refused (self-match hazard)
    intercept[IllegalArgumentException] {
      FpIndex.append(spark, dir, rootA, nextShardSource = "src1")
    }
  }

  test("torn append reads as STALE (the nFps pin) and a newer-format " +
      "root is never clobbered") {
    import spark.implicits._
    val root = tmpDir("fp_idx_torn")
    FpIndex.ensure(spark, dir, root)
    // simulate the crash: extra fps land, meta stays
    Seq((999999999L, 1L)).toDF("fp", "n_base")
      .write.mode("append").parquet(s"$root/fps")
    val before = FpIndex.builds.get()
    FpIndex.ensure(spark, dir, root)
    assert(FpIndex.builds.get() == before + 1,
      "an fps/meta count mismatch must force a rebuild")
    // newer format: refuse
    val meta = spark.read.parquet(s"$root/meta").as[FpMeta].head()
    Seq(meta.copy(formatVersion = FpIndex.FormatVersion + 1)).toDS()
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val e = intercept[IllegalStateException] {
      FpIndex.ensure(spark, dir, root)
    }
    assert(e.getMessage.contains("refusing to overwrite"))
  }

  test("a base regenerated in place (content fingerprint moves) " +
      "rebuilds; an unreadable fps/ reads as stale, never a crash") {
    import spark.implicits._
    val d = tmpDir("fp_idx_regen_corpus")
    def gen(tag: String): Unit =
      spark.range(50).select(col("id").as("doc_id"),
          concat(lit(s"$tag text body number "), col("id")).as("text"),
          concat(lit("src"), col("id") % 4).as("source"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    gen("alpha")
    val root = tmpDir("fp_idx_regen_root")
    FpIndex.ensure(spark, d, root)
    gen("beta") // same row count, new content
    graft.operators.MaterializeOnce.invalidate()
    val before = FpIndex.builds.get()
    FpIndex.ensure(spark, d, root)
    assert(FpIndex.builds.get() == before + 1,
      "a moved content fingerprint must force a rebuild")
    // partial deletion: fps/ gone, meta intact → stale → rebuild
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/fps"), true))
    FpIndex.ensure(spark, d, root)
    assert(FpIndex.builds.get() == before + 2,
      "unreadable fps/ must rebuild, not crash")
  }

  test("delete(): masked probe == an index rebuilt without the docs; " +
      "idempotent; refuses unknown fps; vacuum compacts with nFps " +
      "re-pinned and survives the crash window without double " +
      "subtraction (r14, VERDICT_r13 item 4)") {
    import spark.implicits._
    // the real fixture has NO cross-source exact dups — plant a
    // synthetic corpus where retractions visibly move served verdicts:
    // ten texts, each held by TWO base docs (i and i+10); the shard
    // (src0) clones the first five
    val d = tmpDir("fp_idx_delete_corpus")
    def text(i: Long) = s"planted content body number $i alpha beta"
    val base = (0L until 20L).map(i => (i, text(i % 10), "base"))
    val shard0 = (0L until 5L).map(i => (100L + i, text(i), "src0"))
    val all = base ++ shard0
    all.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val root = tmpDir("fp_idx_delete")
    FpIndex.ensure(spark, d, root)
    val before = rows(FpIndex.probe(spark, d, root))
    assert(before.values.count(_._2 == 1) == 5,
      "every shard clone must read dup against the planted base")
    // retract BOTH holders of text(0): the fp row drops entirely, so
    // the vacuum's nFps shrink is observable
    val deadIds = Seq(0L, 10L)
    val docsDf = all.toDF("doc_id", "text", "source")
    val deadDocs = docsDf.filter(col("doc_id").isin(deadIds: _*))
      .select("doc_id", "text")
    assert(FpIndex.delete(spark, root, deadDocs) == 2L)
    assert(FpIndex.delete(spark, root, deadDocs) == 0L,
      "re-delivering the retraction must be a counted no-op")
    intercept[IllegalArgumentException] {
      FpIndex.delete(spark, root, Seq((999999999L,
        "content that exists in no corpus zzz qqq")).toDF("doc_id", "text"))
    }
    val masked = rows(FpIndex.probe(spark, d, root))
    assert(masked(100L) == (0L, 0) && masked(101L)._2 == 1,
      s"retracting text(0)'s holders must clear doc 100's verdict: $masked")
    // exactness: == an index REBUILT over a corpus never containing
    // the dead docs, probed with the same shard fps
    val d2 = tmpDir("fp_idx_delete_corpus2")
    docsDf.filter(!col("doc_id").isin(deadIds: _*))
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val root2 = tmpDir("fp_idx_delete_root2")
    FpIndex.ensure(spark, d2, root2)
    val shard = Dedup.normFps(spark, d)
      .filter(col("source") === "src0").select("doc_id", "fp")
    val rebuilt = rows(FpIndex.probeFps(spark, root2, shard))
    assert(masked == rebuilt,
      "masked probe must equal the rebuilt-without index row-exact")
    // vacuum: fps rewritten (the fully-retracted fp row drops), nFps
    // re-pinned as the commit record, tombstones gone, probe unchanged
    val metaBefore = spark.read.parquet(s"$root/meta").as[FpMeta].head()
    val meta = FpIndex.vacuum(spark, root)
    assert(meta.nFps < metaBefore.nFps,
      "retracting a whole fp group must shrink the pinned row count")
    assert(spark.read.parquet(s"$root/fps").count() == meta.nFps)
    assert(!new java.io.File(s"$root/tombstones").exists)
    assert(rows(FpIndex.probe(spark, d, root)) == masked,
      "vacuum must not change served verdicts")
    assert(FpIndex.vacuum(spark, root) == meta,
      "vacuum with nothing tombstoned is a no-op")
    // crash window: fps swapped + marker written, then the JVM dies
    // before the tombstone drop. The re-entry must NOT subtract again
    // (count subtraction is not doc-keyed-idempotent — the marker is
    // the commit record), and a completing vacuum heals the root.
    // Retract only ONE holder of text(1): the count path (2 → 1)
    // exercises subtraction without the row dropping.
    val deadDocs2 = docsDf.filter(col("doc_id") === 1L)
      .select("doc_id", "text")
    assert(FpIndex.delete(spark, root, deadDocs2) == 1L)
    val expect2 = rows(FpIndex.probe(spark, d, root))
    assert(expect2(101L) == (1L, 1),
      s"one live holder must remain for doc 101: $expect2")
    FpIndex.failAfterSwap = true
    try intercept[RuntimeException] { FpIndex.vacuum(spark, root) }
    finally FpIndex.failAfterSwap = false
    assert(rows(FpIndex.probe(spark, d, root)) == expect2,
      "the crash window must not double-subtract the tombstoned counts")
    val healed = FpIndex.vacuum(spark, root)
    assert(!new java.io.File(s"$root/tombstones").exists &&
      !new java.io.File(s"$root/vacuumed").exists,
      "the re-entrant vacuum must complete the cleanup")
    assert(spark.read.parquet(s"$root/fps").count() == healed.nFps)
    assert(rows(FpIndex.probe(spark, d, root)) == expect2)
  }
}
