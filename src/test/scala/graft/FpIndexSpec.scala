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
}
