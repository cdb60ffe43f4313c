package graft

import graft.index.{AnnIndex, IndexMeta}
import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** The ANN build/serve split (VERDICT_r07 item 2): served results must
  * equal built-in-session results, the serve PLAN must not recompute
  * the index (no assignment argmax, no encode), and `ensure` must
  * validate-or-rebuild correctly — including refusing to clobber a
  * newer-format index.
  */
class IndexServeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("served IVF search == in-session q_ann_ivf, and ensure() reuses a valid index") {
    val root = tmpDir("ann_index")
    AnnIndex.write(spark, sf, root)
    val served = AnnIndex.annSearch(spark, root)
    assert(rowSet(served) == rowSet(Similarity.qAnnIvf(spark, sf)))
    // a second ensure must serve the existing artifacts, not rebuild:
    // the meta file's physical identity is the witness
    def metaFiles() = new java.io.File(s"$root/meta").listFiles()
      .map(f => (f.getName, f.lastModified)).toSet
    val before = metaFiles()
    assert(AnnIndex.ensure(spark, sf, root) == root)
    assert(metaFiles() == before, "valid index must be served untouched")
  }

  test("the serve plan reads parquet — no assignment argmax, no broadcast nested loop") {
    val root = tmpDir("ann_index_plan")
    AnnIndex.write(spark, sf, root)
    val plan = AnnIndex.annSearch(spark, root)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"served search must not re-run the n*K centroid argmax:\n${plan.take(1200)}")
    assert(plan.contains("Parquet"),
      s"served search must scan the index parquet:\n${plan.take(1200)}")
  }

  test("served ADC search == in-session q_ivf_pq (codebook round-trips through parquet)") {
    val root = tmpDir("ann_index_adc")
    AnnIndex.write(spark, sf, root)
    assert(rowSet(AnnIndex.adcSearch(spark, sf, root)) ==
      rowSet(Similarity.qIvfPq(spark, sf)))
  }

  test("ensure rebuilds a stale index (corpus-snapshot mismatch) and a missing one") {
    import spark.implicits._
    val root = tmpDir("ann_index_stale")
    // missing → build
    AnnIndex.ensure(spark, sf, root)
    val good = AnnIndex.readMeta(spark, root).get
    assert(good.corpusDir == sf && good.formatVersion == AnnIndex.FormatVersion)
    // tamper: claim a different corpus row count → stale → rebuild
    Seq(good.copy(nVectors = good.nVectors + 1)).toDS().toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta")
    AnnIndex.ensure(spark, sf, root)
    assert(AnnIndex.readMeta(spark, root).get == good,
      "stale index must be rebuilt to the current snapshot")
  }

  test("a NEWER-format index is never clobbered; an absent index refuses to serve") {
    import spark.implicits._
    val root = tmpDir("ann_index_vers")
    Seq(IndexMeta(AnnIndex.FormatVersion + 1, sf, 1L, 1, 1, 1, 1))
      .toDS().toDF().coalesce(1).write.parquet(s"$root/meta")
    val e = intercept[IllegalStateException] { AnnIndex.ensure(spark, sf, root) }
    assert(e.getMessage.contains("refusing to overwrite"))
    val e2 = intercept[IllegalStateException] {
      AnnIndex.annSearch(spark, tmpDir("ann_index_absent")).collect()
    }
    assert(e2.getMessage.contains("no readable index meta"))
  }

  test("append: frozen-book incremental update == one-shot full build") {
    import spark.implicits._
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    // sub-corpus: first 400 vectors (superset of the K=16 seed
    // centroids, so the frozen book equals the full build's book)
    val subDir = tmpDir("ann_sub_corpus")
    all.filter(col("vec_id") < 400)
      .write.parquet(s"$subDir/embeddings.parquet")
    val incRoot = tmpDir("ann_index_inc")
    AnnIndex.write(spark, subDir, incRoot)
    val metaBefore = AnnIndex.readMeta(spark, incRoot).get
    assert(metaBefore.nVectors == 400)
    val newMeta = AnnIndex.append(spark, subDir, incRoot,
      all.filter(col("vec_id") >= 400).select("vec_id", "embedding"))
    assert(newMeta.nVectors == all.count())
    val fullRoot = tmpDir("ann_index_full")
    AnnIndex.write(spark, sf, fullRoot)
    assert(rowSet(AnnIndex.annSearch(spark, incRoot)) ==
      rowSet(AnnIndex.annSearch(spark, fullRoot)),
      "incrementally-appended posting lists must serve the same results")
    assert(rowSet(AnnIndex.adcSearch(spark, sf, incRoot)) ==
      rowSet(AnnIndex.adcSearch(spark, sf, fullRoot)),
      "appended codes must ADC-serve identically")
    // duplicate ids are rejected, not silently double-indexed
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, subDir, incRoot,
        all.filter(col("vec_id") === 10).select("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("already indexed"))
  }

  test("q_ann_served (the registered query) matches q_ann_ivf end-to-end") {
    assert(rowSet(Similarity.qAnnServed(spark, sf)) ==
      rowSet(Similarity.qAnnIvf(spark, sf)))
  }
}
