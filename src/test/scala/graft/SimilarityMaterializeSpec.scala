package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Materialize-once for the ANN shared frames (VERDICT_r06 item 5): the
  * quantized corpus, the per-variant LSH bucket assignments and the
  * three ANN result frames q_ann_recall composes are computed once per
  * (session, dir) and SHARED — before this, ~10 Similarity queries
  * re-quantized the corpus per call and q_ann_recall re-derived both
  * LSH variants AND the brute-force ground truth standalone. The
  * builds NEST (ann_lsh → lsh_buckets → quantized), which is exactly
  * what the restructured MaterializeOnce makes safe.
  */
class SimilarityMaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ANN frames are computed once: repeated calls return the same frame") {
    Similarity.invalidateMaterialized()
    // cold-cache NESTED ordering first: the ann_lsh build demands
    // lsh_buckets, which demands quantized — three cells claimed by one
    // build chain (the old computeIfAbsent would crash on a bin collision)
    val lsh = Similarity.qAnnLsh(spark, dir)
    assert(lsh eq Similarity.qAnnLsh(spark, dir))
    val topk = Similarity.qEmbedCosineTopk(spark, dir)
    assert(topk eq Similarity.qEmbedCosineTopk(spark, dir))
    val bands = Similarity.qAnnLshBands(spark, dir)
    assert(bands eq Similarity.qAnnLshBands(spark, dir))
  }

  test("q_ann_recall composes the materialized frames, not re-derivations") {
    Similarity.invalidateMaterialized()
    Similarity.qAnnLsh(spark, dir)
    Similarity.qAnnLshBands(spark, dir)
    Similarity.qEmbedCosineTopk(spark, dir)
    val plan = Similarity.qAnnRecall(spark, dir)
      .queryExecution.optimizedPlan.toString
    // all three inputs are checkpointed RDD scans — recall must contain
    // no corpus re-quantization (no transform over `embedding`) and no
    // parquet relation at all
    assert(!plan.contains("Relation") && !plan.contains("parquet"),
      s"recall re-reads the corpus:\n${plan.take(1500)}")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"recall must read materialized frames:\n${plan.take(1500)}")
  }

  test("materialized ANN results equal a fresh standalone recomputation") {
    Similarity.invalidateMaterialized()
    val cached = Similarity.qAnnLsh(spark, dir).collect()
      .map(_.toSeq).toSet
    Similarity.invalidateMaterialized()
    val fresh = Similarity.qAnnLshPlan(spark, dir).collect()
      .map(_.toSeq).toSet
    assert(cached == fresh)
    Similarity.invalidateMaterialized()
  }

  test("recall values survive materialization (regression vs r6 oracle)") {
    Similarity.invalidateMaterialized()
    val rows = Similarity.qAnnRecall(spark, dir)
      .agg(sum("n_exact"), sum("hits_lsh"), sum("hits_bands")).head()
    assert(rows.getLong(0) > 0)
    // hits bounded by ground-truth size; bands mean ≥ lsh mean is the
    // invariant spec's job — here just structural sanity on the shared path
    assert(rows.getLong(1) <= rows.getLong(0))
    assert(rows.getLong(2) <= rows.getLong(0))
  }

  test("IVF assignment is computed once and matches a fresh recomputation") {
    Similarity.invalidateMaterialized()
    // nested cold build: q_ann_ivf demands ivf_assigned → quantized
    Similarity.qAnnIvf(spark, dir).collect()
    val cellsPlan = Similarity.qIvfCells(spark, dir)
      .queryExecution.optimizedPlan.toString
    // cells must consume the materialized assignment, never re-assign
    assert(!cellsPlan.contains("parquet"),
      s"q_ivf_cells re-reads the corpus:\n${cellsPlan.take(1200)}")
    assert(cellsPlan.contains("LogicalRDD") || cellsPlan.contains("ExistingRDD"))
    val viaShared = Similarity.qAnnIvf(spark, dir).collect().map(_.toSeq).toSet
    Similarity.invalidateMaterialized()
    val fresh = Similarity.qAnnIvfPlan(spark, dir).collect().map(_.toSeq).toSet
    assert(viaShared == fresh)
    Similarity.invalidateMaterialized()
  }

  test("probe curve: recall is monotone in nprobe and nprobe=1 matches in-cell search") {
    Similarity.invalidateMaterialized()
    val rows = Similarity.qIvfProbeCurve(spark, dir).collect()
      .map(r => r.getAs[Int]("nprobe") -> r.getAs[Long]("recall_ppm")).toMap
    // more probes can only add candidates — recall must be nondecreasing
    assert(rows(1) <= rows(2) && rows(2) <= rows(4),
      s"recall not monotone: $rows")
    Similarity.invalidateMaterialized()
  }
}
