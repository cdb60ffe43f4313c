package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The materialize-once clusters API (VERDICT_r05 item 3): the CC
  * fixpoint and the near-dup pair list are computed once per
  * (session, dir) and SHARED by every consumer — before this, each of
  * q_dedup_clusters / q_cluster_canonical / q_dup_rate_by_source /
  * q_minhash_est_err re-ran the iterative fixpoint or the shingle
  * self-join standalone (~18 s of the r5 driver bench; a real pipeline
  * materializes clusters once, like the reference's ledger).
  */
class MaterializeOnceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clusters() is computed once: repeated calls return the same frame") {
    Dedup.invalidateMaterialized()
    val a = Dedup.clusters(spark, dir)
    val b = Dedup.clusters(spark, dir)
    assert(a eq b, "second call must hit the session cache")
    val p = Dedup.ngramPairs(spark, dir)
    assert(p eq Dedup.ngramPairs(spark, dir))
  }

  test("consumers plan against the materialized scan, not a re-derivation") {
    // after materialization, qClusterCanonical / qDupRateBySource /
    // qMinhashEstErr must contain NO shingle derivation (no explode of
    // the corpus) and NO iterative-join lineage — their cluster/pair
    // input is a checkpointed RDD scan
    Dedup.invalidateMaterialized()
    Dedup.clusters(spark, dir) // pay the fixpoint once
    for (df <- Seq(Dedup.qDedupClusters(spark, dir),
        Dedup.qClusterCanonical(spark, dir),
        Dedup.qDupRateBySource(spark, dir),
        Dedup.qMinhashEstErr(spark, dir))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("posexplode") && !plan.contains("Generate"),
        s"consumer re-derives shingles:\n${plan.take(1500)}")
      assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
        s"consumer must read the materialized frame:\n${plan.take(1500)}")
    }
  }

  test("materialized results equal a fresh standalone recomputation") {
    Dedup.invalidateMaterialized()
    val cached = Dedup.qDedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = Dedup.connectedComponents(
        Dedup.ngramPairsPlan(spark, dir).select("doc_a", "doc_b"))
      .withColumn("cluster_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("label")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cached == fresh)
  }

  test("invalidateMaterialized forces a new computation") {
    val a = Dedup.clusters(spark, dir)
    Dedup.invalidateMaterialized()
    val b = Dedup.clusters(spark, dir)
    assert(!(a eq b))
  }

  test("cold-cache nested build: clusters before ngram_pairs (VERDICT_r06 item 1)") {
    // clusters' build thunk itself demands ngramPairs — with the old
    // computeIfAbsent implementation this threw `IllegalStateException:
    // Recursive update` whenever the two keys landed in the same hash
    // bin (a per-JVM coin flip on the session's identity hash). The
    // fixed MaterializeOnce claims a per-key cell with putIfAbsent and
    // runs the build OUTSIDE the map lock, so nesting is always safe.
    // Pin the dangerous ordering: cold cache, clusters FIRST.
    Dedup.invalidateMaterialized()
    val c = Dedup.clusters(spark, dir)
    assert(c.count() > 0)
    // the nested build must have populated the inner key too
    val p = Dedup.ngramPairs(spark, dir)
    assert(p eq Dedup.ngramPairs(spark, dir),
      "ngram_pairs must be cached by the nested build")
  }
}
