package graft

import graft.operators.MetricsEtl

/** Materialize-once for the parsed metrics frame (r7): the props-JSON
  * parse + label-map HOFs dominate the per-row cost of the metrics
  * view and seven queries consume it — the frame must be computed once
  * per (session, dir) and shared, with consumers planning against the
  * checkpointed scan (measured at sf1.0: q_label_values 5.5→0.5 s).
  */
class MetricsMaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("metrics() is computed once per (session, dir)") {
    graft.operators.Dedup.invalidateMaterialized() // shared cache
    val a = MetricsEtl.metrics(spark, dir)
    assert(a eq MetricsEtl.metrics(spark, dir))
  }

  test("consumers plan against the materialized scan, not a re-parse") {
    graft.operators.Dedup.invalidateMaterialized()
    MetricsEtl.metrics(spark, dir)
    for (df <- Seq(MetricsEtl.qLabelValues(spark, dir),
        MetricsEtl.qLabelCardinality(spark, dir),
        MetricsEtl.qAggWithout(spark, dir))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("from_json") && !plan.contains("parquet"),
        s"consumer re-parses the corpus:\n${plan.take(1200)}")
      assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
        s"consumer must read the materialized frame:\n${plan.take(1200)}")
    }
  }

  test("materialized results equal a fresh standalone recomputation") {
    graft.operators.Dedup.invalidateMaterialized()
    val cached = MetricsEtl.qLabelValues(spark, dir).collect()
      .map(_.toSeq).toSet
    graft.operators.Dedup.invalidateMaterialized()
    val fresh = MetricsEtl.metricsPlan(spark, dir)
    // recompute the same aggregation directly on the raw parse plan
    import org.apache.spark.sql.functions._
    val direct = fresh
      .select(col("name"),
        explode(arrays_zip(col("label_keys"), col("label_values"))).as("kv"))
      .select(col("name"), col("kv.label_keys").as("k"),
        col("kv.label_values").as("v"))
      .groupBy("k", "v")
      .agg(count(lit(1)).as("n_samples"),
        countDistinct("name").as("n_names"))
      .collect().map(_.toSeq).toSet
    assert(cached == direct)
  }

  test("token frames shared by unigram-LM and hapax (r7 late)") {
    graft.operators.Dedup.invalidateMaterialized()
    // force both consumers; the hapax plan must read the SAME
    // materialized token/tf scans the LM pipeline built (no re-explode)
    graft.operators.TextAnalysis.qUnigramLp(spark, dir).collect()
    val plan = graft.operators.TextAnalysis.qHapaxShare(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("parquet") && !plan.contains("explode"),
      s"hapax re-explodes the corpus:\n${plan.take(1200)}")
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"))
  }
}
