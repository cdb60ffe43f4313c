package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every operator is a named `(SparkSession, sfDir) => DataFrame`; each
  * has an equivalent DuckDB `oracleSql` (hash-compared by the driver at
  * sf0.01) unless noted "rows-only" in SURVEY.md §2.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Olap.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A — reference ETL surface (metrics pipeline)
    "q_metrics_ingest" -> (MetricsEtl.qMetricsIngest _),
    "q_metrics_id" -> (MetricsEtl.qMetricsId _),
    "q_metrics_skipped" -> (MetricsEtl.qMetricsSkipped _),
    "q_tsv_format" -> (MetricsEtl.qTsvFormat _),
    "q_window_batches" -> (MetricsEtl.qWindowBatches _),
    "q_etl_state" -> (MetricsEtl.qEtlState _),
    "q_dedup_final" -> (MetricsEtl.qDedupFinal _),
    "q_selector" -> (MetricsEtl.qSelector _),
    "q_rate" -> (MetricsEtl.qRate _),
    "q_rate_extrapolated" -> (MetricsEtl.qRateExtrapolated _),
    "q_resets" -> (MetricsEtl.qResets _),
    "q_irate" -> (MetricsEtl.qIrate _),
    "q_delta" -> (MetricsEtl.qDelta _),
    "q_quantile_by_label" -> (MetricsEtl.qQuantileByLabel _),
    "q_increase" -> (MetricsEtl.qIncrease _),
    "q_over_time" -> (MetricsEtl.qOverTime _),
    "q_daily_partition" -> (MetricsEtl.qDailyPartition _),
    "q_agg_by_label" -> (MetricsEtl.qAggByLabel _),
    "q_promql_topk" -> (MetricsEtl.qPromqlTopk _),
    "q_histogram_quantile" -> (MetricsEtl.qHistogramQuantile _),
    "q_deriv" -> (MetricsEtl.qDeriv _),
    "q_label_join" -> (MetricsEtl.qLabelJoin _),
    // §2.B — OLAP core
    "q1_pricing" -> (Olap.q1Pricing _),
    "q3_topk_join" -> (Olap.q3TopkJoin _),
    "q5_region_join" -> (Olap.q5RegionJoin _),
    "q_window_running" -> (Olap.qWindowRunning _),
    "q_topk_per_group" -> (Olap.qTopkPerGroup _),
    "q_sessionize" -> (Olap.qSessionize _),
    "q_asof_join" -> (Olap.qAsofJoin _),
    "q_range_join" -> (Olap.qRangeJoin _),
    "q_distinct_approx" -> (Olap.qDistinctApprox _),
    "q_stream_window_agg" -> (Olap.qStreamWindowAgg _),
    "q_percentiles" -> (Olap.qPercentiles _),
    "q_percentiles_approx" -> (Olap.qPercentilesApprox _),
    "q_pivot" -> (Olap.qPivot _),
    "q_semi_join" -> (Olap.qSemiJoin _),
    "q_anti_join" -> (Olap.qAntiJoin _),
    "q_rollup" -> (Olap.qRollup _),
    // §2.C — LLM-training-data pipeline
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_fingerprint" -> (Dedup.qFingerprint _),
    "q_dedup_ngram" -> (Dedup.qDedupNgram _),
    "q_dedup_clusters" -> (Dedup.qDedupClusters _),
    "q_minhash_lsh" -> (Dedup.qMinhashLsh _),
    "q_simhash" -> (Dedup.qSimhash _),
    "q_decontaminate" -> (Dedup.qDecontaminate _),
    "q_embed_cosine_topk" -> (Similarity.qEmbedCosineTopk _),
    "q_ann_lsh" -> (Similarity.qAnnLsh _),
    "q_ann_ivf" -> (Similarity.qAnnIvf _),
    "q_ann_lsh_bands" -> (Similarity.qAnnLshBands _),
    "q_dedup_embed" -> (Similarity.qDedupEmbed _),
    "q_lang_id" -> (TextAnalysis.qLangId _),
    "q_quality" -> (TextAnalysis.qQuality _),
    "q_tokens" -> (TextAnalysis.qTokens _),
    "q_chunks" -> (TextAnalysis.qChunks _),
    "q_pack" -> (TextAnalysis.qPack _),
    "q_tfidf" -> (TextAnalysis.qTfidf _),
    "q_filter" -> (TextAnalysis.qFilter _),
    "q_sample" -> (TextAnalysis.qSample _),
    "q_multimodal_meta" -> (Multimodal.qMultimodalMeta _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_metrics_ingest" -> MetricsEtl.metricsIngestSql,
    "q_metrics_id" -> MetricsEtl.metricsIdSql,
    "q_metrics_skipped" -> MetricsEtl.metricsSkippedSql,
    "q_tsv_format" -> MetricsEtl.tsvFormatSql,
    "q_window_batches" -> MetricsEtl.windowBatchesSql,
    "q_etl_state" -> MetricsEtl.etlStateSql,
    "q_dedup_final" -> MetricsEtl.dedupFinalSql,
    "q_selector" -> MetricsEtl.selectorSql,
    "q_rate" -> MetricsEtl.rateSql,
    "q_rate_extrapolated" -> MetricsEtl.rateExtrapolatedSql,
    "q_resets" -> MetricsEtl.resetsSql,
    "q_irate" -> MetricsEtl.irateSql,
    "q_delta" -> MetricsEtl.deltaSql,
    "q_quantile_by_label" -> MetricsEtl.quantileByLabelSql,
    "q_increase" -> MetricsEtl.increaseSql,
    "q_over_time" -> MetricsEtl.overTimeSql,
    "q_daily_partition" -> MetricsEtl.dailyPartitionSql,
    "q_agg_by_label" -> MetricsEtl.aggByLabelSql,
    "q_promql_topk" -> MetricsEtl.promqlTopkSql,
    "q_histogram_quantile" -> MetricsEtl.histogramQuantileSql,
    "q_deriv" -> MetricsEtl.derivSql,
    "q_label_join" -> MetricsEtl.labelJoinSql,
    "q1_pricing" -> Olap.q1Sql,
    "q3_topk_join" -> Olap.q3Sql,
    "q5_region_join" -> Olap.q5Sql,
    "q_window_running" -> Olap.qWindowRunningSql,
    "q_topk_per_group" -> Olap.qTopkPerGroupSql,
    "q_sessionize" -> Olap.qSessionizeSql,
    "q_asof_join" -> Olap.qAsofJoinSql,
    "q_range_join" -> Olap.qRangeJoinSql,
    "q_distinct_approx" -> Olap.qDistinctApproxSql,
    "q_stream_window_agg" -> Olap.qStreamWindowAggSql,
    "q_percentiles" -> Olap.qPercentilesSql,
    "q_percentiles_approx" -> Olap.qPercentilesApproxSql,
    "q_pivot" -> Olap.qPivotSql,
    "q_semi_join" -> Olap.qSemiJoinSql,
    "q_anti_join" -> Olap.qAntiJoinSql,
    "q_rollup" -> Olap.qRollupSql,
    "q_dedup_exact" -> Dedup.dedupExactSql,
    "q_fingerprint" -> Dedup.fingerprintSql,
    "q_dedup_ngram" -> Dedup.dedupNgramSql,
    "q_dedup_clusters" -> Dedup.dedupClustersSql,
    "q_minhash_lsh" -> Dedup.minhashLshSql,
    "q_simhash" -> Dedup.simhashSql,
    "q_decontaminate" -> Dedup.decontaminateSql,
    "q_embed_cosine_topk" -> Similarity.embedCosineTopkSql,
    "q_ann_lsh" -> Similarity.annLshSql,
    "q_ann_ivf" -> Similarity.annIvfSql,
    "q_ann_lsh_bands" -> Similarity.annLshBandsSql,
    "q_dedup_embed" -> Similarity.dedupEmbedSql,
    "q_lang_id" -> TextAnalysis.langIdSql,
    "q_quality" -> TextAnalysis.qualitySql,
    "q_tokens" -> TextAnalysis.tokensSql,
    "q_chunks" -> TextAnalysis.chunksSql,
    "q_pack" -> TextAnalysis.packSql,
    "q_tfidf" -> TextAnalysis.tfidfSql,
    "q_filter" -> TextAnalysis.filterSql,
    "q_sample" -> TextAnalysis.sampleSql,
    "q_multimodal_meta" -> Multimodal.multimodalMetaSql
  )
}
