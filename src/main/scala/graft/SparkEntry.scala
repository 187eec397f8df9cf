package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Bi, Etl, Hierarchy}
import graft.ext.{Dedup, Events, Multimodal, Sampling, Similarity, Sketches, TextAnalysis}
import graft.functions.RollingFingerprint.rolling_fingerprint
import org.apache.spark.sql.functions.col

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family (SURVEY.md §2)
  * to a `(spark, sfDir) => DataFrame` builder; `oracleSql` carries the
  * DuckDB-runnable twin used by the driver's correctness gate. Keys are
  * ListMap-ordered to keep reports readable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Bi.revenueByCategory(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // Reference BI queries (BI_Questions.sql)
    "q01_revenue_by_category" -> (Bi.revenueByCategory _),
    "q02_top_customers" -> (Bi.topCustomers _),
    "q03_monthly_trend" -> (Bi.monthlyTrend _),
    // Recursive hierarchy + anti-join (sql_definitions.sql)
    "q04_org_closure" -> (Hierarchy.orgClosureNative _),
    "q05_manager_chains" -> (Hierarchy.managerChainsNative _),
    "q06_customers_without_orders" -> (Hierarchy.customersWithoutOrders _),
    // ETL pipeline operators (ETL_DAG.py)
    "q07_etl_clean_sales" -> (Etl.cleanSales _),
    "q08_quality_report" -> (Etl.qualityReport _),
    "q09_country_resolution" -> (Etl.countryResolution _),
    // Training-data pipeline extensions (SURVEY.md §7.5)
    "q10_dedup_exact" -> (Dedup.exact _),
    "q11_minhash_lsh_pairs" -> (Dedup.minhashPairs _),
    "q12_simhash" -> (Dedup.simhash _),
    "q13_embedding_topk" -> (Similarity.bruteForceTopK _),
    "q14_ann_lsh" -> (Similarity.annLsh _),
    "q15_lang_id" -> (TextAnalysis.langId _),
    "q16_text_quality" -> (TextAnalysis.qualityScore _),
    "q17_token_counts" -> (TextAnalysis.tokenCounts _),
    "q18_event_tumbling" -> (Events.tumbling _),
    "q19_event_sliding" -> (Events.sliding _),
    "q20_event_sessions" -> (Events.sessions _),
    "q21_multimodal_meta" -> (Multimodal.binaryMeta _),
    "q22_multimodal_features" -> (Multimodal.features _),
    "q23_fingerprint" -> ((s: SparkSession, dir: String) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), rolling_fingerprint(col("text"), 8).as("fingerprint"))
        .orderBy("doc_id")),
    "q24_calendar_rollup" -> (Bi.calendarRollup _),
    "q25_ann_ivf" -> (Similarity.annIvf _),
    "q26_corpus_prep" -> (TextAnalysis.corpusPrep _),
    "q27_embedding_neardup" -> (Similarity.embeddingNearDups _),
    "q28_distinct_counts" -> (Bi.distinctCounts _),
    "q29_ngram_jaccard" -> (Dedup.ngramJaccardPairs _),
    "q30_dup_clusters" -> (Dedup.clusters _),
    "q31_stratified_sample" -> (Sampling.stratifiedSample _),
    "q32_frame_sample" -> (Multimodal.frameSample _),
    "q33_token_shards" -> (Sampling.tokenShards _),
    "q34_repetition" -> (TextAnalysis.repetition _),
    "q35_decontamination" -> (TextAnalysis.decontamination _),
    "q36_event_props" -> (Events.propsRollup _),
    "q37_incremental_dedup" -> (Dedup.incrementalDedup _),
    "q38_asof_join" -> (Events.asofJoin _),
    "q39_text_scrub" -> (TextAnalysis.scrub _),
    "q40_user_deltas" -> (Events.userDeltas _),
    "q41_event_pivot" -> (Events.dailyPivot _),
    "q42_revenue_rollup" -> (Bi.revenueRollup _),
    "q43_length_quantiles" -> (TextAnalysis.lengthQuantiles _),
    "q44_salted_hot_join" -> (Events.saltedHotJoin _),
    "q45_distinctive_terms" -> (TextAnalysis.distinctiveTerms _),
    "q46_top_docs_per_lang" -> (Sampling.topDocsPerLang _),
    "q47_scd1_upsert" -> (Etl.scd1Upsert _),
    "q48_oov_rate" -> (TextAnalysis.oovRate _),
    "q49_value_histogram" -> (Events.valueHistogram _),
    "q50_signup_funnel" -> (Events.funnel _),
    "q51_resize_thumbs" -> (Multimodal.resizeThumbs _),
    "q52_weighted_mix" -> (Sampling.weightedMix _),
    "q53_retention_cohorts" -> (Events.retentionCohorts _),
    "q54_bpe_candidates" -> (TextAnalysis.bpeMergeCandidates _),
    "q55_range_join" -> (Events.rangeJoin _),
    "q56_vocab_coverage" -> (TextAnalysis.vocabCoverage _),
    "q57_knn_label_agreement" -> (Similarity.knnLabelAgreement _),
    "q58_rolling_daily" -> (Events.rollingDaily _),
    "q59_train_split" -> (Sampling.trainSplit _),
    "q60_snapshot_diff" -> (Etl.snapshotDiff _),
    "q61_context_chunks" -> (Sampling.contextChunks _),
    "q62_dedup_survivors" -> (Dedup.dedupSurvivors _),
    "q63_semi_join" -> (Hierarchy.customersWithOrders _),
    "q64_retention_sets" -> (Bi.retentionSets _),
    "q65_spend_quartiles" -> (Bi.spendQuartiles _),
    "q66_event_cube" -> (Events.eventCube _),
    "q67_token_positions" -> (TextAnalysis.tokenPositions _),
    "q68_priority_stats" -> (Bi.priorityStats _),
    "q69_variant_buckets" -> (Events.variantBuckets _),
    "q70_unigram_entropy" -> (TextAnalysis.unigramEntropy _),
    "q71_user_next_window" -> (Events.userNextWindow _),
    "q72_sequence_packing" -> (Sampling.sequencePacking _),
    "q73_lm_score" -> (TextAnalysis.lmScore _),
    "q74_boilerplate_ngrams" -> (TextAnalysis.boilerplateNgrams _),
    "q75_scd2_history" -> (Events.scd2History _),
    "q76_profile" -> (Etl.profile _),
    "q77_value_outliers" -> (Events.valueOutliers _),
    "q78_embedding_stats" -> (Similarity.embeddingStats _),
    "q79_source_dup_matrix" -> (Dedup.sourceDupMatrix _),
    "q80_dup_pagerank" -> (Dedup.dupPagerank _),
    "q81_ann_recall" -> (Similarity.annRecall _),
    "q82_bpe_train" -> (TextAnalysis.bpeTrain _),
    "q83_regional_revenue" -> (Bi.regionalRevenue _),
    "q84_above_avg_orders" -> (Bi.aboveAvgOrders _),
    "q85_gap_fill" -> (Events.gapFill _),
    "q86_lang_source_independence" -> (TextAnalysis.langSourceIndependence _),
    "q87_hll_distinct" -> (Sketches.hllDistinct _),
    "q88_zorder_stats" -> (graft.etl.Layout.zorderStats _),
    "q89_bm25" -> (TextAnalysis.bm25 _),
    "q90_ewma" -> (Events.ewmaValue _),
    "q91_triangles" -> (Dedup.triangleStats _),
    "q92_value_percentiles" -> (Events.valuePercentiles _),
    "q93_hour_regression" -> (Events.hourValueRegression _),
    "q94_bloom_prefilter" -> (Bi.bloomPrefilterRevenue _),
    "q95_daily_unpivot" -> (Events.dailyUnpivot _),
    "q96_priority_sets" -> (Bi.prioritySets _),
    "q97_bpe_encode" -> (TextAnalysis.bpeEncode _),
    "q98_logit_quality" -> (TextAnalysis.logitQuality _),
    "q99_cms_heavy_hitters" -> (Sketches.cmsHeavyHitters _),
    "q100_interval_overlap" -> (Events.sessionIncidentOverlap _),
    "q101_trending_terms" -> (TextAnalysis.trendingTerms _),
    "q102_pmi_collocations" -> (TextAnalysis.pmiCollocations _),
    "q103_lateral_topk" -> (Bi.lateralTopCustomers _),
    "q104_value_moments" -> (Events.valueMoments _),
    "q105_stratified_twopass" -> (Sampling.stratifiedTwoPass _),
    "q106_csv_clean" -> (Etl.csvClean _),
    "q107_dup_spans" -> (TextAnalysis.dupSpans _),
    "q108_kmeans_clusters" -> (Similarity.kmeansClusters _),
    "q109_weighted_twopass" -> (Sampling.weightedMixTwoPass _)
  )

  def oracleSql: Map[String, String] = ListMap(
    "q01_revenue_by_category" -> Bi.revenueByCategorySql,
    "q02_top_customers" -> Bi.topCustomersSql,
    "q03_monthly_trend" -> Bi.monthlyTrendSql,
    "q04_org_closure" -> Hierarchy.orgClosureSql,
    "q05_manager_chains" -> Hierarchy.managerChainsSql,
    "q06_customers_without_orders" -> Hierarchy.customersWithoutOrdersSql,
    "q07_etl_clean_sales" -> Etl.cleanSalesSql,
    "q08_quality_report" -> Etl.qualityReportSql,
    "q09_country_resolution" -> Etl.countryResolutionSql,
    "q10_dedup_exact" -> Dedup.exactSql,
    "q11_minhash_lsh_pairs" -> Dedup.minhashPairsSql,
    "q12_simhash" -> Dedup.simhashSql,
    "q13_embedding_topk" -> Similarity.bruteForceTopKSql,
    "q14_ann_lsh" -> Similarity.annLshSql,
    "q15_lang_id" -> TextAnalysis.langIdSql,
    "q16_text_quality" -> TextAnalysis.qualityScoreSql,
    "q17_token_counts" -> TextAnalysis.tokenCountsSql,
    "q18_event_tumbling" -> Events.tumblingSql,
    "q19_event_sliding" -> Events.slidingSql,
    "q20_event_sessions" -> Events.sessionsSql,
    "q21_multimodal_meta" -> Multimodal.binaryMetaSql,
    "q22_multimodal_features" -> Multimodal.featuresSql,
    // q23: same polynomial-min fingerprint re-derived in DuckDB — HUGEINT
    // arithmetic for the 61-bit modulus, valid because the fixture text
    // is pure ASCII (UTF-16 code unit == code point there).
    "q23_fingerprint" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    [substr(text, i, 8) for i in generate_series(1, greatest(length(text)-7, 1))] AS wins
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    list_min([CAST(list_reduce(
        |        [CAST(unicode(c) AS HUGEINT) for c in string_split_regex(win, '')],
        |        (acc, x) -> (acc * 257 + x) % 2305843009213693951::HUGEINT
        |      ) AS BIGINT) for win in wins]) AS fingerprint
        |  FROM w
        |)
        |SELECT doc_id, fingerprint FROM h ORDER BY doc_id""".stripMargin,
    "q24_calendar_rollup" -> Bi.calendarRollupSql,
    "q25_ann_ivf" -> Similarity.annIvfSql,
    "q26_corpus_prep" -> TextAnalysis.corpusPrepSql,
    "q27_embedding_neardup" -> Similarity.embeddingNearDupsSql,
    "q28_distinct_counts" -> Bi.distinctCountsSql,
    "q29_ngram_jaccard" -> Dedup.ngramJaccardPairsSql,
    "q30_dup_clusters" -> Dedup.clustersSql,
    "q31_stratified_sample" -> Sampling.stratifiedSampleSql,
    "q32_frame_sample" -> Multimodal.frameSampleSql,
    "q33_token_shards" -> Sampling.tokenShardsSql,
    "q34_repetition" -> TextAnalysis.repetitionSql,
    "q35_decontamination" -> TextAnalysis.decontaminationSql,
    "q36_event_props" -> Events.propsRollupSql,
    "q37_incremental_dedup" -> Dedup.incrementalDedupSql,
    "q38_asof_join" -> Events.asofJoinSql,
    "q39_text_scrub" -> TextAnalysis.scrubSql,
    "q40_user_deltas" -> Events.userDeltasSql,
    "q41_event_pivot" -> Events.dailyPivotSql,
    "q42_revenue_rollup" -> Bi.revenueRollupSql,
    "q43_length_quantiles" -> TextAnalysis.lengthQuantilesSql,
    "q44_salted_hot_join" -> Events.saltedHotJoinSql,
    "q45_distinctive_terms" -> TextAnalysis.distinctiveTermsSql,
    "q46_top_docs_per_lang" -> Sampling.topDocsPerLangSql,
    "q47_scd1_upsert" -> Etl.scd1UpsertSql,
    "q48_oov_rate" -> TextAnalysis.oovRateSql,
    "q49_value_histogram" -> Events.valueHistogramSql,
    "q50_signup_funnel" -> Events.funnelSql,
    "q51_resize_thumbs" -> Multimodal.resizeThumbsSql,
    "q52_weighted_mix" -> Sampling.weightedMixSql,
    "q53_retention_cohorts" -> Events.retentionCohortsSql,
    "q54_bpe_candidates" -> TextAnalysis.bpeMergeCandidatesSql,
    "q55_range_join" -> Events.rangeJoinSql,
    "q56_vocab_coverage" -> TextAnalysis.vocabCoverageSql,
    "q57_knn_label_agreement" -> Similarity.knnLabelAgreementSql,
    "q58_rolling_daily" -> Events.rollingDailySql,
    "q59_train_split" -> Sampling.trainSplitSql,
    "q60_snapshot_diff" -> Etl.snapshotDiffSql,
    "q61_context_chunks" -> Sampling.contextChunksSql,
    "q62_dedup_survivors" -> Dedup.dedupSurvivorsSql,
    "q63_semi_join" -> Hierarchy.customersWithOrdersSql,
    "q64_retention_sets" -> Bi.retentionSetsSql,
    "q65_spend_quartiles" -> Bi.spendQuartilesSql,
    "q66_event_cube" -> Events.eventCubeSql,
    "q67_token_positions" -> TextAnalysis.tokenPositionsSql,
    "q68_priority_stats" -> Bi.priorityStatsSql,
    "q69_variant_buckets" -> Events.variantBucketsSql,
    "q70_unigram_entropy" -> TextAnalysis.unigramEntropySql,
    "q71_user_next_window" -> Events.userNextWindowSql,
    "q72_sequence_packing" -> Sampling.sequencePackingSql,
    "q73_lm_score" -> TextAnalysis.lmScoreSql,
    "q74_boilerplate_ngrams" -> TextAnalysis.boilerplateNgramsSql,
    "q75_scd2_history" -> Events.scd2HistorySql,
    "q76_profile" -> Etl.profileSql,
    "q77_value_outliers" -> Events.valueOutliersSql,
    "q78_embedding_stats" -> Similarity.embeddingStatsSql,
    "q79_source_dup_matrix" -> Dedup.sourceDupMatrixSql,
    "q80_dup_pagerank" -> Dedup.dupPagerankSql,
    "q81_ann_recall" -> Similarity.annRecallSql,
    "q82_bpe_train" -> TextAnalysis.bpeTrainSql,
    "q83_regional_revenue" -> Bi.regionalRevenueSql,
    "q84_above_avg_orders" -> Bi.aboveAvgOrdersSql,
    "q85_gap_fill" -> Events.gapFillSql,
    "q86_lang_source_independence" -> TextAnalysis.langSourceIndependenceSql,
    "q87_hll_distinct" -> Sketches.hllDistinctSql,
    "q88_zorder_stats" -> graft.etl.Layout.zorderStatsSql,
    "q89_bm25" -> TextAnalysis.bm25Sql,
    "q90_ewma" -> Events.ewmaValueSql,
    "q91_triangles" -> Dedup.triangleStatsSql,
    "q92_value_percentiles" -> Events.valuePercentilesSql,
    "q93_hour_regression" -> Events.hourValueRegressionSql,
    "q94_bloom_prefilter" -> Bi.bloomPrefilterRevenueSql,
    "q95_daily_unpivot" -> Events.dailyUnpivotSql,
    "q96_priority_sets" -> Bi.prioritySetsSql,
    "q97_bpe_encode" -> TextAnalysis.bpeEncodeSql,
    "q98_logit_quality" -> TextAnalysis.logitQualitySql,
    "q99_cms_heavy_hitters" -> Sketches.cmsHeavyHittersSql,
    "q100_interval_overlap" -> Events.sessionIncidentOverlapSql,
    "q101_trending_terms" -> TextAnalysis.trendingTermsSql,
    "q102_pmi_collocations" -> TextAnalysis.pmiCollocationsSql,
    "q103_lateral_topk" -> Bi.lateralTopCustomersSql,
    "q104_value_moments" -> Events.valueMomentsSql,
    // deliberately q31's EXACT oracle: the two-pass distributed
    // selection must reproduce the per-stratum window bit for bit
    "q105_stratified_twopass" -> Sampling.stratifiedSampleSql,
    "q106_csv_clean" -> Etl.csvCleanSql,
    "q107_dup_spans" -> TextAnalysis.dupSpansSql,
    "q108_kmeans_clusters" -> Similarity.kmeansClustersSql,
    // deliberately q52's EXACT oracle: the two-pass weighted mix must
    // reproduce the per-language window bit for bit
    "q109_weighted_twopass" -> Sampling.weightedMixSql
  )
}
