package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> operators.Relational.pricingSummary,
    "q2_analysis_join" -> operators.Relational.analysisJoin,
    "q3_pivot_wide" -> operators.Relational.pivotWide,
    "q4_unpivot_long" -> operators.Relational.unpivotLong,
    "q5_split_explode" -> operators.Relational.splitExplode,
    "q6_text_clean" -> operators.Relational.textClean,
    "q7_group_index" -> operators.Relational.groupIndex,
    "q8_zscore" -> operators.Relational.zscore,
    "q9_ratio_analytics" -> operators.Relational.ratioAnalytics,
    "q10_coalesce_fill" -> operators.Relational.coalesceFill,
    "q11_dup_check" -> operators.Relational.dupCheck,
    "q12_validity_filter" -> operators.Relational.validityFilter,
    "q13_topk_group" -> operators.Relational.topkGroup,
    "q14_star_join" -> operators.Relational.starJoin,
    "q15_anti_semi" -> operators.Relational.antiSemi,
    "q16_percentiles" -> operators.Relational.percentiles,
    "q17_event_window" -> operators.Events.eventWindow,
    "q18_sessionize" -> operators.Events.sessionize,
    "q19_dedup_exact" -> dedup.Dedup.dedupExact,
    "q20_dedup_minhash" -> dedup.Dedup.dedupMinhash,
    "q21_dedup_simhash" -> dedup.Dedup.dedupSimhash,
    // registered path is the PPJoin prefix-filtered variant: identical
    // results (lossless filters), but hot shingles generate zero
    // candidates instead of df² pairs — the 100 TB-safe shape
    "q22_ngram_jaccard" -> dedup.PrefixJaccard.ngramJaccardPrefix,
    "q23_embed_neardup" -> ann.Ann.embedNearDup,
    "q24_ann_brute" -> ann.Ann.annBrute,
    "q25_ann_lsh" -> ann.Ann.annLsh,
    "q25b_ann_ivf" -> ann.Ann.annIvf,
    "q26_langid" -> textstats.TextStats.langid,
    "q27_quality" -> textstats.TextStats.quality,
    "q28_tokens" -> textstats.TextStats.tokenCounts,
    "q29_fingerprint" -> textstats.TextStats.fingerprint,
    "q30_multimodal_meta" -> multimodal.Multimodal.multimodalMeta,
    "q31_profile" -> operators.Relational.profile,
    "q32_regression" -> operators.Regression.regression,
    "q33_spatial_join" -> operators.Geo.spatialJoin,
    "q34_separate" -> operators.Relational.separateCols,
    "q35_asof_join" -> operators.AsOf.asofEventState,
    "q36_range_join" -> operators.RangeJoin.rangeEventWindows,
    "q37_tfidf" -> textstats.TextStats.tfidf,
    "q38_stratified_sample" -> operators.Sampling.stratifiedSample,
    "q39_dedup_cluster" -> dedup.Components.dedupCluster,
    "q40_gopher_repetition" -> textstats.TextStats.gopherRepetition,
    "q41_pii_redact" -> textstats.Redact.piiRedact,
    "q42_contamination" -> dedup.Contamination.contamination,
    "q43_rollup" -> operators.Relational.rollupStats,
    "q44_rolling" -> operators.Events.rollingStats,
    "q45_kmeans" -> ann.Kmeans.kmeansClusters,
    "q46_incr_dedup" -> dedup.Incremental.incrementalDedup,
    "q47_ntile_bin" -> operators.Binning.ntileBin,
    "q48_histogram" -> operators.Binning.histogram,
    "q49_heavy_hitters" -> textstats.TextStats.heavyHitters,
    "q50_transitions" -> operators.Events.transitions,
    "q51_cohort" -> operators.Events.cohortRetention,
    "q52_curation" -> textstats.Curation.curate,
    "q53_expectations" -> operators.Expectations.orderExpectations,
    "q54_crs_reproject" -> operators.Crs.reproject,
    "q55_point_in_polygon" -> operators.Geo.pointInPolygon,
    "q56_semdedup" -> ((s, d) => ann.Kmeans.semDedup(s, d)),
    "q57_chunking" -> operators.Chunking.chunk,
    "q58_packing" -> operators.Chunking.pack,
    "q59_bloom_dedup" -> dedup.Bloom.bloomDedup,
    "q60_domain_mix" -> operators.Sampling.domainMixSample,
    "q61_quality_score" -> textstats.QualityModel.qualityScore,
    "q62_dup_spans" -> dedup.Spans.dupSpans,
    "q63_span_removal" -> dedup.Spans.removeDupSpans,
    "q64_domain_rebalance" -> operators.Sampling.domainMixRebalance,
    "q65_pagerank" -> operators.Graph.pagerankSupplierPart,
    "q66_scd2" -> operators.Scd.userStateHistory,
    "q67_dsir" -> textstats.Dsir.importanceResample,
    "q68_corr_matrix" -> operators.Correlation.corrMatrix,
    "q69_ann_pq" -> ann.Pq.annPq,
    "q70_url_canon" -> operators.Urls.urlCanon,
    "q71_mad_outliers" -> operators.Robust.madOutliers,
    "q72_resample_locf" -> operators.Resample.hourlyLocf,
    "q73_snapshot_diff" -> operators.Diff.customerDiff,
    "q74_lm_fluency" -> textstats.Fluency.fluencyScore,
    "q75_fuzzy_join" -> operators.FuzzyJoin.fuzzyPartMatch,
    "q76_funnel" -> operators.Funnel.windowFunnel,
    "q77_triangles" -> operators.Triangles.partCopurchase,
    "q78_cube" -> operators.Relational.cubeStats,
    "q79_inverted_index" -> textstats.InvertedIndex.invertedIndex,
    "q80_attribution" -> operators.Attribution.lastTouch,
    "q81_bpe_tokens" -> textstats.Bpe.bpeSegment,
    "q82_bm25" -> textstats.Bm25.bm25,
    "q83_auc" -> operators.Eval.qualityAuc,
    "q84_apply_cdc" -> operators.Cdc.customerApply,
    "q85_para_dedup" -> ((s, d) => dedup.Paragraphs.dedupParagraphs(s, d)),
    "q86_profile_drift" -> operators.Monitor.customerDrift,
    "q87_k_anonymity" -> operators.Monitor.customerKAnonymity,
    "q88_key_skew" -> operators.Monitor.lineitemKeySkew,
    "q89_group_wls" -> operators.Regression.regressionByNation,
    "q90_mrr" -> textstats.Bm25.mrr,
    "q91_chi_square" -> operators.Independence.customerChiSquare,
    "q92_pseudonymize" -> operators.Privacy.tokenJoin,
    "q93_quantile_cdf" -> operators.QuantileTransform.quantityCdf,
    "q94_glm_inference" -> operators.Regression.glmInferenceQ,
    "q95_group_glm" -> operators.Regression.groupGlm,
    "q96_welch_ttest" -> operators.Hypothesis.orderTTest,
    "q97_mann_whitney" -> operators.Hypothesis.lineitemMwu,
    "q98_anova_f" -> operators.Hypothesis.orderAnova,
    "q99_ks_test" -> operators.Hypothesis.lineitemKs,
    "q100_bh_fdr" -> operators.Hypothesis.mwuBh,
    "q101_kendall" -> operators.Correlation.kendallMatrix,
    "q102_theil_sen" -> operators.Robust.lineitemTheilSen,
    "q103_js_divergence" -> operators.Hypothesis.lineitemJs,
    "q104_mutual_info" -> operators.Independence.customerMutualInfo,
    "q105_cusum" -> operators.Changepoint.eventsCusum,
    "q106_partial_corr" -> operators.Correlation.partialCorr,
    "q107_benford" -> operators.Monitor.ordersBenford,
    "q108_gini" -> operators.Monitor.customerGini,
    "q109_assoc_rules" -> operators.Basket.brandRules,
    "q110_survival" -> operators.Survival.segmentChurn,
    "q111_acf" -> operators.Autocorr.dailyRevenueAcf,
    "q112_hhi" -> operators.Monitor.supplierHhi,
    "q113_twap" -> operators.Twap.userTwap,
    "q114_rfm" -> operators.Rfm.customerRfm,
    "q115_backtest" -> operators.Backtest.dailyRevenueBacktest,
    "q116_ccf" -> operators.Ccf.dailyCountRevenueCcf,
    "q117_pareto" -> operators.Pareto.partAbc,
    "q118_cadence" -> operators.Cadence.customerCadence,
    "q119_did" -> operators.Did.segmentDid,
    "q120_wquantile" -> operators.WeightedQuantile.lineitemWeightedQuantiles,
    "q121_keyness" -> textstats.Keyness.sourceKeyTerms,
    "q122_geo_knn" -> operators.GeoKnn.customerNearestSupplier,
    "q123_lorenz" -> operators.Lorenz.segmentLorenz,
    "q124_ewma" -> operators.Ewma.userEwma,
    "q125_pmi" -> textstats.Pmi.docCollocations,
    "q126_winsorize" -> operators.Winsorize.lineitemWinsorized,
    "q127_seasonality" -> operators.Seasonality.eventTypeDow,
    "q128_path3" -> operators.Paths.topUserPaths,
    "q129_entropy" -> textstats.Entropy.sourceEntropy,
    "q130_funnel_time" -> operators.FunnelTime.eventStepTimes,
    "q131_zipf" -> textstats.Zipf.sourceZipf,
    "q132_prop_ztest" -> operators.PropTest.purchaseRateTest,
    "q133_burstiness" -> operators.Burstiness.eventTypeDispersion,
    "q134_amoc" -> operators.Amoc.eventTypeShift,
    "q135_runs_test" -> operators.RunsTest.eventTypeRuns,
    "q136_kappa" -> operators.Kappa.lineitemKappa,
    "q137_heaps" -> textstats.Heaps.sourceHeaps,
    "q138_pairwise_means" -> operators.PairwiseMeans.nationBalancePairs,
    "q139_seasonal_strength" -> operators.SeasonalStrength.eventTypeStrength,
    "q140_js_matrix" -> textstats.JsMatrix.sourceJsMatrix,
    "q141_psi" -> operators.Psi.orderPricePsi,
    "q142_pipeline" -> operators.Pipeline.trainingPipeline,
    "q143_mann_kendall" -> operators.MannKendall.orderRevenueTrend,
    "q144_bootstrap_ci" -> operators.Bootstrap.segmentBalanceCi,
    "q145_ann_ivfpq" -> ann.IvfPq.annIvfPq,
    "q146_crs_utm_webmerc" -> operators.Crs.utmWebmerc,
    "q147_label_prop" -> operators.Graph.lpSupplierPart,
    "q148_jl_project" -> ann.Jl.jlProject,
    "q149_conformal" -> ((s: SparkSession, d: String) =>
      operators.Conformal.orderPriceConformal(s, d)),
    "q150_perm_test" -> ((s: SparkSession, d: String) =>
      operators.Permutation.orderPricePermTest(s, d)),
    "q151_ann_jl" -> ann.Jl.annJl,
    "q152_cuped" -> operators.Cuped.eventValueCuped,
    "q153_obf_monitor" -> ((s: SparkSession, d: String) =>
      operators.Sequential.orderFinishMonitor(s, d)),
    "q154_good_turing" -> textstats.GoodTuring.sourceGoodTuring,
    "q155_ann_filtered" -> ((s: SparkSession, d: String) =>
      ann.Ann.annIvfFiltered(s, d)),
    "q156_calibration" -> operators.Calibration.orderFinishCalibration,
    "q157_adamic_adar" -> operators.Graph.aaSupplierLinks,
    "q158_glm_ci" -> operators.Regression.glmConfIntQ,
    "q159_logrank" -> operators.Logrank.segmentLogrank,
    "q160_weighted_sample" -> operators.WeightedSample.sourceWeightedSample,
    "q161_logrank_by" -> operators.Logrank.regionSegmentLogrank,
    "q162_pipeline_es" -> ((s, d) => operators.Pipeline.trainingPipelineEs(s, d)),
    "q163_competing_risks" -> operators.CompetingRisks.churnIncidence,
    "q164_quantile_reg" -> operators.QuantileRegression.lineRevenue,
    "q165_rmst" -> operators.Rmst.segmentRmst,
    "q166_quantile_by" -> operators.QuantileRegression.brandLineRevenue,
    "q167_brier" -> operators.Brier.orderFinishBrier,
    "q168_trend_test" -> operators.TrendTest.priorityFinishTrend,
    "q169_mcnemar" -> operators.McNemar.customerUrgencyShift,
    "q170_wilcoxon_signed" -> operators.SignedRank.customerSpendShift,
    "q171_avg_precision" -> operators.AvgPrecision.qualityAp,
    "q172_rrf_fusion" -> textstats.RankFusion.qualityFluencyConsensus,
    "q173_ljung_box" -> operators.LjungBox.dailyRevenueLjungBox,
    "q174_pettitt" -> operators.Pettitt.dailyRevenuePettitt,
    "q175_jonckheere" -> operators.Jonckheere.priorityValueTrend,
    "q176_kruskal_wallis" -> operators.KruskalWallis.priorityValueKw,
    "q177_friedman" -> operators.Friedman.priorityYearFriedman,
    "q178_nelson_aalen" -> operators.Survival.segmentHazard,
    "q179_cochran_q" -> operators.CochranQ.priorityUsageQ,
    "q180_jarque_bera" -> operators.JarqueBera.segmentPriceJb,
  )
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_analysis_join" ->
      """SELECT n.n_nationkey, n.n_name,
        |  string_agg(DISTINCT c.c_mktsegment, ', ' ORDER BY c.c_mktsegment) AS segments,
        |  round(avg(c.c_acctbal), 4) AS avg_acctbal,
        |  round(sum(co.total_spent), 4) AS total_spent,
        |  CAST(sum(co.n_orders) AS BIGINT) AS n_orders
        |FROM nation n
        |LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
        |INNER JOIN (
        |  SELECT o_custkey, sum(o_totalprice) AS total_spent, count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |) co ON c.c_custkey = co.o_custkey
        |GROUP BY n.n_nationkey, n.n_name""".stripMargin,
    "q3_pivot_wide" ->
      """SELECT o_custkey,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS total_p
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q4_unpivot_long" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,
    "q5_split_explode" ->
      """SELECT doc_id,
        |  generate_subscripts(string_split(text, ' '), 1) AS pos,
        |  unnest(string_split(text, ' ')) AS word
        |FROM documents""".stripMargin,
    "q6_text_clean" ->
      """WITH dirty AS (
        |  SELECT p_partkey,
        |    'n. ' || lower(p_name) AS dirty_name,
        |    format('{:,}', CAST(floor(p_retailprice) AS BIGINT)) AS dirty_price
        |  FROM part
        |)
        |SELECT p_partkey,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    array_to_string(list_transform(string_split(lower(dirty_name), ' '),
        |      w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' '),
        |    'N\.', 'North', 'g'), 'S\.', 'South', 'g'),
        |    'E\.', 'East', 'g'), 'W\.', 'West', 'g') AS clean_name,
        |  CAST(replace(dirty_price, ',', '') AS BIGINT) AS clean_price
        |FROM dirty""".stripMargin,
    "q7_group_index" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS idx,
        |  rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
        |FROM customer""".stripMargin,
    "q8_zscore" ->
      """SELECT c_custkey, c_acctbal,
        |  round((c_acctbal - round(avg(c_acctbal) OVER (), 6))
        |        / round(stddev_samp(c_acctbal) OVER (), 6), 4) + 0.0 AS acctbal_std
        |FROM customer""".stripMargin,
    "q9_ratio_analytics" ->
      """SELECT o_custkey,
        |  count(*) AS n_total,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  round(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) * 100.0 / count(*), 1) AS prop_f,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END) * 100.0
        |        / sum(o_totalprice), 1) AS prop_spend_f
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q10_coalesce_fill" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), n_name) AS segment_filled
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q11_dup_check" ->
      """SELECT o_custkey, count(*) AS n_rows
        |FROM orders GROUP BY o_custkey HAVING count(*) > 1""".stripMargin,
    "q12_validity_filter" ->
      """SELECT event_id, user_id, event_type, round(value, 4) AS value
        |FROM events
        |WHERE value IS NOT NULL AND value >= 0.0 AND value <= 400.0
        |  AND event_type IN ('click', 'view', 'purchase', 'signup', 'error')""".stripMargin,
    "q13_topk_group" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer
        |) WHERE rk <= 3""".stripMargin,
    "q14_star_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q15_anti_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin,
    "q16_percentiles" ->
      """SELECT c_mktsegment,
        |  round(min(c_acctbal), 4) AS bal_min,
        |  round(quantile_cont(c_acctbal, 0.25), 4) AS bal_q1,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS bal_median,
        |  round(quantile_cont(c_acctbal, 0.75), 4) AS bal_q3,
        |  round(max(c_acctbal), 4) AS bal_max,
        |  round(avg(c_acctbal), 4) AS bal_mean
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q17_event_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) + 0.0 AS sum_value,
        |  round(avg(TRY_CAST(json_extract_string(props, '$.k') AS INT)), 4) + 0.0 AS avg_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q18_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END AS is_new
        |  FROM lagged
        |), numbered AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 4) + 0.0 AS sum_value
        |FROM numbered GROUP BY 1, 2""".stripMargin,
    "q19_dedup_exact" -> dedup.Dedup.dedupExactSql,
    "q20_dedup_minhash" -> dedup.Dedup.dedupMinhashSql,
    "q21_dedup_simhash" -> dedup.Dedup.dedupSimhashSql,
    "q22_ngram_jaccard" -> dedup.Dedup.ngramJaccardSql,
    "q23_embed_neardup" -> ann.Ann.embedNearDupSql,
    "q24_ann_brute" -> ann.Ann.annBruteSql,
    "q25_ann_lsh" -> ann.Ann.annLshSql,
    "q25b_ann_ivf" -> ann.Ann.annIvfSql,
    "q26_langid" -> textstats.TextStats.langidSql,
    "q27_quality" -> textstats.TextStats.qualitySql,
    "q28_tokens" -> textstats.TextStats.tokenCountsSql,
    "q29_fingerprint" -> textstats.TextStats.fingerprintSql,
    "q30_multimodal_meta" -> multimodal.Multimodal.multimodalMetaSql,
    "q31_profile" -> operators.Relational.profileSql,
    "q32_regression" -> operators.Regression.regressionSql,
    "q33_spatial_join" -> operators.Geo.spatialJoinSql,
    "q34_separate" -> operators.Relational.separateColsSql,
    "q35_asof_join" -> operators.AsOf.asofEventStateSql,
    "q36_range_join" -> operators.RangeJoin.rangeEventWindowsSql,
    "q37_tfidf" -> textstats.TextStats.tfidfSql,
    "q38_stratified_sample" -> operators.Sampling.stratifiedSampleSql,
    "q39_dedup_cluster" -> dedup.Components.dedupClusterSql,
    "q40_gopher_repetition" -> textstats.TextStats.gopherRepetitionSql,
    "q41_pii_redact" -> textstats.Redact.piiRedactSql,
    "q42_contamination" -> dedup.Contamination.contaminationSql,
    "q43_rollup" -> operators.Relational.rollupStatsSql,
    "q44_rolling" -> operators.Events.rollingStatsSql,
    "q45_kmeans" -> ann.Kmeans.kmeansClustersSql,
    "q46_incr_dedup" -> dedup.Incremental.incrementalDedupSql,
    "q47_ntile_bin" -> operators.Binning.ntileBinSql,
    "q48_histogram" -> operators.Binning.histogramSql,
    "q49_heavy_hitters" -> textstats.TextStats.heavyHittersSql,
    "q50_transitions" -> operators.Events.transitionsSql,
    "q51_cohort" -> operators.Events.cohortRetentionSql,
    "q52_curation" -> textstats.Curation.curateSql,
    "q53_expectations" -> operators.Expectations.orderExpectationsSql,
    "q54_crs_reproject" -> operators.Crs.reprojectSql,
    "q55_point_in_polygon" -> operators.Geo.pointInPolygonSql,
    "q56_semdedup" -> ann.Kmeans.semDedupSql,
    "q57_chunking" -> operators.Chunking.chunkSql,
    "q58_packing" -> operators.Chunking.packSql,
    "q59_bloom_dedup" -> dedup.Bloom.bloomDedupSql,
    "q60_domain_mix" -> operators.Sampling.domainMixSql,
    "q61_quality_score" -> textstats.QualityModel.qualityScoreSql,
    "q62_dup_spans" -> dedup.Spans.dupSpansSql,
    "q63_span_removal" -> dedup.Spans.removeDupSpansSql,
    "q64_domain_rebalance" -> operators.Sampling.domainMixRebalanceSql,
    "q65_pagerank" -> operators.Graph.pagerankSupplierPartSql,
    "q66_scd2" -> operators.Scd.userStateHistorySql,
    "q67_dsir" -> textstats.Dsir.importanceResampleSql,
    "q68_corr_matrix" -> operators.Correlation.corrMatrixSql,
    "q69_ann_pq" -> ann.Pq.annPqSql,
    "q70_url_canon" -> operators.Urls.urlCanonSql,
    "q71_mad_outliers" -> operators.Robust.madOutliersSql,
    "q72_resample_locf" -> operators.Resample.hourlyLocfSql,
    "q73_snapshot_diff" -> operators.Diff.customerDiffSql,
    "q74_lm_fluency" -> textstats.Fluency.fluencyScoreSql,
    "q75_fuzzy_join" -> operators.FuzzyJoin.fuzzyPartMatchSql,
    "q76_funnel" -> operators.Funnel.windowFunnelSql,
    "q77_triangles" -> operators.Triangles.partCopurchaseSql,
    "q78_cube" -> operators.Relational.cubeStatsSql,
    "q79_inverted_index" -> textstats.InvertedIndex.invertedIndexSql,
    "q80_attribution" -> operators.Attribution.lastTouchSql,
    "q81_bpe_tokens" -> textstats.Bpe.bpeSegmentSql,
    "q82_bm25" -> textstats.Bm25.bm25Sql,
    "q83_auc" -> operators.Eval.qualityAucSql,
    "q84_apply_cdc" -> operators.Cdc.customerApplySql,
    "q85_para_dedup" -> dedup.Paragraphs.dedupParagraphsSql,
    "q86_profile_drift" -> operators.Monitor.customerDriftSql,
    "q87_k_anonymity" -> operators.Monitor.customerKAnonymitySql,
    "q88_key_skew" -> operators.Monitor.lineitemKeySkewSql,
    "q89_group_wls" -> operators.Regression.regressionByNationSql,
    "q90_mrr" -> textstats.Bm25.mrrSql,
    "q91_chi_square" -> operators.Independence.customerChiSquareSql,
    "q92_pseudonymize" -> operators.Privacy.tokenJoinSql,
    "q93_quantile_cdf" -> operators.QuantileTransform.quantityCdfSql,
    "q94_glm_inference" -> operators.Regression.glmInferenceSql,
    "q95_group_glm" -> operators.Regression.groupGlmSql,
    "q96_welch_ttest" -> operators.Hypothesis.orderTTestSql,
    "q97_mann_whitney" -> operators.Hypothesis.lineitemMwuSql,
    "q98_anova_f" -> operators.Hypothesis.orderAnovaSql,
    "q99_ks_test" -> operators.Hypothesis.lineitemKsSql,
    "q100_bh_fdr" -> operators.Hypothesis.mwuBhSql,
    "q101_kendall" -> operators.Correlation.kendallMatrixSql,
    "q102_theil_sen" -> operators.Robust.lineitemTheilSenSql,
    "q103_js_divergence" -> operators.Hypothesis.lineitemJsSql,
    "q104_mutual_info" -> operators.Independence.customerMutualInfoSql,
    "q105_cusum" -> operators.Changepoint.eventsCusumSql,
    "q106_partial_corr" -> operators.Correlation.partialCorrSql,
    "q107_benford" -> operators.Monitor.ordersBenfordSql,
    "q108_gini" -> operators.Monitor.customerGiniSql,
    "q109_assoc_rules" -> operators.Basket.brandRulesSql,
    "q110_survival" -> operators.Survival.segmentChurnSql,
    "q111_acf" -> operators.Autocorr.dailyRevenueAcfSql,
    "q112_hhi" -> operators.Monitor.supplierHhiSql,
    "q113_twap" -> operators.Twap.userTwapSql,
    "q114_rfm" -> operators.Rfm.customerRfmSql,
    "q115_backtest" -> operators.Backtest.dailyRevenueBacktestSql,
    "q116_ccf" -> operators.Ccf.dailyCountRevenueCcfSql,
    "q117_pareto" -> operators.Pareto.partAbcSql,
    "q118_cadence" -> operators.Cadence.customerCadenceSql,
    "q119_did" -> operators.Did.segmentDidSql,
    "q120_wquantile" -> operators.WeightedQuantile.lineitemWeightedQuantilesSql,
    "q121_keyness" -> textstats.Keyness.sourceKeyTermsSql,
    "q122_geo_knn" -> operators.GeoKnn.customerNearestSupplierSql,
    "q123_lorenz" -> operators.Lorenz.segmentLorenzSql,
    "q124_ewma" -> operators.Ewma.userEwmaSql,
    "q125_pmi" -> textstats.Pmi.docCollocationsSql,
    "q126_winsorize" -> operators.Winsorize.lineitemWinsorizedSql,
    "q127_seasonality" -> operators.Seasonality.eventTypeDowSql,
    "q128_path3" -> operators.Paths.topUserPathsSql,
    "q129_entropy" -> textstats.Entropy.sourceEntropySql,
    "q130_funnel_time" -> operators.FunnelTime.eventStepTimesSql,
    "q131_zipf" -> textstats.Zipf.sourceZipfSql,
    "q132_prop_ztest" -> operators.PropTest.purchaseRateTestSql,
    "q133_burstiness" -> operators.Burstiness.eventTypeDispersionSql,
    "q134_amoc" -> operators.Amoc.eventTypeShiftSql,
    "q135_runs_test" -> operators.RunsTest.eventTypeRunsSql,
    "q136_kappa" -> operators.Kappa.lineitemKappaSql,
    "q137_heaps" -> textstats.Heaps.sourceHeapsSql,
    "q138_pairwise_means" -> operators.PairwiseMeans.nationBalancePairsSql,
    "q139_seasonal_strength" -> operators.SeasonalStrength.eventTypeStrengthSql,
    "q140_js_matrix" -> textstats.JsMatrix.sourceJsMatrixSql,
    "q141_psi" -> operators.Psi.orderPricePsiSql,
    "q142_pipeline" -> operators.Pipeline.trainingPipelineSql,
    "q143_mann_kendall" -> operators.MannKendall.orderRevenueTrendSql,
    "q144_bootstrap_ci" -> operators.Bootstrap.segmentBalanceCiSql,
    "q145_ann_ivfpq" -> ann.IvfPq.annIvfPqSql,
    "q146_crs_utm_webmerc" -> operators.Crs.utmWebmercSql,
    "q147_label_prop" -> operators.Graph.lpSupplierPartSql,
    "q148_jl_project" -> ann.Jl.jlProjectSql,
    "q149_conformal" -> operators.Conformal.orderPriceConformalSql,
    "q150_perm_test" -> operators.Permutation.orderPricePermTestSql,
    "q151_ann_jl" -> ann.Jl.annJlSql,
    "q152_cuped" -> operators.Cuped.eventValueCupedSql,
    "q153_obf_monitor" -> operators.Sequential.orderFinishMonitorSql,
    "q154_good_turing" -> textstats.GoodTuring.sourceGoodTuringSql,
    "q155_ann_filtered" -> ann.Ann.annIvfFilteredSql,
    "q156_calibration" -> operators.Calibration.orderFinishCalibrationSql,
    "q157_adamic_adar" -> operators.Graph.aaSupplierLinksSql,
    "q158_glm_ci" -> operators.Regression.glmConfIntSql,
    "q159_logrank" -> operators.Logrank.segmentLogrankSql,
    "q160_weighted_sample" -> operators.WeightedSample.sourceWeightedSampleSql,
    "q161_logrank_by" -> operators.Logrank.regionSegmentLogrankSql,
    "q162_pipeline_es" -> operators.Pipeline.trainingPipelineEsSql,
    "q163_competing_risks" -> operators.CompetingRisks.churnIncidenceSql,
    "q164_quantile_reg" -> operators.QuantileRegression.lineRevenueSql,
    "q165_rmst" -> operators.Rmst.segmentRmstSql,
    "q166_quantile_by" -> operators.QuantileRegression.brandLineRevenueSql,
    "q167_brier" -> operators.Brier.orderFinishBrierSql,
    "q168_trend_test" -> operators.TrendTest.priorityFinishTrendSql,
    "q169_mcnemar" -> operators.McNemar.customerUrgencyShiftSql,
    "q170_wilcoxon_signed" -> operators.SignedRank.customerSpendShiftSql,
    "q171_avg_precision" -> operators.AvgPrecision.qualityApSql,
    "q172_rrf_fusion" -> textstats.RankFusion.qualityFluencyConsensusSql,
    "q173_ljung_box" -> operators.LjungBox.dailyRevenueLjungBoxSql,
    "q174_pettitt" -> operators.Pettitt.dailyRevenuePettittSql,
    "q175_jonckheere" -> operators.Jonckheere.priorityValueTrendSql,
    "q176_kruskal_wallis" -> operators.KruskalWallis.priorityValueKwSql,
    "q177_friedman" -> operators.Friedman.priorityYearFriedmanSql,
    "q178_nelson_aalen" -> operators.Survival.segmentHazardSql,
    "q179_cochran_q" -> operators.CochranQ.priorityUsageQSql,
    "q180_jarque_bera" -> operators.JarqueBera.segmentPriceJbSql,
  )
}
