package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 is exposed as a named query over
  * the driver testdata, with an equivalent DuckDB oracle in [[oracleSql]]
  * (omitted only for non-SQL-expressible ops, which get rows-only checks).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Sales.sicarRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sicar_rollup" -> ((s, d) => Sales.sicarRollup(s, d)),
    "q02_legacy_agg" -> ((s, d) => Sales.legacyAgg(s, d)),
    "q03_waterfall_clean" -> ((s, d) => Sales.waterfallClean(s, d)),
    "q04_payment_qa" -> ((s, d) => Sales.paymentQa(s, d)),
    "q05_upsert_lastwins" -> ((s, d) => Incremental.upsertLastWins(s, d)),
    "q06_checkpoint_max" -> ((s, d) => Incremental.checkpointMax(s, d)),
    "q07_watermark_incr" -> ((s, d) => Incremental.watermarkIncrement(s, d)),
    "q08_union_ledger" -> ((s, d) => Ledger.unionLedgerQuery(s, d)),
    "q09_refilter_ledger" -> ((s, d) => Ledger.refilterLedger(s, d)),
    "q10_earliest_per_day" -> ((s, d) => Ledger.earliestPerDay(s, d)),
    "q11_daily_net" -> ((s, d) => Stock.dailyNet(s, d)),
    "q12_running_balance" -> ((s, d) => Stock.runningBalance(s, d)),
    "q13_stock_points" -> ((s, d) => Stock.stockPoints(s, d)),
    "q14_asof_lookup" -> ((s, d) => Stock.asOfLookup(s, d)),
    "q15_reconcile" -> ((s, d) => Stock.reconcile(s, d)),
    "q16_token_stats" -> ((s, d) => TextOps.tokenStats(s, d)),
    "q17_lang_profile" -> ((s, d) => TextOps.langProfile(s, d)),
    "q18_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    "q19_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "q20_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "q21_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q22_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q23_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q24_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "q25_cosine_topk" -> ((s, d) => Similarity.cosineTopK(s, d)),
    "q26_ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "q27_embed_neardup" -> ((s, d) => Similarity.embedNearDup(s, d)),
    "q28_media_features" -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "q29_dq_exclusions" -> ((s, d) => Dq.dqExclusions(s, d)),
    "q30_dq_filtered_ledger" -> ((s, d) => Dq.dqFilteredLedger(s, d)),
    "q31_ivf_ann" -> ((s, d) => Similarity.ivfAnn(s, d)),
    "q32_top_terms" -> ((s, d) => TextOps.topTerms(s, d)),
    "q33_contamination" -> ((s, d) => Contamination.contamination(s, d)),
    "q34_split_assign" -> ((s, d) => Contamination.splitAssign(s, d)),
    "q35_repetition" -> ((s, d) => TextOps.repetition(s, d)),
    "q36_sessionize" -> ((s, d) => Sessions.sessionize(s, d)),
    "q37_json_props" -> ((s, d) => Sessions.jsonProps(s, d)),
    "q38_asof_join" -> ((s, d) => AsOf.asOfJoin(s, d)),
    "q39_stratified_sample" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "q40_kmv_distinct" -> ((s, d) => Sketch.kmvDistinct(s, d)),
    "q41_token_quantiles" -> ((s, d) => Analytics.tokenQuantiles(s, d)),
    "q42_lang_source_rollup" -> ((s, d) => Analytics.langSourceRollup(s, d)),
    "q43_event_type_pivot" -> ((s, d) => Analytics.eventTypePivot(s, d)),
    "q44_rolling_daily_net" -> ((s, d) => Analytics.rollingDailyNet(s, d)),
    "q45_dedup_clusters" -> ((s, d) => Graph.dedupClusters(s, d)),
    "q46_pii_scrub" -> ((s, d) => TextOps.piiScrub(s, d)),
    "q47_doc_ranks" -> ((s, d) => Analytics.docRanks(s, d)),
    "q48_tumbling_counts" -> ((s, d) => Sessions.tumblingCounts(s, d)),
    "q49_lang_source_cube" -> ((s, d) => Analytics.langSourceCube(s, d)),
    "q50_interp_daily_net" -> ((s, d) => Analytics.interpolateDailyNet(s, d)),
    "q51_fuzzy_titles" -> ((s, d) => Dedup.fuzzyTitles(s, d)),
    "q52_setop_cohorts" -> ((s, d) => Sessions.setOpCohorts(s, d)),
    "q53_sql_exists" -> ((s, d) => Sessions.sqlExistsErrors(s, d)),
    "q54_stock_intervals" -> ((s, d) => Stock.stockIntervals(s, d)),
    "q55_quantiles_cont" -> ((s, d) => Analytics.tokenQuantilesCont(s, d)),
    "q56_char_histogram" -> ((s, d) => Analytics.charHistogram(s, d)),
    "q57_interval_join" -> ((s, d) => Sessions.intervalJoin(s, d))
  )

  /** DuckDB-runnable ANSI SQL oracle per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q01_sicar_rollup" -> Sales.sicarRollupSql,
    "q02_legacy_agg" -> Sales.legacyAggSql,
    "q03_waterfall_clean" -> Sales.waterfallCleanSql,
    "q04_payment_qa" -> Sales.paymentQaSql,
    "q05_upsert_lastwins" -> Incremental.upsertLastWinsSql,
    "q06_checkpoint_max" -> Incremental.checkpointMaxSql,
    "q07_watermark_incr" -> Incremental.watermarkIncrementSql,
    "q08_union_ledger" -> Ledger.unionLedgerSql,
    "q09_refilter_ledger" -> Ledger.refilterLedgerSql,
    "q10_earliest_per_day" -> Ledger.earliestPerDaySql,
    "q11_daily_net" -> Stock.dailyNetSql,
    "q12_running_balance" -> Stock.runningBalanceSql,
    "q13_stock_points" -> Stock.stockPointsSql,
    "q14_asof_lookup" -> Stock.asOfLookupSql,
    "q15_reconcile" -> Stock.reconcileSql,
    "q16_token_stats" -> TextOps.tokenStatsSql,
    "q17_lang_profile" -> TextOps.langProfileSql,
    "q18_quality_score" -> TextOps.qualityScoreSql,
    "q19_fingerprint" -> TextOps.fingerprintSql,
    "q20_exact_dedup" -> Dedup.exactDedupSql,
    "q21_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q22_minhash_lsh" -> Dedup.minhashLshSql,
    "q23_simhash" -> Dedup.simhashSql,
    "q24_simhash_pairs" -> Dedup.simhashPairsSql,
    "q25_cosine_topk" -> Similarity.cosineTopKSql,
    "q26_ann_lsh" -> Similarity.annLshSql,
    "q27_embed_neardup" -> Similarity.embedNearDupSql,
    "q28_media_features" -> Multimodal.mediaFeaturesSql,
    "q29_dq_exclusions" -> Dq.dqExclusionsSql,
    "q30_dq_filtered_ledger" -> Dq.dqFilteredLedgerSql,
    "q31_ivf_ann" -> Similarity.ivfAnnSql,
    "q32_top_terms" -> TextOps.topTermsSql,
    "q33_contamination" -> Contamination.contaminationSql,
    "q34_split_assign" -> Contamination.splitAssignSql,
    "q35_repetition" -> TextOps.repetitionSql,
    "q36_sessionize" -> Sessions.sessionizeSql,
    "q37_json_props" -> Sessions.jsonPropsSql,
    "q38_asof_join" -> AsOf.asOfJoinSql,
    "q39_stratified_sample" -> TextOps.stratifiedSampleSql,
    "q40_kmv_distinct" -> Sketch.kmvDistinctSql,
    "q41_token_quantiles" -> Analytics.tokenQuantilesSql,
    "q42_lang_source_rollup" -> Analytics.langSourceRollupSql,
    "q43_event_type_pivot" -> Analytics.eventTypePivotSql,
    "q44_rolling_daily_net" -> Analytics.rollingDailyNetSql,
    "q45_dedup_clusters" -> Graph.dedupClustersSql,
    "q46_pii_scrub" -> TextOps.piiScrubSql,
    "q47_doc_ranks" -> Analytics.docRanksSql,
    "q48_tumbling_counts" -> Sessions.tumblingCountsSql,
    "q49_lang_source_cube" -> Analytics.langSourceCubeSql,
    "q50_interp_daily_net" -> Analytics.interpolateDailyNetSql,
    "q51_fuzzy_titles" -> Dedup.fuzzyTitlesSql,
    "q52_setop_cohorts" -> Sessions.setOpCohortsSql,
    "q53_sql_exists" -> Sessions.sqlExistsErrorsSql,
    "q54_stock_intervals" -> Stock.stockIntervalsSql,
    "q55_quantiles_cont" -> Analytics.tokenQuantilesContSql,
    "q56_char_histogram" -> Analytics.charHistogramSql,
    "q57_interval_join" -> Sessions.intervalJoinSql
  )
}
