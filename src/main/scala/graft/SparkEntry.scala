package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented gets a
  * `queries` entry; every SQL-expressible one also gets a DuckDB
  * oracle twin in `oracleSql` (column names aligned on both sides —
  * the driver sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.cleanFilter(spark, "/root/testdata/sf0.001")

  /** name -> (builder, oracle SQL or None). Single source of truth. */
  private[graft] val registry: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Vector(
      ("q01_clean_filter", Relational.cleanFilter _, Some(Relational.cleanFilterSql)),
      ("q02_pricing_summary", Relational.pricingSummary _, Some(Relational.pricingSummarySql)),
      ("q03_revenue_join", Relational.revenueJoin _, Some(Relational.revenueJoinSql)),
      ("q04_contains_semijoin", Relational.containsSemiJoin _, Some(Relational.containsSemiJoinSql)),
      ("q05_anti_join", Relational.antiJoin _, Some(Relational.antiJoinSql)),
      ("q06_dedup_first_seen", Relational.dedupFirstSeen _, Some(Relational.dedupFirstSeenSql)),
      ("q07_window_topk", Relational.windowTopK _, Some(Relational.windowTopKSql)),
      ("q08_union_distinct", Relational.unionDistinct _, Some(Relational.unionDistinctSql)),
      ("q09_keyword_tf", TextOps.keywordTf _, Some(TextOps.keywordTfSql)),
      ("q10_category_rollup", TextOps.categoryRollup _, Some(TextOps.categoryRollupSql)),
      ("q11_wordcount_dict", TextOps.wordcountDictionary _, Some(TextOps.wordcountDictionarySql)),
      ("q12_doc_rank", TextOps.docRank _, Some(TextOps.docRankSql)),
      ("q13_subject_extract", TextOps.subjectExtract _, Some(TextOps.subjectExtractSql)),
      ("q14_natural_sort", TextOps.naturalSort _, Some(TextOps.naturalSortSql)),
      ("q15_column_stats", StatsOps.columnStats _, Some(StatsOps.columnStatsSql)),
      ("q16_size_accounting", Relational.sizeAccounting _, Some(Relational.sizeAccountingSql)),
      ("q17_outcome_counters", Relational.outcomeCounters _, Some(Relational.outcomeCountersSql)),
      ("q18_date_dimension", Relational.dateDimension _, Some(Relational.dateDimensionSql)),
      ("q19_asof_join", Relational.asofJoin _, Some(Relational.asofJoinSql)),
      ("q20_dedup_exact", DedupOps.dedupExact _, Some(DedupOps.dedupExactSql)),
      ("q21_minhash_lsh", DedupOps.minhashLsh _, Some(DedupOps.minhashLshSql)),
      ("q22_simhash", DedupOps.simhash _, Some(DedupOps.simhashSql)),
      ("q23_ngram_jaccard", DedupOps.ngramJaccard _, Some(DedupOps.ngramJaccardSql)),
      ("q71_line_dedup", DedupOps.lineDedup _, Some(DedupOps.lineDedupSql)),
      ("q77_incremental_labels", DedupOps.incrementalLabels _,
        Some(DedupOps.incrementalLabelsSql)),
      ("q75_neardup_survivors", DedupOps.neardupSurvivors _,
        Some(DedupOps.neardupSurvivorsSql)),
      ("q48_dedup_clusters", DedupOps.dedupClusters _, Some(DedupOps.dedupClustersSql)),
      ("q24_cosine_topk", SimilarityOps.cosineTopK _, Some(SimilarityOps.cosineTopKSql)),
      ("q25_ann_ivf", SimilarityOps.annIvf _, Some(SimilarityOps.annIvfSql)),
      ("q41_top_orders", Relational.topOrders _, Some(Relational.topOrdersSql)),
      ("q46_interval_join", Relational.intervalJoin _, Some(Relational.intervalJoinSql)),
      ("q42_above_cust_avg", Relational.aboveCustomerAvg _, Some(Relational.aboveCustomerAvgSql)),
      ("q26_lang_id", TextOps.langId _, Some(TextOps.langIdSql)),
      ("q27_quality_score", TextOps.qualityScore _, Some(TextOps.qualityScoreSql)),
      ("q28_token_count", TextOps.tokenCount _, Some(TextOps.tokenCountSql)),
      ("q29_fingerprint", TextOps.fingerprint _, Some(TextOps.fingerprintSql)),
      ("q72_pii_scrub", TextOps.piiScrub _, Some(TextOps.piiScrubSql)),
      ("q30_event_windows", StatsOps.eventWindows _, Some(StatsOps.eventWindowsSql)),
      ("q31_json_props", StatsOps.jsonProps _, Some(StatsOps.jsonPropsSql)),
      ("q32_binary_meta", MultimodalOps.binaryMeta _, Some(MultimodalOps.binaryMetaSql)),
      ("q33_media_features", MultimodalOps.mediaFeatures _,
        Some(MultimodalOps.mediaFeaturesSql)),
      ("q34_stream_windows", StreamOps.streamEventWindows _, Some(StreamOps.streamEventWindowsSql)),
      ("q35_embed_neardup", SimilarityOps.embedNearDup _, Some(SimilarityOps.embedNearDupSql)),
      ("q78_semantic_dedup", SimilarityOps.semanticDedup _,
        Some(SimilarityOps.semanticDedupSql)),
      ("q38_sessionize", StatsOps.sessionize _, Some(StatsOps.sessionizeSql)),
      ("q39_cube", StatsOps.cubeCounts _, Some(StatsOps.cubeCountsSql)),
      ("q40_percentiles", StatsOps.percentiles _, Some(StatsOps.percentilesSql)),
      ("q47_sliding_windows", StatsOps.slidingWindows _, Some(StatsOps.slidingWindowsSql)),
      ("q43_pivot_export", TextOps.pivotExport _, Some(TextOps.pivotExportSql)),
      ("q44_string_funcs", TextOps.stringFuncs _, Some(TextOps.stringFuncsSql)),
      ("q45_array_funcs", TextOps.arrayFuncs _, Some(TextOps.arrayFuncsSql)),
      ("q37_approx_distinct",
        ((s, d) => LayoutOps.approxDistinct(s, d)): (SparkSession, String) => DataFrame,
        None),
      ("q49_salted_agg", SkewOps.saltedAgg _, Some(SkewOps.saltedAggSql)),
      ("q50_salted_join", SkewOps.saltedJoin _, Some(SkewOps.saltedJoinSql)),
      ("q51_ann_quantized",
        ((s, d) => SimilarityOps.annQuantized(s, d)): (SparkSession, String) => DataFrame,
        Some(SimilarityOps.annQuantizedSql)),
      ("q52_simhash_pairs", DedupOps.simhashPairs _,
        Some(DedupOps.simhashPairsSql)),
      ("q54_simhash64_pairs", DedupOps.simhash64Pairs _,
        Some(DedupOps.simhash64PairsSql)),
      ("q55_ann_multiprobe",
        ((s, d) => SimilarityOps.annMultiProbe(s, d)): (SparkSession, String) => DataFrame,
        Some(SimilarityOps.annMultiProbeSql)),
      ("q66_ann_recall", SimilarityOps.annRecall _,
        Some(SimilarityOps.annRecallSql)),
      ("q57_boilerplate", TextOps.boilerplate _, Some(TextOps.boilerplateSql)),
      ("q58_repetition", TextOps.repetition _, Some(TextOps.repetitionSql)),
      ("q61_contamination", TextOps.contamination _,
        Some(TextOps.contaminationSql)),
      ("q62_det_split", TextOps.detSplit _, Some(TextOps.detSplitSql)),
      ("q63_salient_terms", TextOps.salientTerms _,
        Some(TextOps.salientTermsSql)),
      ("q65_token_budget", TextOps.tokenBudget _,
        Some(TextOps.tokenBudgetSql)),
      ("q67_chunk_windows", TextOps.chunkWindows _,
        Some(TextOps.chunkWindowsSql)),
      ("q68_sequence_pack", TextOps.sequencePack _,
        Some(TextOps.sequencePackSql)),
      ("q70_mixture_weights", TextOps.mixtureWeights _,
        Some(TextOps.mixtureWeightsSql)),
      ("q79_mixture_sample", TextOps.mixtureSample _,
        Some(TextOps.mixtureSampleSql)),
      ("q56_ann_lloyd",
        ((s, d) => SimilarityOps.annLloyd(s, d)): (SparkSession, String) => DataFrame,
        Some(SimilarityOps.annLloydSql)), // exact decimal centroid means
      ("q59_stream_interval_join", StreamOps.streamIntervalJoinCounts _,
        Some(StreamOps.streamIntervalJoinCountsSql)),
      ("q60_stream_file_windows", StreamOps.streamEventWindowFiles _,
        Some(StreamOps.streamEventWindowFilesSql)),
      ("q64_stateful_counts", StreamOps.statefulUserEventCounts _,
        Some(StreamOps.statefulUserEventCountsSql)),
      ("q69_stream_ingest_neardup", StreamOps.streamIngestNeardup _,
        Some(StreamOps.streamIngestNeardupSql)),
      ("q80_stream_dedup", StreamOps.streamDedupKeys _,
        Some(StreamOps.streamDedupKeysSql)),
      ("q36_pruned_counts", LayoutOps.prunedMonthlyOrderCounts _,
        Some(LayoutOps.prunedMonthlyOrderCountsSql)),
      ("q73_shard_manifest", LayoutOps.shardManifest _,
        Some(LayoutOps.shardManifestSql)),
      ("q76_training_bins", LayoutOps.trainingBins _,
        Some(LayoutOps.trainingBinsSql)),
      ("q74_training_pipeline", PipelineOps.trainingPipeline _,
        Some(PipelineOps.trainingPipelineSql)),
      ("q53_bucketed_join", LayoutOps.bucketedOrderPriority _,
        Some(LayoutOps.bucketedOrderPrioritySql)),
      ("q81_postings", CorpusOps.postings _, Some(CorpusOps.postingsSql)),
      ("q82_term_lift", CorpusOps.termLift _, Some(CorpusOps.termLiftSql)),
      ("q83_funnel_stages", StatsOps.funnelStages _,
        Some(StatsOps.funnelStagesSql)),
      ("q84_dup_graph_degree", DedupOps.dupGraphDegree _,
        Some(DedupOps.dupGraphDegreeSql)),
      ("q85_char_diversity", CorpusOps.charDiversity _,
        Some(CorpusOps.charDiversitySql)),
      ("q86_dup_ngram_rate", CorpusOps.dupNgramRate _,
        Some(CorpusOps.dupNgramRateSql)),
      ("q87_langid_confusion", TextOps.langIdConfusion _,
        Some(TextOps.langIdConfusionSql)),
      ("q88_quality_gate", CorpusOps.qualityGate _,
        Some(CorpusOps.qualityGateSql)),
      ("q89_stream_quality_gate", StreamOps.streamQualityGate _,
        Some(StreamOps.streamQualityGateSql)),
      ("q90_stream_sessionize", StreamOps.streamSessionize _,
        Some(StreamOps.streamSessionizeSql)),
      ("q91_epoch_shuffle", LayoutOps.epochShuffle _,
        Some(LayoutOps.epochShuffleSql)),
      ("q92_containment", DedupOps.bigramContainment _,
        Some(DedupOps.bigramContainmentSql)),
      ("q93_minhash_est_error", DedupOps.minhashEstError _,
        Some(DedupOps.minhashEstErrorSql)),
      ("q94_cohort_retention", StatsOps.cohortRetention _,
        Some(StatsOps.cohortRetentionSql)),
      ("q95_source_similarity", CorpusOps.sourceSimilarity _,
        Some(CorpusOps.sourceSimilaritySql)),
      ("q96_ann_pq", SimilarityOps.annPq _, Some(SimilarityOps.annPqSql)),
      ("q97_source_sample", CorpusOps.sourceSample _,
        Some(CorpusOps.sourceSampleSql)),
      ("q98_stateful_v2_aggs", StreamOps.statefulUserAggs _,
        Some(StreamOps.statefulUserAggsSql)),
    )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
