package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries => C, LlmQueries => L, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; [[graft.queries.Oracles]] carries the DuckDB-equivalent
  * SQL for each entry that is SQL-expressible (the rest get the driver's
  * rows-only check and brute-force ScalaTest verification).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    C.j1BroadcastJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the
    * LLM-pipeline operator families.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans / §2.6 sorts
    "s1_scan_pushdown" -> (C.s1ScanPushdown _),
    "s2_point_lookup" -> (C.s2PointLookup _),
    "o1_sort_limit" -> (C.o1SortLimit _),
    // §2.2 projections / filters
    "p1_wide_projection" -> (C.p1WideProjection _),
    "p6_event_filters" -> (C.p6EventFilters _),
    "p9_json_extract" -> (C.p9JsonExtract _),
    // §2.3 joins
    "j1_broadcast_join" -> (C.j1BroadcastJoin _),
    "j2_explode" -> (C.j2Explode _),
    "asof_join" -> (C.asofJoin _),
    "asof_forward" -> (C.asofForward _),
    "asof_nearest" -> (C.asofNearest _),
    "asof_tolerance" -> (C.asofTolerance _),
    "asof_join_bucketed" -> (C.asofJoinBucketed _),
    // §2.5 windows
    "w2_lag_intervals" -> (C.w2LagIntervals _),
    "sessionize" -> (C.sessionize _),
    "scd2_compact" -> (C.scd2Compact _),
    "funnel_steps" -> (C.funnelSteps _),
    "graph_pagerank" -> (C.graphPagerank _),
    "graph_ppr_expand" -> (C.graphPprExpand _),
    "watermark_audit" -> (C.watermarkAudit _),
    "event_gaps" -> (C.eventGaps _),
    "value_psi" -> (C.valuePsi _),
    "cohort_retention" -> (C.cohortRetention _),
    "dsv2_scan_pushdown" -> (C.dsv2ScanPushdown _),
    "session_parity" -> (C.sessionParity _),
    "quality_percentile_gate" -> (L.qualityPercentileGate _),
    "quality_outliers" -> (L.qualityOutliers _),
    "quality_gate" -> (C.qualityGate _),
    "quality_quarantine" -> (C.qualityQuarantine _),
    "mm_audio_windows" -> (L.mmAudioWindows _),
    // §2.4 aggregations
    "a1_status_metrics" -> (C.a1StatusMetrics _),
    "a1_business_metrics" -> (L.a1BusinessMetrics _),
    "a2_count_by_type" -> (C.a2CountByType _),
    "a3_watermark" -> (C.a3Watermark _),
    "a4_dedup_latest" -> (C.a4DedupLatest _),
    "a5_run_stats" -> (C.a5RunStats _),
    "q1_pricing_summary" -> (C.q1PricingSummary _),
    // §2.8 scalar functions
    "f1_snake_case" -> (C.f1SnakeCase _),
    "f1_snake_case_native" -> (C.f1SnakeCaseNative _),
    "f2_strip_emoji" -> (C.f2StripEmoji _),
    "f3_datetime_convert" -> (C.f3DatetimeConvert _),
    "f4_timedelta" -> (C.f4Timedelta _),
    "f6_human_time" -> (C.f6HumanTime _),
    "f9_stringify" -> (C.f9Stringify _),
    "f12_to_json" -> (C.f12ToJson _),
    "f13_array_ops" -> (C.f13ArrayOps _),
    // §2.9 streaming-equivalent
    "stream_window_counts" -> (C.streamWindowCounts _),
    "stream_attribution" -> (C.streamAttribution _),
    "incremental_scan" -> (C.incrementalScan _),
    "window_scan" -> (C.windowScan _),
    // the real issue pipeline over the deterministic fixture corpus
    "pipeline_metrics" -> (graft.queries.PipelineFixture.pipelineMetrics _),
    "pipeline_issues" -> (graft.queries.PipelineFixture.pipelineIssues _),
    "pipeline_changelog" -> (graft.queries.PipelineFixture.pipelineChangelog _),
    "pipeline_comments" -> (graft.queries.PipelineFixture.pipelineComments _),
    "pipeline_issues_extended" -> (graft.queries.PipelineFixture.pipelineIssuesExtended _),
    "pipeline_scale" -> (graft.queries.PipelineFixture.pipelineScale _),
    // LLM-pipeline: dedup family
    "dedup_exact" -> (L.dedupExact _),
    "dedup_incremental" -> (L.dedupIncremental _),
    "dedup_incremental_commit" -> (L.dedupIncrementalCommit _),
    "dedup_source_overlap" -> (L.dedupSourceOverlap _),
    "dedup_cluster_best" -> (L.dedupClusterBest _),
    "dedup_minhash" -> (L.dedupMinhash _),
    "dedup_ngram" -> (L.dedupNgram _),
    "dedup_containment" -> (L.dedupContainment _),
    "dedup_simhash" -> (L.dedupSimhash _),
    "dedup_embedding" -> (L.dedupEmbedding _),
    "dedup_embedding_clusters" -> (L.dedupEmbeddingClusters _),
    "dedup_clusters" -> (L.dedupClusters _),
    "dedup_minhash_clusters" -> (L.dedupMinhashClusters _),
    "dedup_decontaminate" -> (L.dedupDecontaminate _),
    "decontam_answers" -> (L.decontamAnswers _),
    "dedup_contaminated_ngrams" -> (L.dedupContaminatedNgrams _),
    "dedup_contaminated_bloom" -> (L.dedupContaminatedBloom _),
    "dedup_semantic" -> (L.dedupSemantic _),
    "dedup_spans" -> (L.dedupSpans _),
    "dedup_span_scrub" -> (L.dedupSpanScrub _),
    "text_dedup_units" -> (L.textDedupUnits _),
    "quality_classifier" -> (L.qualityClassifier _),
    "classifier_train" -> (L.classifierTrain _),
    "classifier_eval" -> (L.classifierEval _),
    "kmeans_train" -> (L.kmeansTrain _),
    "emb_centroid_cos" -> (L.embCentroidCos _),
    "text_embed_hash" -> (L.textEmbedHash _),
    "bpe_merges" -> (L.bpeMerges _),
    "bpe_tokenize" -> (L.bpeTokenize _),
    "ann_hash_embed" -> (L.annHashEmbed _),
    "curation_classifier" -> (L.curationClassifier _),
    "curation_adaptive" -> (L.curationAdaptive _),
    // LLM-pipeline: similarity search
    "ann_brute" -> (L.annBrute _),
    "ann_lsh" -> (L.annLsh _),
    "ann_ivf" -> (L.annIvf _),
    "bm25_topk" -> (L.bm25TopK _),
    "retrieval_rrf" -> (L.retrievalRrf _),
    "retrieval_rerank" -> (L.retrievalRerank _),
    "retrieval_maxsim" -> (L.retrievalMaxsim _),
    "retrieval_negatives" -> (L.retrievalNegatives _),
    "curriculum_order" -> (L.curriculumOrder _),
    "rag_index" -> (L.ragIndex _),
    "preference_pairs" -> (L.preferencePairs _),
    "emb_project" -> (L.embProject _),
    // LLM-pipeline: multimodal columns
    "mm_image_meta" -> (L.mmImageMeta _),
    "mm_frame_sample" -> (L.mmFrameSample _),
    "mm_decode_batched" -> (L.mmDecodeBatched _),
    "mm_resize" -> (L.mmResize _),
    // LLM-pipeline: text analysis
    "text_quality" -> (L.textQuality _),
    "text_entropy" -> (L.textEntropy _),
    "text_langid" -> (L.textLangid _),
    "text_tokens" -> (L.textTokens _),
    "text_fingerprint" -> (L.textFingerprint _),
    "text_winnow" -> (L.textWinnow _),
    "quality_blend" -> (L.qualityBlend _),
    "dedup_winnow" -> (L.dedupWinnow _),
    "dedup_winnow_clusters" -> (L.dedupWinnowClusters _),
    "text_repetition" -> (L.textRepetition _),
    "text_pii" -> (L.textPii _),
    "corpus_stats" -> (L.corpusStats _),
    "corpus_drift" -> (L.corpusDrift _),
    "text_top_terms" -> (L.textTopTerms _),
    "text_collocations" -> (L.textCollocations _),
    "sketch_overlap" -> (L.sketchOverlap _),
    "corpus_card" -> (L.corpusCard _),
    "sketch_distinct" -> (L.sketchDistinct _),
    "sketch_hll" -> (L.sketchHll _),
    "minhash_accuracy" -> (L.minhashAccuracy _),
    "minhash_banding" -> (L.minhashBanding _),
    "minhash_bbit" -> (L.minhashBbit _),
    "dedup_incremental_minhash" -> (L.dedupIncrementalMinhash _),
    "simhash_accuracy" -> (L.simhashAccuracy _),
    "shard_balance" -> (L.shardBalance _),
    "snapshot_diff" -> (L.snapshotDiff _),
    "skew_join" -> (L.skewJoin _),
    "quantile_sketch" -> (L.quantileSketch _),
    "text_normalize" -> (L.textNormalize _),
    "event_anomaly" -> (L.eventAnomaly _),
    "emb_pool" -> (L.embPool _),
    "ann_ivf_append" -> (L.annIvfAppend _),
    "quality_histogram_gate" -> (L.qualityHistogramGate _),
    "dedup_exact_nfc" -> (L.dedupExactNfc _),
    "url_canonical" -> (L.urlCanonical _),
    "zorder_code" -> (L.zorderCode _),
    "sketch_countmin" -> (L.sketchCountMin _),
    "corpus_manifest" -> (L.corpusManifest _),
    "quality_gopher" -> (L.qualityGopher _),
    "text_perplexity" -> (L.textPerplexity _),
    "text_perplexity2" -> (L.textPerplexity2 _),
    "text_chunks" -> (L.textChunks _),
    "text_keywords" -> (L.textKeywords _),
    "emb_quantize" -> (L.embQuantize _),
    "emb_norms" -> (L.embNorms _),
    "emb_pq" -> (L.embPq _),
    "ann_pq" -> (L.annPq _),
    "ann_ivfpq" -> (L.annIvfPq _),
    "ann_pq_recall" -> (L.annPqRecall _),
    "ann_pq_refined" -> (L.annPqRefined _),
    "ann_ivfpq_recall" -> (L.annIvfPqRecall _),
    // LLM-pipeline: training-mix selection
    "select_token_budget" -> (L.selectTokenBudget _),
    "select_token_budget_approx" -> (L.selectTokenBudgetApprox _),
    "select_mixture" -> (L.selectMixture _),
    "select_dsir" -> (L.selectDsir _),
    "select_dsir_sample" -> (L.selectDsirSample _),
    "mixture_weights" -> (L.mixtureWeights _),
    "mixture_epochs" -> (L.mixtureEpochs _),
    "sample_temperature" -> (L.sampleTemperature _),
    "ann_recall" -> (L.annRecall _),
    "text_boilerplate" -> (L.textBoilerplate _),
    "sample_stratified" -> (L.sampleStratified _),
    "sample_weighted" -> (L.sampleWeighted _),
    "split_assign" -> (L.splitAssign _),
    "split_leakage" -> (L.splitLeakage _),
    "langid_confusion" -> (L.langidConfusion _),
    "pack_sequences" -> (L.packSequences _),
    "corpus_curation" -> (L.corpusCuration _),
    "curation_pipeline" -> (L.curationPipeline _),
    "curation_full" -> (L.curationFull _),
    "curation_decontam" -> (L.curationDecontam _),
    "curation_funnel" -> (L.curationFunnel _),
    "url_filter" -> (L.urlFilter _),
    "url_domain_cap" -> (L.urlDomainCap _),
    // LLM-pipeline: privacy / release compliance
    "kanon_suppress" -> (L.kanonSuppress _),
    "deletion_audit" -> (L.deletionAudit _),
    "dp_counts" -> (L.dpCounts _),
    // LLM-pipeline: CDC chunking, record linkage, coverage audits
    "chunk_cdc" -> (L.chunkCdc _),
    "fuzzy_match" -> (L.fuzzyMatch _),
    "emb_coverage" -> (L.embCoverage _),
    "vocab_oov" -> (L.vocabOov _),
    "dedup_stitch" -> (L.dedupStitch _),
    "pack_efficiency" -> (L.packEfficiency _),
    // OLAP surfaces: grouping sets + pivot + unpivot
    "sales_rollup" -> (C.salesRollup _),
    "sales_cube" -> (C.salesCube _),
    "event_pivot" -> (C.eventPivot _),
    "metrics_unpivot" -> (C.metricsUnpivot _),
    "event_markov" -> (C.eventMarkov _),
    "graph_triangles" -> (C.graphTriangles _),
    "graph_bfs" -> (C.graphBfs _),
    "graph_communities" -> (C.graphCommunities _),
    "covisit_topk" -> (C.covisitTopk _),
    "event_paths" -> (C.eventPaths _),
    "q5_local_supplier" -> (C.q5LocalSupplier _),
    "quality_winsorize" -> (L.qualityWinsorize _),
    "interval_join" -> (C.intervalJoin _),
    "bootstrap_ci" -> (L.bootstrapCi _),
    "resample_ffill" -> (C.resampleFfill _),
    "cdc_merge" -> (C.cdcMerge _),
    "set_ops" -> (C.setOps _),
    "value_deciles" -> (C.valueDeciles _),
    "json_profile" -> (C.jsonProfile _),
    "t5_spans" -> (L.t5Spans _),
    "vocab_growth" -> (L.vocabGrowth _),
    "mm_dedup" -> (L.mmDedup _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — EVERY registered query has one, including
    * both approximate ANN paths: ann_lsh regenerates its LCG hyperplanes
    * in a recursive CTE, and ann_ivf replays the java.util.Random
    * centroid draws plus all ten Lloyd iterations in SQL, so even the
    * "model fit" quantizer is hash-verified bit-for-bit.
    */
  def oracleSql: Map[String, String] = Oracles.sql
}
