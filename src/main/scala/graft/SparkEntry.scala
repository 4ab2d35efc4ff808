package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.readside.{CrawlQueries, OracleSql, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the operator inventory (SURVEY.md §2); every entry with a
  * DuckDB-expressible semantic also appears in `oracleSql` and is checked
  * value-exactly by the driver; the rest (crawl pipeline, LSH internals)
  * get rows-only checks plus ScalaTest property coverage.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01PricingSummary _),
    "q02_filter_project" -> (Queries.q02FilterProject _),
    "q03_join_agg" -> (Queries.q03JoinAgg _),
    "q04_part_join" -> (Queries.q04PartJoin _),
    "q05_region_rollup" -> (Queries.q05RegionRollup _),
    "q06_conditional_agg" -> (Queries.q06ConditionalAgg _),
    "q07_topk" -> (Queries.q07TopK _),
    "q08_window_rank" -> (Queries.q08WindowRank _),
    "q09_semi_join" -> (Queries.q09SemiJoin _),
    "q10_anti_join" -> (Queries.q10AntiJoin _),
    "q11_distinct" -> (Queries.q11Distinct _),
    "q12_set_ops" -> (Queries.q12SetOps _),
    "q13_date_series" -> (Queries.q13DateSeries _),
    "q14_events_hourly" -> (Queries.q14EventsHourly _),
    "q15_retry_selection" -> (Queries.q15RetrySelection _),
    "q16_pagination" -> (Queries.q16Pagination _),
    "q17_search" -> (Queries.q17Search _),
    "q18_source_facet" -> (Queries.q18SourceFacet _),
    "q19_ecli_validate" -> (Queries.q19EcliValidate _),
    "q20_url_canon" -> (Queries.q20UrlCanon _),
    "q21_token_stats" -> (Queries.q21TokenStats _),
    "q22_langid" -> (Queries.q22LangId _),
    "q23_quality" -> (Queries.q23Quality _),
    "q24_dedup_exact" -> (Queries.q24DedupExact _),
    "q25_json_props" -> (Queries.q25JsonProps _),
    "q26_simhash_blocks" -> (Queries.q26SimhashBlocks _),
    "q27_minhash_lsh" -> (Queries.q27MinhashLsh _),
    "q28_knn_brute" -> (Queries.q28KnnBrute _),
    "q29_cosine_near_dup" -> (Queries.q29CosineNearDup _),
    "q30_srp_ann" -> (Queries.q30SrpAnn _),
    "q31_fingerprint" -> (Queries.q31Fingerprint _),
    "q32_sort_param" -> (Queries.q32SortParam _),
    "q33_strided_sample" -> (Queries.q33StridedSample _),
    "q34_fulltext_assembly" -> (Queries.q34FulltextAssembly _),
    "q35_ecli_extract" -> (Queries.q35EcliExtract _),
    "q36_bloom_udaf" -> (Queries.q36BloomUdaf _),
    "q37_metadata_map" -> (Queries.q37MetadataMap _),
    "q38_ivf_ann" -> (Queries.q38IvfAnn _),
    "q39_ngram_jaccard" -> (Queries.q39NgramJaccard _),
    "q40_curation_pipeline" -> (Queries.q40CurationPipeline _),
    "q41_dedup_clusters" -> (Queries.q41DedupClusters _),
    "q42_contamination" -> (Queries.q42Contamination _),
    "q43_stratified_sample" -> (Queries.q43StratifiedSample _),
    "q44_repetition_stats" -> (Queries.q44RepetitionStats _),
    "q45_unigram_xent" -> (Queries.q45UnigramXent _),
    "q46_bm25_search" -> (Queries.q46Bm25Search _),
    "q47_sequence_packing" -> (Queries.q47SequencePacking _),
    "q48_chunk_dedup" -> (Queries.q48ChunkDedup _),
    "q49_temperature_mix" -> (Queries.q49TemperatureMix _),
    "q50_training_assembly" -> (Queries.q50TrainingAssembly _),
    "q51_semdedup" -> (Queries.q51SemDedup _),
    "q52_dsir_selection" -> (Queries.q52DsirSelection _),
    "q53_host_rank" -> (Queries.q53HostRank _),
    "q54_asof_join" -> (Queries.q54AsofJoin _),
    "q55_sessionize" -> (Queries.q55Sessionize _),
    "q56_heavy_hitters" -> (Queries.q56HeavyHitters _),
    "q57_group_quantiles" -> (Queries.q57GroupQuantiles _),
    "q58_bottomk_sample" -> (Queries.q58BottomKSample _),
    "q59_holdout_split" -> (Queries.q59HoldoutSplit _),
    "q60_containment_dedup" -> (Queries.q60ContainmentDedup _),
    "q61_novelty_drift" -> (Queries.q61NoveltyDrift _),
    "q62_shard_shuffle" -> (Queries.q62ShardShuffle _),
    "q63_incremental_dedup" -> (Queries.q63IncrementalDedup _),
    "q64_pii_scrub" -> (Queries.q64PiiScrub _),
    "q65_substr_dup_spans" -> (Queries.q65SubstringDupSpans _),
    "q66_pmi_bigrams" -> (Queries.q66PmiBigrams _),
    "q67_rate_anomaly" -> (Queries.q67RateAnomaly _),
    "q68_weighted_sample" -> (Queries.q68WeightedSample _),
    "q69_fim_split" -> (Queries.q69FimSplit _),
    "q70_best_passage" -> (Queries.q70BestPassage _),
    "q71_sample_quantiles" -> (Queries.q71SampleQuantiles _),
    "q72_kmv_distinct" -> (Queries.q72KmvDistinct _),
    "q73_tfidf_terms" -> (Queries.q73TfidfTerms _),
    "q74_inverted_index" -> (Queries.q74InvertedIndex _),
    "q75_vocab_growth" -> (Queries.q75VocabGrowth _),
    "q76_bigram_lm" -> (Queries.q76BigramLm _),
    "q77_cms_freq" -> (Queries.q77CmsFreq _),
    "q78_postings_sim" -> (Queries.q78PostingsSimilarity _),
    "q79_kmeans" -> (Queries.q79KmeansLloyd _),
    "q80_shared_passages" -> (Queries.q80SharedPassages _),
    "q81_cohort_retention" -> (Queries.q81CohortRetention _),
    "q82_funnel" -> (Queries.q82Funnel _),
    "q83_triangle_stats" -> (Queries.q83TriangleStats _),
    "c01_frontier_synth" -> (CrawlQueries.c01FrontierSynth _),
    "c02_robots_admission" -> (CrawlQueries.c02RobotsAdmission _),
    "c03_epoch_metrics" -> (CrawlQueries.c03EpochMetrics _),
    "c04_lineage" -> (CrawlQueries.c04Lineage _),
    "c05_payload_invariants" -> (CrawlQueries.c05PayloadInvariants _),
    "c06_politeness_audit" -> (CrawlQueries.c06PolitenessAudit _),
    "c07_payload_search" -> (CrawlQueries.c07PayloadSearch _),
    "c08_latest_docs" -> (CrawlQueries.c08LatestDocs _),
    "c09_reject_reasons" -> (CrawlQueries.c09RejectReasons _),
    "c10_discovery" -> (CrawlQueries.c10Discovery _),
    "c11_image_features" -> (CrawlQueries.c11ImageFeatures _),
    "c12_bloom_store" -> (CrawlQueries.c12BloomStore _),
    "c13_validate_payload" -> (CrawlQueries.c13ValidatePayload _),
    "c14_phash_neardup" -> (CrawlQueries.c14PhashNearDup _),
    "c15_image_dedup_clusters" -> (CrawlQueries.c15ImageDedupClusters _),
    "c16_multimodal_consensus" -> (CrawlQueries.c16MultimodalConsensus _),
    "c17_caption_extraction" -> (CrawlQueries.c17CaptionExtraction _),
    "c18_discovery_bounds" -> (CrawlQueries.c18DiscoveryBounds _),
    "c19_deep_validation" -> (CrawlQueries.c19DeepValidation _),
    "c20_snapshot_history" -> (CrawlQueries.c20SnapshotHistory _),
    "c21_snapshot_changes" -> (CrawlQueries.c21SnapshotChanges _),
    "c22_snapshot_deletes" -> (CrawlQueries.c22SnapshotDeletes _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
