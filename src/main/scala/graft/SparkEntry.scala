package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Dedup, Events, Multimodal, Similarity, TextAnalysis}
import graft.stac.StacOps

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** Ensure session conf/functions regardless of who built the session. */
  private def wrap(f: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame =
    (s, dir) => { GraftSession.prepare(s); f(s, dir) }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> wrap(Analytics.q1PricingSummary),
    "q3_shipping_priority" -> wrap(Analytics.q3ShippingPriority),
    "q5_region_revenue" -> wrap(Analytics.q5RegionRevenue),
    "topk_customers_per_nation" -> wrap(Analytics.topkCustomersPerNation),
    "monthly_revenue" -> wrap(Analytics.monthlyRevenue),
    "running_revenue" -> wrap(Analytics.runningRevenue),
    "revenue_7day_avg" -> wrap(Analytics.revenue7DayAvg),
    "events_funnel" -> wrap(Analytics.eventsFunnel),
    "supplier_part_share" -> wrap(Analytics.supplierPartShare(_, _)),
    "discounted_orders" -> wrap(Analytics.discountedOrders),
    "customers_without_orders" -> wrap(Analytics.customersWithoutOrders),
    "revenue_rollup" -> wrap(Analytics.revenueRollup),
    "geomean_order_value" -> wrap(Analytics.geomeanOrderValue),
    "events_sessionize" -> wrap(Events.sessionize(_, _)),
    "events_window_agg" -> wrap(Events.windowAgg),
    "events_salted_agg" -> wrap(Events.saltedAgg(_, _)),
    "events_props_extract" -> wrap(Events.propsExtract),
    "events_approx_users" -> wrap(Events.approxUsers(_, _)),
    "events_retention" -> wrap(Events.retention),
    "events_cohort_retention" -> wrap(Events.cohortRetention),
    "events_type_pivot" -> wrap(Events.typePivot),
    "events_value_percentiles" -> wrap(Events.valuePercentiles),
    "events_type_cube" -> wrap(Events.typeBucketCube),
    "text_tfidf" -> wrap(TextAnalysis.tfidf(_, _)),
    "stac_parse_items" -> wrap(StacOps.parseItems),
    "stac_link_extract" -> wrap(StacOps.linkExtract),
    "stac_bbox_filter" -> wrap(StacOps.bboxFilter(_, _)),
    "stac_temporal_filter" -> wrap(StacOps.temporalFilter(_, _)),
    "stac_daily_links" -> wrap(StacOps.dailyLinks),
    "stac_monthly_rollup" -> wrap(StacOps.monthlyRollup),
    "stac_mgrs_extract" -> wrap(StacOps.mgrsExtract),
    "stac_failed_links" -> wrap(StacOps.failedLinks),
    "stac_asset_access" -> wrap(StacOps.assetAccess),
    "mgrs_to_latlon" -> wrap(StacOps.mgrsToLatLon),
    "hilbert_index" -> wrap(StacOps.hilbertIndexQuery),
    "spatial_sort" -> wrap(StacOps.spatialSort(_, _)),
    "dedup_exact" -> wrap(Dedup.exact),
    "dedup_ngram_jaccard" -> wrap(Dedup.ngramJaccard(_, _)),
    "dedup_minhash_lsh" -> wrap(Dedup.minhashLsh(_, _)),
    "dedup_simhash" -> wrap(Dedup.simhashPairs(_, _)),
    "dedup_embedding" -> wrap(Dedup.embeddingPairs(_, _)),
    "dedup_clusters" -> wrap(Dedup.clusters(_, _)),
    "dedup_cluster_keepers" -> wrap(Dedup.clusterKeepers(_, _)),
    "dedup_semantic" -> wrap(Dedup.semanticDedup(_, _)),
    "dedup_lang_retention" -> wrap(Dedup.dedupLangRetention(_, _)),
    "knn_brute_force" -> wrap(Similarity.knnBruteForce(_, _)),
    "knn_ivf" -> wrap(Similarity.knnIvf(_, _)),
    "knn_lsh" -> wrap(Similarity.knnLsh(_, _)),
    "knn_graph" -> wrap(Similarity.knnGraph(_, _)),
    "knn_sq8" -> wrap(Similarity.knnSq8(_, _)),
    "knn_lsh_multi" -> wrap(Similarity.knnLshMulti(_, _)),
    "embedding_quantize" -> wrap(Similarity.quantizeEmbeddings),
    "text_token_count" -> wrap(TextAnalysis.tokenCount),
    "text_quality" -> wrap(TextAnalysis.quality),
    "text_langid" -> wrap(TextAnalysis.langId),
    "text_fingerprint" -> wrap(TextAnalysis.fingerprint),
    "text_ngram_freq" -> wrap(TextAnalysis.ngramFreq(_, _)),
    "text_novelty" -> wrap(TextAnalysis.novelty(_, _)),
    "text_clean" -> wrap(TextAnalysis.clean),
    "multimodal_meta" -> wrap(Multimodal.mediaMeta),
    "multimodal_frames" -> wrap(Multimodal.sampleFrames(_, _)),
    "multimodal_resize" -> wrap(Multimodal.resizePlan(_, _)),
    "stream_window_agg" -> wrap(graft.streaming.EventStreams.windowAgg),
    "stream_sessionize" -> wrap(graft.streaming.EventStreams.sessionize),
    "stream_dedup_count" -> wrap(graft.streaming.EventStreams.dedupCount),
    "stream_user_totals" -> wrap(graft.streaming.EventStreams.userRunningTotals),
    "curate_corpus" -> wrap(graft.ops.TextPipeline.curate(_, _)),
    "events_asof_join" -> wrap(graft.ops.AsOf.viewPurchase),
    "dataset_split" -> wrap(graft.ops.Curation.datasetSplit),
    "pack_sequences" -> wrap(graft.ops.Curation.packSequences(_, _)),
    "contamination_check" -> wrap(graft.ops.Curation.contaminationCheck(_, _)),
    "lang_mix_weights" -> wrap(graft.ops.Curation.langMixWeights),
    "lang_temperature_mix" -> wrap(graft.ops.Curation.langTemperatureMix(_, _)),
    "lang_epoch_plan" -> wrap(graft.ops.Curation.langEpochPlan(_, _)),
    "embedding_centroids" -> wrap(Similarity.labelCentroids),
    "events_range_join" -> wrap((s, d) => graft.ops.RangeJoin.busyWindows(s, d)),
    "events_latest_state" -> wrap(Events.latestState),
    "text_regex_tokens" -> wrap(TextAnalysis.regexTokens),
    "vocab_top" -> wrap((s, d) => TextAnalysis.vocabulary(s, d)),
    "oov_rate" -> wrap((s, d) => TextAnalysis.oovRate(s, d)),
    "doc_chunks" -> wrap(TextAnalysis.chunkDocuments(_, _)),
    "token_histogram" -> wrap(TextAnalysis.tokenHistogram(_, _)),
    "sample_stratified" -> wrap(graft.ops.Curation.stratifiedSample),
    "global_shuffle" -> wrap(graft.ops.Curation.globalShuffle),
    "text_repetition" -> wrap(TextAnalysis.repetition),
    "text_entropy" -> wrap(TextAnalysis.charEntropy),
    "text_pii_scrub" -> wrap(TextAnalysis.piiScrub),
    "events_skew_join" -> wrap(Events.skewJoin(_, _)),
    "stream_join" -> wrap(graft.streaming.EventStreams.streamJoin),
    "bpe_pair_stats" -> wrap(TextAnalysis.bpePairStats(_, _)),
    "dedup_paragraphs" -> wrap(Dedup.paragraphs(_, _)),
    "dedup_edit_distance" -> wrap(Dedup.editDistancePairs(_, _)),
    "events_daily_full_join" -> wrap(Events.dailyActivityJoin),
    "customer_max_order" -> wrap(Analytics.customerMaxOrder),
    "nation_set_ops" -> wrap(Analytics.nationSetOps),
    "q2_min_cost_supplier" -> wrap(Analytics.q2MinCostSupplier(_, _)),
    "q4_late_orders" -> wrap(Analytics.q4LateOrders),
    "q6_forecast_revenue" -> wrap(Analytics.q6ForecastRevenue(_, _)),
    "q8_market_share" -> wrap(Analytics.q8MarketShare(_, _)),
    "q9_product_profit" -> wrap(Analytics.q9ProductProfit(_, _)),
    "q10_returned_items" -> wrap(Analytics.q10ReturnedItems(_, _)),
    "q12_late_priority" -> wrap(Analytics.q12LatePriority),
    "q13_order_distribution" -> wrap(Analytics.q13OrderDistribution),
    "q14_promo_revenue" -> wrap(Analytics.q14PromoRevenue(_, _)),
    "q15_top_supplier" -> wrap(Analytics.q15TopSupplier(_, _)),
    "q17_small_qty_revenue" -> wrap(Analytics.q17SmallQtyRevenue(_, _)),
    "q19_bracketed_revenue" -> wrap(Analytics.q19BracketedRevenue),
    "q20_dominant_suppliers" -> wrap(Analytics.q20DominantSuppliers(_, _)),
    "q21_waiting_suppliers" -> wrap(Analytics.q21WaitingSuppliers),
    "q7_nation_trade" -> wrap(Analytics.q7NationTrade(_, _)),
    "q11_part_value_share" -> wrap(Analytics.q11PartValueShare),
    "q16_brand_suppliers" -> wrap(Analytics.q16BrandSuppliers),
    "q18_large_orders" -> wrap(Analytics.q18LargeOrders(_, _)),
    "q22_idle_balance" -> wrap(Analytics.q22IdleBalance(_, _)),
    "stac_grid_join" -> wrap(StacOps.gridJoin),
    "text_unigram_logprob" -> wrap(TextAnalysis.unigramLogprob),
    "cms_heavy_hitters" -> wrap(TextAnalysis.cmsHeavyHitters(_, _)),
    "bpe_merge_seq" -> wrap(TextAnalysis.bpeMerges(_, _)),
    "bpe_encode" -> wrap(TextAnalysis.bpeEncode(_, _)),
    "events_approx_percentiles" -> wrap(Events.approxPercentiles(_, _)),
    "corpus_budget_select" -> wrap(graft.ops.Curation.budgetSelect(_, _)),
    "curriculum_order" -> wrap(graft.ops.Curation.curriculumOrder),
    "dedup_incremental" -> wrap(Dedup.incremental(_, _)),
    "events_hll_merge" -> wrap(Events.hllMergeUsers),
    "stac_bbox_wrapped" -> wrap(StacOps.bboxFilterWrapped(_, _)),
    "stac_cloud_filter" -> wrap(StacOps.cloudCoverFilter(_, _)),
    "stac_upsert_latest" -> wrap(StacOps.upsertLatest),
    "stac_coverage_gaps" -> wrap(StacOps.coverageGaps),
    "stream_stac_daily" -> wrap(graft.streaming.StacStreams.dailyLinkCounts),
    "stream_upsert_latest" -> wrap(graft.streaming.StacStreams.upsertLatest),
    "knn_pq" -> wrap(Similarity.knnPq(_, _)),
    "knn_ivfpq" -> wrap(Similarity.knnIvfPq(_, _)),
    "topk_orders_heap" -> wrap(Analytics.topkOrdersHeap(_, _)),
    "stream_cms_counters" -> wrap(graft.streaming.TextStreams.cmsCounters),
    "dedup_span_exact" -> wrap(Dedup.dupSpans(_, _)),
    "knn_label_check" -> wrap(Similarity.knnLabelCheck(_, _)),
    "importance_weights" -> wrap(graft.ops.Curation.importanceWeights(_, _)),
    "split_leakage" -> wrap(graft.ops.Curation.splitLeakage(_, _)),
    "embedding_kmeans" -> wrap(Similarity.embeddingKmeans(_, _)),
    "dedup_containment" -> wrap(Dedup.containmentPairs(_, _)),
    "multimodal_shards" -> wrap(Multimodal.shardPack(_, _)),
    "events_mad_outliers" -> wrap(Events.madOutliers(_, _)),
    "text_bigram_surprisal" -> wrap(TextAnalysis.bigramSurprisal(_, _)),
    "stream_importance" -> wrap(graft.streaming.TextStreams.importanceScores),
    "events_gap_fill" -> wrap(Events.dailyGapFill),
    "text_zipf_fit" -> wrap((s, d) => TextAnalysis.zipfFit(s, d)),
    "events_scd2" -> wrap(Events.scd2),
    "events_transitions" -> wrap(Events.transitions),
    "stream_transitions" -> wrap(graft.streaming.EventStreams.transitionCounts),
    "text_kn_bigram" -> wrap((s, d) => TextAnalysis.knBigram(s, d)),
    "text_mattr" -> wrap((s, d) => TextAnalysis.mattr(s, d)),
    "text_burstiness" -> wrap((s, d) => TextAnalysis.burstiness(s, d)),
    "text_readability" -> wrap(TextAnalysis.readability),
    "text_gopher_rules" -> wrap(TextAnalysis.gopherRules),
    "events_attribution" -> wrap(Events.attribution(_, _)),
    "knn_graph_pagerank" -> wrap(Similarity.knnGraphPagerank(_, _)),
    "stream_centroid_assign" -> wrap(graft.streaming.EmbedStreams.centroidAssign),
    "ann_recall_report" -> wrap((s, d) => Similarity.annRecallReport(s, d)),
    "stream_gopher_filter" -> wrap(graft.streaming.TextStreams.gopherFilter),
    "order_value_deciles" -> wrap(Analytics.orderValueDeciles)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ Events.oracles ++ StacOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
      Multimodal.oracles ++ graft.streaming.EventStreams.oracles ++
      graft.ops.TextPipeline.oracles ++ graft.ops.AsOf.oracles ++
      graft.ops.Curation.oracles ++ graft.ops.RangeJoin.oracles ++
      graft.streaming.StacStreams.oracles ++
      graft.streaming.TextStreams.oracles ++
      graft.streaming.EmbedStreams.oracles
}
