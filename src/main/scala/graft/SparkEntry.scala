package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (Relational.q1Pricing _),
    "q3_shipping" -> (Relational.q3Shipping _),
    "q5_local" -> (Relational.q5Local _),
    "q6_forecast" -> (Relational.q6Forecast _),
    "q10_returns" -> (Relational.q10Returns _),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q4_priority" -> (Relational2.q4Priority _),
    "q7_volume" -> ((s, d) => Relational2.q7Volume(s, d)),
    "q12_priority" -> (Relational2.q12Priority _),
    "q13_custdist" -> (Relational2.q13Custdist _),
    "q14_promo" -> (Relational2.q14Promo _),
    "q15_top_supplier" -> (Relational2.q15TopSupplier _),
    "q17_small_qty" -> ((s, d) => Relational2.q17SmallQty(s, d)),
    "q19_discounted" -> (Relational2.q19Discounted _),
    "q22_no_orders" -> (Relational2.q22NoOrders _),
    "q2_min_cost" -> (Relational3.q2MinCost _),
    "q8_market_share" -> (Relational3.q8MarketShare _),
    "q9_profit" -> (Relational3.q9Profit _),
    "q11_important_parts" -> (Relational3.q11ImportantParts _),
    "q16_supplier_counts" -> (Relational3.q16SupplierCounts _),
    "q20_promo_suppliers" -> (Relational3.q20PromoSuppliers _),
    "q21_waiting_suppliers" -> (Relational3.q21WaitingSuppliers _),
    // Warehouse/pipeline analytics (SURVEY §2 H)
    "events_rollup" -> (Analytics.eventsRollup _),
    "events_salted_agg" -> ((s, d) => Analytics.eventsSaltedAgg(s, d)),
    "events_anomaly" -> ((s, d) => Analytics.eventsAnomaly(s, d)),
    "sample_stratified" -> (Analytics.sampleStratified _),
    "emb_centroids" -> (Analytics.embCentroids _),
    "dedup_clusters" -> ((s, d) => Analytics.dedupClusters(s, d)),
    "doc_tfidf" -> ((s, d) => Analytics.docTfidf(s, d)),
    "events_heavy_hitters" -> ((s, d) => Analytics.eventsHeavyHitters(s, d)),
    "events_histogram" -> ((s, d) => Analytics.eventsHistogram(s, d)),
    "events_interval_join" -> (Analytics.eventsIntervalJoin _),
    "orders_running_total" -> (Analytics.ordersRunningTotal _),
    "events_rank_topk" -> ((s, d) => Analytics.eventsRankTopk(s, d)),
    "events_percentiles" -> (Analytics2.eventsPercentiles _),
    "events_rolling_7d" -> (Analytics2.eventsRolling7d _),
    "events_cube" -> (Analytics2.eventsCube _),
    "orders_set_ops" -> (Analytics2.ordersSetOps _),
    "events_interarrival" -> (Analytics2.eventsInterarrival _),
    "events_approx_distinct" -> (Analytics2.eventsApproxDistinct _),
    "orders_ntile" -> (Analytics2.ordersNtile _),
    "customer_order_span" -> (Analytics2.customerOrderSpan _),
    "skew_join_salted" -> ((s, d) => Analytics2.skewJoinSalted(s, d)),
    "emb_covariance" -> ((s, d) => Analytics2.embCovariance(s, d)),
    "events_markov" -> (Analytics2.eventsMarkov _),
    "nation_balance_fullouter" -> (Analytics2.nationBalanceFullOuter _),
    "events_grouping_sets" -> (Analytics2.eventsGroupingSets _),
    "user_event_paths" -> (Analytics2.userEventPaths _),
    "events_dau_wau" -> (Analytics2.eventsDauWau _),
    "orders_mom_growth" -> (Analytics2.ordersMomGrowth _),
    "brand_affinity" -> ((s, d) => Analytics2.brandAffinity(s, d)),
    "doc_bigrams" -> ((s, d) => Analytics2.docBigrams(s, d)),
    "emb_quantize" -> (Analytics2.embQuantize _),
    "emb_pca" -> ((s, d) => Similarity.embPca(s, d)),
    "emb_project" -> ((s, d) => Similarity.embProject(s, d)),
    "knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "events_hourly" -> (Analytics2.eventsHourly _),
    "session_stats" -> (Analytics2.sessionStats _),
    "brand_revenue_share" -> (Analytics2.brandRevenueShare _),
    // MHW / time-series core (SURVEY §2 A)
    "clim_doy" -> (Mhw.climDoyTable _),
    "climatology_bp" -> (Mhw.climatologyBpRaw _),
    "climatology_bp_smooth" -> (Mhw.climatologyBpSmooth _),
    "threshold_bp" -> (Mhw.thresholdBpRaw _),
    "threshold_bp_smooth" -> (Mhw.thresholdBpSmooth _),
    "climatology_legacy" -> (Mhw.climatologyLegacy _),
    "threshold_legacy" -> (Mhw.thresholdLegacy _),
    "legacy_clim_thresh" -> (Mhw.legacyClimThreshQ _),
    "detrend" -> (Mhw.detrend _),
    "detrend_poly2" -> (Mhw.detrendPoly2 _),
    "detrend_baseline" -> (Mhw.detrendBaseline _),
    "detrend_period" -> (Mhw.detrendPeriod _),
    "severity" -> ((s, d) => Mhw.severityChain(s, d, 0.9)
      .select("user_id", "d", "t_anom", "severity")),
    "mhw_events" -> (Mhw.mhwEvents _),
    "mhw_category" -> (Mhw.mhwCategory _),
    "mhw_spatial_extent" -> (Mhw.mhwSpatialExtent _),
    "mhw_annual_stats" -> (Mhw.mhwAnnualStats _),
    "mhw_event_rates" -> (Mhw.mhwEventRates _),
    "mhw_cold_spells" -> (Mhw.mhwColdSpells _),
    "mhw_trend_significance" -> (Mhw.mhwTrendSignificance _),
    "mhw_event_rank" -> (Mhw.mhwEventRank _),
    // Event-stream relational (SURVEY §2 B16-B20)
    "ts_fill_forward" -> (TimeSeries.fillForward _),
    "ts_resample_weekly" -> (TimeSeries.resampleWeekly _),
    "ts_changepoint" -> (TimeSeries.changepoint _),
    "ts_interp_linear" -> ((s, d) => TimeSeries.interpLinear(s, d)),
    "events_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "events_session_window" -> (Events.sessionWindowNative _),
    "events_json" -> (Events.jsonStats _),
    "events_window_stats" -> (Events.windowStats _),
    "events_pivot" -> (Events.pivotTypes _),
    "asof_join" -> (Events.asofJoin _),
    "asof_join_nearest" -> (Events.asofJoinNearest _),
    "asof_join_tolerance" -> ((s, d) => Events.asofJoinTolerance(s, d)),
    "events_funnel" -> (Events.funnel _),
    "events_retention" -> (Events.retention _),
    // Text analysis + dedup (SURVEY §2 C21-C24, D25-D26)
    "text_tokens" -> (TextOps.textTokens _),
    "text_quality" -> (TextOps.textQuality _),
    "text_langid" -> (TextOps.textLangid _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_winnow_fp" -> ((s, d) => TextOps.textWinnowFp(s, d)),
    "dedup_exact" -> (TextOps.dedupExact _),
    "dedup_substring" -> ((s, d) => SubstringDedup.dedupSubstring(s, d)),
    "corpus_dedup_ladder" -> ((s, d) => SubstringDedup.corpusDedupLadder(s, d)),
    "dedup_substring_pairs" -> ((s, d) => SubstringDedup.dedupSubstringPairs(s, d)),
    "corpus_span_removal_plan" -> ((s, d) => SubstringDedup.corpusSpanRemovalPlan(s, d)),
    // Round-9 batch 2 (#302-#305)
    "graph_label_propagation" -> ((s, d) => Round9Ops2.graphLabelProp(s, d)),
    "graph_seed_distance" -> ((s, d) => Round9Ops2.graphSeedDistance(s, d)),
    "events_diff_in_diff" -> (Round9Ops2.eventsDiffInDiff _),
    "corpus_quality_classifier" -> ((s, d) => Round9Ops2.corpusQualityClassifier(s, d)),
    // Round-9 batch 3 (#306-#309)
    "ts_spectral_entropy" -> (Round9Ops3.tsSpectralEntropy _),
    "doc_keyphrase_rake" -> ((s, d) => Round9Ops3.docKeyphraseRake(s, d)),
    "corpus_classifier_sample" -> ((s, d) => Round9Ops3.corpusClassifierSample(s, d)),
    "stream_classifier_calibration" -> (graft.streaming.Streaming.streamClassifierCalibration _),
    // Round-9 batch 4 (#310-#313)
    "dq_value_psi" -> (Round9Ops4.dqValuePsi _),
    "stream_diff_in_diff" -> (graft.streaming.Streaming.streamDiffInDiff _),
    "dedup_lpa_communities" -> ((s, d) => Round9Ops4.dedupLpaCommunities(s, d)),
    "graph_modularity" -> ((s, d) => Round9Ops4.graphModularity(s, d)),
    // Round-9 batch 5 (#314-#315)
    "graph_local_bridges" -> ((s, d) => Round9Ops5.graphLocalBridges(s, d)),
    "corpus_keyphrase_index" -> ((s, d) => Round9Ops5.corpusKeyphraseIndex(s, d)),
    // Round-9 batch 6 (#316-#317)
    "stream_value_psi" -> (graft.streaming.Streaming.streamValuePsi _),
    "mhw_onset_composite" -> ((s, d) => Mhw.mhwOnsetComposite(s, d)),
    // Round-9 batch 7 (#318-#319)
    "emb_cka_halves" -> ((s, d) => Round9Ops7.embCkaHalves(s, d)),
    "ts_hurst" -> (Round9Ops7.tsHurst _),
    // Round-9 batch 8 (#320-#321)
    "events_retention_halflife" -> ((s, d) => Round9Ops8.eventsRetentionHalflife(s, d)),
    "ts_max_drawdown" -> (Round9Ops8.tsMaxDrawdown _),
    // Round-9 batch 9 (#322-#324)
    "emb_cka_matrix" -> ((s, d) => Round9Ops9.embCkaMatrix(s, d)),
    "stream_retention_halflife" -> (graft.streaming.Streaming.streamRetentionHalflife _),
    "stream_hurst" -> (graft.streaming.Streaming.streamHurst _),
    "dedup_incremental" -> (TextOps.dedupIncremental _),
    "text_repetition" -> (TextOps.textRepetition _),
    "text_contamination" -> (TextOps.textContamination _),
    "text_pii_redact" -> (TextOps.textPiiRedact _),
    "text_token_entropy" -> (TextOps.textTokenEntropy _),
    "text_passage_dedup" -> ((s, d) => TextOps.textPassageDedup(s, d)),
    "text_gopher_rules" -> (TextOps.textGopherRules _),
    "dedup_containment" -> ((s, d) => TextOps.dedupContainment(s, d)),
    "text_lm_score" -> (TextOps.textLmScore _),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.dedupNgramJaccard(s, d)),
    "corpus_curate" -> ((s, d) => TextOps.corpusCurate(s, d)),
    // MinHash/SimHash dedup (D27-D28, md5-portable hashing → oracle-checked)
    "dedup_minhash" -> ((s, d) => LshDedup.dedupMinhash(s, d)),
    "dedup_simhash" -> ((s, d) => LshDedup.dedupSimhash(s, d)),
    // Similarity search (E29-E32)
    "emb_norms" -> (Similarity.embNorms _),
    "knn_brute" -> ((s, d) => Similarity.knnBrute(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "emb_dedup_cosine" -> ((s, d) => Similarity.embDedupCosine(s, d)),
    "emb_semantic_dedup" -> ((s, d) => Similarity.embSemanticDedup(s, d)),
    "emb_outliers" -> (Similarity.embOutliers _),
    "corpus_curate_semantic" -> ((s, d) => Similarity.corpusCurateSemantic(s, d)),
    "ann_pq" -> ((s, d) => SimilarityPq.annPq(s, d)),
    // Sketches + series statistics (#72-#76)
    "events_cms" -> ((s, d) => Sketches.eventsCms(s, d)),
    "events_bloom_join" -> (Sketches.eventsBloomJoin _),
    "corpus_mix_weights" -> (Sketches.corpusMixWeights _),
    "ts_autocorr" -> (Sketches.tsAutocorr _),
    "ts_ewma" -> (TimeSeries2.tsEwma _),
    "ts_cross_corr" -> (TimeSeries2.tsCrossCorr _),
    "ts_theilsen" -> (TimeSeries2.tsTheilSen _),
    "events_anomaly_mad" -> (TimeSeries2.eventsAnomalyMad _),
    "mhw_trend_annual" -> (Mhw.mhwTrendAnnual _),
    "ts_seasonal_decompose" -> (Sketches.tsSeasonalDecompose _),
    "corpus_split" -> (Sketches.corpusSplit _),
    "events_quantile_sketch" -> (Sketches.eventsQuantileSketch _),
    "events_kmv_overlap" -> ((s, d) => Sketches.eventsKmvOverlap(s, d)),
    // Curation selection (#77-#79)
    "corpus_token_budget" -> ((s, d) => Curation.corpusTokenBudget(s, d)),
    "corpus_weighted_sample" -> ((s, d) => Curation.corpusWeightedSample(s, d)),
    "events_scd2" -> (Curation.eventsScd2 _),
    "doc_dup_inflation" -> (Curation.docDupInflation _),
    "corpus_shard_pack" -> ((s, d) => Curation.corpusShardPack(s, d)),
    // Graph + merge reconciliation (#80-#81)
    "graph_pagerank" -> ((s, d) => Graph.graphPagerank(s, d)),
    "graph_triangles" -> (Graph.graphTriangles _),
    "orders_merge_upsert" -> ((s, d) => Graph.ordersMergeUpsert(s, d)),
    // Multimodal plumbing (F33-F34)
    "mm_ingest" -> (multimodal.Multimodal.mmIngest _),
    "mm_frames" -> (multimodal.Multimodal.mmFrames _),
    "mm_features" -> (multimodal.Multimodal.mmFeatures _),
    "mm_resize" -> (multimodal.Multimodal.mmResize _),
    "mm_dedup" -> (multimodal.Multimodal.mmDedup _),
    // Structured Streaming (G35-G36)
    "stream_window_counts" -> (streaming.Streaming.streamWindowCounts _),
    "stream_sliding_counts" -> (streaming.Streaming.streamSlidingCounts _),
    "stream_topk" -> ((s, d) => streaming.Streaming.streamTopK(s, d)),
    "stream_ewma" -> (streaming.StreamingEwma.streamEwma _),
    "stream_hll" -> (streaming.Streaming.streamHll _),
    "stream_cms" -> (streaming.Streaming.streamCms _),
    "stream_bloom" -> (streaming.Streaming.streamBloom _),
    "stream_quantile" -> (streaming.Streaming.streamQuantile _),
    "stream_kmv" -> (streaming.Streaming.streamKmv _),
    "stream_sessionize" -> (streaming.Streaming.streamSessionize _),
    "stream_dedup" -> (streaming.Streaming.streamDedup _),
    "stream_click_attr" -> (streaming.Streaming.streamClickAttribution _),
    "stream_mhw_events" -> (streaming.StreamingMhw.streamMhwEvents _),
    "stream_enrich_dim" -> (streaming.Streaming.streamEnrichDim _),
    // Round-5 batch 3 (#92-#98, #11l)
    "events_rfm" -> ((s, d) => Analytics3.eventsRfm(s, d)),
    "events_lag_features" -> (Analytics3.eventsLagFeatures _),
    "doc_zipf_fit" -> (Analytics3.docZipfFit _),
    "emb_hamming_knn" -> ((s, d) => Similarity2.embHammingKnn(s, d)),
    "emb_mmr" -> ((s, d) => Similarity2.embMmr(s, d)),
    "lineitem_bucketed_join" -> ((s, d) => sources.Bucketed.lineitemBucketedJoin(s, d)),
    "mhw_event_dist" -> (Mhw.mhwEventDist _),
    // Round-5 batch 4 (#99-#101)
    "events_partitioned_prune" -> (sources.Partitioned.eventsPartitionedPrune _),
    "stream_upsert" -> (streaming.StreamingUpsert.streamUpsert _),
    "doc_fuzzy_match" -> ((s, d) => TextOps2.docFuzzyMatch(s, d)),
    "stream_dedup_watermark" -> (streaming.Streaming.streamDedupWatermark _),
    "events_minmax_pushdown" -> (sources.Partitioned.eventsMinmaxPushdown _),
    "events_backfill_overwrite" -> (sources.Partitioned.eventsBackfillOverwrite _),
    // Round-5 batch 5 (#104-#106)
    "events_welch_t" -> (Analytics3.eventsWelchT _),
    "customer_pareto" -> ((s, d) => Analytics3.customerPareto(s, d)),
    "scd2_as_of" -> ((s, d) => Curation.scd2AsOf(s, d)),
    // Round-5 batch 6 (#107-#108)
    "mm_phash_near_dup" -> ((s, d) => graft.multimodal.Multimodal.mmPhashNearDup(s, d)),
    "events_format_roundtrip" -> (sources.Formats.eventsFormatRoundtrip _),
    "orders_cohort_ltv" -> (Analytics3.ordersCohortLtv _),
    "supplier_lead_time" -> (sources.Bucketed.supplierLeadTime _),
    // Round-5 batch 8 (#11m, #111)
    "clim_incremental" -> (Mhw.climIncremental _),
    "stream_knn" -> ((s, d) => streaming.StreamingKnn.streamKnn(s, d)),
    "bpe_pair_counts" -> ((s, d) => TextOps2.bpePairCounts(s, d)),
    "emb_centroid_drift" -> (Similarity2.embCentroidDrift _),
    "doc_oov_rate" -> ((s, d) => TextOps2.docOovRate(s, d)),
    // Round-6 batch (#115-#122)
    "ts_holt" -> (Round6Ops.tsHolt _),
    "events_ks_2samp" -> (Round6Ops.eventsKs2samp _),
    "emb_matryoshka_eval" -> ((s, d) => Similarity3.embMatryoshkaEval(s, d)),
    "doc_pack_sequences" -> ((s, d) => Round6Ops.docPackSequences(s, d)),
    "knn_label_vote" -> ((s, d) => Similarity3.knnLabelVote(s, d)),
    "stream_centroid_drift" -> (streaming.StreamingDrift.streamCentroidDrift _),
    "part_price_band_join" -> (Round6Ops.partPriceBandJoin _),
    "events_type_entropy" -> (Round6Ops.eventsTypeEntropy _),
    // Round-6 batch 2 (#123-#127)
    "dedup_minhash_eval" -> ((s, d) => LshDedup.dedupMinhashEval(s, d)),
    "emb_rank_fusion" -> ((s, d) => Similarity3.embRankFusion(s, d)),
    "events_pmi" -> (Round6Ops.eventsPmi _),
    "stream_holt" -> (streaming.StreamingHolt.streamHolt _),
    "orders_backlog_aging" -> (Round6Ops.ordersBacklogAging _),
    // Round-6 batch 3 (#128-#129)
    "corpus_dedup_funnel" -> ((s, d) => Curation.corpusDedupFunnel(s, d)),
    "stream_ks" -> (streaming.StreamingKs.streamKs _),
    "mm_scene_cuts" -> ((s, d) => graft.multimodal.Multimodal.mmSceneCuts(s, d)),
    // Round-6 batch 4 (#131-#134)
    "text_ngram_novelty" -> (Round6Ops2.textNgramNovelty _),
    "corpus_quality_curve" -> (Round6Ops2.corpusQualityCurve _),
    "emb_silhouette" -> (Similarity3.embSilhouette _),
    "ts_periodogram" -> (Round6Ops2.tsPeriodogram _),
    // Round-6 batch 5 (#135-#138)
    "stream_periodogram" -> (streaming.StreamingPeriodogram.streamPeriodogram _),
    "ts_cusum_alarm" -> (Round6Ops2.tsCusumAlarm _),
    "events_ab_lift" -> (Round6Ops2.eventsAbLift _),
    "mm_audio_vad" -> ((s, d) => graft.multimodal.Multimodal.mmAudioVad(s, d)),
    // Round-6 batch 6 (#139-#142)
    "ts_forecast_backtest" -> (Round6Ops2.tsForecastBacktest _),
    "supplier_scorecard" -> (Round6Ops2.supplierScorecard _),
    "events_cuped_lift" -> (Round6Ops2.eventsCupedLift _),
    "emb_recall_curve" -> ((s, d) => Similarity3.embRecallCurve(s, d)),
    // Round-6 batch 7 (#143-#145)
    "stream_cusum" -> (streaming.StreamingCusum.streamCusum _),
    "dedup_tau_sweep" -> ((s, d) => LshDedup.dedupTauSweep(s, d)),
    "events_bot_score" -> (Round6Ops2.eventsBotScore _),
    // Round-6 batch 8 (#146-#148)
    "ann_recall_matrix" -> ((s, d) => Similarity3.annRecallMatrix(s, d)),
    "mm_keyframes" -> ((s, d) => graft.multimodal.Multimodal.mmKeyframes(s, d)),
    "dedup_cluster_stats" -> ((s, d) => Analytics.dedupClusterStats(s, d)),
    // Round-6 batch 9 (#149-#150)
    "events_power_analysis" -> (Round6Ops2.eventsPowerAnalysis _),
    "ann_nprobe_curve" -> ((s, d) => Similarity.annNprobeCurve(s, d)),
    // Round-6 batch 10 (#151-#155)
    "emb_triplet_mining" -> (Similarity3.embTripletMining _),
    "events_survival_km" -> (Round6Ops3.eventsSurvivalKm _),
    "bpe_train_merges" -> ((s, d) => TextOps2.bpeTrainMerges(s, d)),
    "bpe_encode" -> ((s, d) => BpeEncode.bpeEncode(s, d)),
    "corpus_bpe_fertility" -> ((s, d) => BpeEncode.corpusBpeFertility(s, d)),
    "corpus_token_budget_bpe" -> ((s, d) => BpeEncode.corpusTokenBudgetBpe(s, d)),
    "mm_av_sync" -> ((s, d) => graft.multimodal.Multimodal.mmAvSync(s, d)),
    // Round-6 batch 11 (#156-#158)
    "emb_kmeans_elbow" -> ((s, d) => Similarity.embKmeansElbow(s, d)),
    "corpus_length_buckets" -> (Curation.corpusLengthBuckets _),
    "graph_link_predict" -> ((s, d) => Graph.graphLinkPredict(s, d)),
    // Round-6 batch 12 (#159-#160)
    "events_markov_attribution" -> (Round6Ops3.eventsMarkovAttribution _),
    "emb_pq_distortion" -> ((s, d) => SimilarityPq.embPqDistortion(s, d)),
    // Round-6 batch 13 (#161-#164)
    "orders_benford" -> (Round6Ops4.ordersBenford _),
    "emb_anisotropy" -> (Similarity2.embAnisotropy _),
    "corpus_tokenizer_fertility" -> (TextOps2.corpusTokenizerFertility _),
    "events_brier_calibration" -> (Round6Ops4.eventsBrierCalibration _),
    // Round-6 batch 14 (#165-#168)
    "mm_integrity" -> (graft.multimodal.Multimodal.mmIntegrity _),
    "events_hod_dow_independence" -> (Round6Ops4.eventsHodDowIndependence _),
    "orders_dup_payments" -> (Round6Ops4.ordersDupPayments _),
    "stream_benford" -> (graft.streaming.Streaming.streamBenford _),
    // Round-6 batch 15 (#169-#172)
    "dedup_minhash_band_curve" -> ((s, d) => LshDedup.dedupMinhashBandCurve(s, d)),
    "emb_centroid_classifier_eval" -> (Similarity3.embCentroidClassifierEval _),
    "graph_cluster_coeff" -> ((s, d) => Graph.graphClusterCoeff(s, d)),
    "supplier_herfindahl" -> (Analytics3.supplierHerfindahl _),
    // Round-6 batch 16 (#173-#176)
    "dedup_band_cost" -> ((s, d) => LshDedup.dedupBandCost(s, d)),
    "ts_holt_winters" -> (Round6Ops.tsHoltWinters _),
    "text_readability" -> (TextOps2.textReadability _),
    "knn_exposure_bias" -> ((s, d) => Similarity3.knnExposureBias(s, d)),
    // Round-6 batch 17 (#177-#180)
    "stream_holt_winters" -> (graft.streaming.StreamingHolt.streamHoltWinters _),
    "orders_rfm_migration" -> (Round6Ops5.ordersRfmMigration _),
    "corpus_vocab_growth" -> (Round6Ops5.corpusVocabGrowth _),
    "lineitem_price_variance" -> (Round6Ops5.lineitemPriceVariance _),
    // Round-6 batch 18 (#181-#184)
    "emb_hubness" -> ((s, d) => Similarity3.embHubness(s, d)),
    "part_discount_elasticity" -> (Round6Ops5.partDiscountElasticity _),
    "events_session_paths" -> (Round6Ops5.eventsSessionPaths _),
    "text_boilerplate_share" -> (TextOps2.textBoilerplateShare _),
    // Round-6 batch 19 (#185-#187)
    "corpus_mix_temperature" -> (Round6Ops5.corpusMixTemperature _),
    "events_fraud_velocity" -> (Round6Ops5.eventsFraudVelocity _),
    "events_dormancy_reactivation" -> (Round6Ops5.eventsDormancyReactivation _),
    // Round-6 batch 20 (#188-#191)
    "text_langid_eval" -> (Round6Ops6.textLangidEval _),
    "events_markov_entropy" -> (Round6Ops6.eventsMarkovEntropy _),
    "lineitem_returns_pchart" -> (Round6Ops6.lineitemReturnsPchart _),
    "orders_seasonal_index" -> (Round6Ops6.ordersSeasonalIndex _),
    // Round-6 batch 21 (#192-#193)
    "doc_vocab_drift" -> (Round6Ops6.docVocabDrift _),
    "events_activity_gini" -> (Round6Ops6.eventsActivityGini _),
    // Round-6 batch 22 (#194-#197)
    "events_burstiness" -> (Round6Ops6.eventsBurstiness _),
    "corpus_epoch_plan" -> (Round6Ops6.corpusEpochPlan _),
    "events_conversion_lag" -> (Round6Ops6.eventsConversionLag _),
    "graph_assortativity" -> ((s, d) => Round6Ops6.graphAssortativity(s, d)),
    // Round-6 batch 23 (#198-#199)
    "emb_cluster_stability" -> ((s, d) => Similarity.embClusterStability(s, d)),
    "doc_feature_corr" -> (Round6Ops6.docFeatureCorr _),
    // Round-6 batch 24 (#200-#203)
    "dq_profile" -> (Round6Ops7.dqProfile _),
    "dq_referential" -> (Round6Ops7.dqReferential _),
    "ts_mann_kendall" -> (Round6Ops7.tsMannKendall _),
    "emb_mmd" -> ((s, d) => Round6Ops7.embMmd(s, d)),
    // Round-6 batch 25 (#204-#207)
    "orders_reconcile" -> (Round6Ops8.ordersReconcile _),
    "events_anova" -> (Round6Ops8.eventsAnova _),
    "events_mwu" -> ((s, d) => Round6Ops8.eventsMwu(s, d)),
    "ts_ljung_box" -> (Round6Ops8.tsLjungBox _),
    // Round-6 batch 26 (#208-#211)
    "text_watermark" -> (Round6Ops9.textWatermark _),
    "corpus_source_overlap" -> ((s, d) => Round6Ops9.corpusSourceOverlap(s, d)),
    "emb_effective_rank" -> (Round6Ops9.embEffectiveRank _),
    "doc_ttr" -> (Round6Ops9.docTtr _),
    // Round-6 batch 27 (#212-#216)
    "events_ams_f2" -> (Round6Ops10.eventsAmsF2 _),
    "stream_ams_f2" -> (streaming.Streaming.streamAmsF2 _),
    "events_bottomk_sample" -> (Round6Ops10.eventsBottomkSample _),
    "stream_sample" -> (streaming.Streaming.streamSample _),
    "graph_kcore" -> (Round6Ops10.graphKcore _),
    // Round-6 batch 28 (#217-#220)
    "ts_adf" -> (Round6Ops11.tsAdf _),
    "events_sprt" -> (Round6Ops11.eventsSprt _),
    "mm_modality_balance" -> (Round6Ops11.mmModalityBalance _),
    "dq_volume_anomaly" -> (Round6Ops11.dqVolumeAnomaly _),
    // Round-6 batch 29 (#221-#224)
    "doc_template_detect" -> (Round6Ops12.docTemplateDetect _),
    "text_garbage_score" -> (Round6Ops12.textGarbageScore _),
    "events_attribution_position" -> (Round6Ops12.eventsAttributionPosition _),
    "text_code_detect" -> (Round6Ops12.textCodeDetect _),
    // Round-6 batch 30 (#225-#228)
    "ts_granger" -> (Round6Ops13.tsGranger _),
    "doc_chunk_passages" -> (Round6Ops13.docChunkPassages _),
    "events_ab_srm" -> (Round6Ops13.eventsAbSrm _),
    "stream_volume_anomaly" -> (streaming.Streaming.streamVolumeAnomaly _),
    // Round-6 batch 31 (#229-#232)
    "dq_profile_drift" -> (Round6Ops14.dqProfileDrift _),
    "ts_changepoint_multi" -> (Round6Ops14.tsChangepointMulti _),
    "doc_instruction_detect" -> (Round6Ops14.docInstructionDetect _),
    "ann_shard_plan" -> ((s, d) => Round6Ops14.annShardPlan(s, d)),
    // Round-6 batch 32 (#233-#236)
    "lineitem_price_index" -> (Round6Ops15.lineitemPriceIndex _),
    "dq_rule_check" -> (Round6Ops15.dqRuleCheck _),
    "ts_seasonal_anomaly" -> (Round6Ops15.tsSeasonalAnomaly _),
    "events_topk_drift" -> (Round6Ops15.eventsTopkDrift _),
    // Round-6 batch 33 (#237-#241)
    "revenue_tail_hill" -> (Round6Ops16.revenueTailHill _),
    "stream_doc_quality" -> (streaming.Streaming.streamDocQuality _),
    "dq_event_rules" -> (Round6Ops16.dqEventRules _),
    "stream_rule_check" -> (streaming.Streaming.streamRuleCheck _),
    "events_load_heatmap" -> (Round6Ops16.eventsLoadHeatmap _),
    // Round-6 batch 34 (#242-#245)
    "dq_embedding_coverage" -> (Round6Ops17.dqEmbeddingCoverage _),
    "doc_collocations" -> (Round6Ops17.docCollocations _),
    "events_markov_eval" -> (Round6Ops17.eventsMarkovEval _),
    "dq_event_dupes" -> (Round6Ops17.dqEventDupes _),
    // Round-6 batch 35 (#246-#249)
    "stream_load_heatmap" -> (streaming.Streaming.streamLoadHeatmap _),
    "orders_revenue_bridge" -> (Round6Ops18.ordersRevenueBridge _),
    "emb_cluster_nmi" -> (Round6Ops18.embClusterNmi _),
    "dq_vector_dupes" -> (Round6Ops18.dqVectorDupes _),
    // Round-6 batch 36 (#250-#253)
    "events_markov_hitting_time" -> (Round6Ops19.eventsMarkovHittingTime _),
    "dq_clock_skew" -> (Round6Ops19.dqClockSkew _),
    "supplier_single_source" -> (Round6Ops19.supplierSingleSource _),
    "text_vocab_coverage" -> (Round6Ops19.textVocabCoverage _),
    // Round-6 batch 37 (#254-#257)
    "mm_resolution_audit" -> (Round6Ops20.mmResolutionAudit _),
    "events_rhythm_profile" -> (Round6Ops20.eventsRhythmProfile _),
    "dq_value_granularity" -> (Round6Ops20.dqValueGranularity _),
    "events_session_depth_conversion" ->
      (Round6Ops20.eventsSessionDepthConversion _),
    // Round-6 batch 38 (#258-#260)
    "doc_lang_mix" -> (Round6Ops21.docLangMix _),
    "stream_lang_mix" -> (streaming.Streaming.streamLangMix _),
    "stream_mix_weights" -> (streaming.Streaming.streamMixWeights _),
    // Round-6 batch 39 (#261-#263)
    "events_slo_burn" -> (Round6Ops22.eventsSloBurn _),
    "events_growth_accounting" -> (Round6Ops22.eventsGrowthAccounting _),
    "events_value_drift_ks" -> (Round6Ops22.eventsValueDriftKs _),
    // Round-6 batch 40 (#264-#265)
    "corpus_semantic_contamination" ->
      ((s, d) => Round6Ops23.corpusSemanticContamination(s, d)),
    "stream_slo_burn" -> (streaming.Streaming.streamSloBurn _),
    // Round-6 batch 41 (#266-#267)
    "corpus_disposition" -> (Round6Ops24.corpusDisposition _),
    "user_feature_vector" -> (Round6Ops24.userFeatureVector _),
    // Round-6 batch 42 (#268-#269)
    "ts_rolling_corr" -> (Round6Ops25.tsRollingCorr _),
    "events_lifecycle_activity" -> (Round6Ops25.eventsLifecycleActivity _),
    // Round-6 batch 43 (#270-#271)
    "dedup_method_agreement" -> (Round6Ops26.dedupMethodAgreement _),
    "events_icc" -> (Round6Ops26.eventsIcc _),
    // Round-6 batch 44 (#272-#273)
    "stream_icc" -> (streaming.Streaming.streamIcc _),
    "text_script_mix" -> (Round6Ops27.textScriptMix _),
    // Round-6 batch 45 (#274-#275)
    "text_char_entropy" -> (Round6Ops28.textCharEntropy _),
    "events_activity_streaks" -> (Round6Ops28.eventsActivityStreaks _),
    // Round-6 batch 46 (#276)
    "stream_script_mix" -> (streaming.Streaming.streamScriptMix _),
    // Round-6 batch 47 (#277-#278)
    "events_aa_calibration" -> (Round6Ops29.eventsAaCalibration _),
    "events_adoption_curve" -> (Round6Ops29.eventsAdoptionCurve _),
    // Round-6 batch 48 (#279); drains #278's registers
    "stream_adoption" -> (streaming.Streaming.streamAdoption _),
    // Round-8 batch 1 (#280-#281): the documents-feed curation gate and
    // garbage screen live, via the registers/finalize contract
    "stream_disposition" -> (streaming.Streaming.streamDisposition _),
    "stream_garbage_mix" -> (streaming.Streaming.streamGarbageMix _),
    // Round-8 batch 2 (#282-#283): incremental near-dup probe and the
    // live token-budget decision
    "dedup_minhash_incremental" ->
      ((s, d) => LshDedup.dedupMinhashIncremental(s, d)),
    "stream_token_budget" -> ((s, d) => streaming.Streaming.streamTokenBudget(s, d)),
    "stream_token_budget_bpe" -> ((s, d) => streaming.Streaming.streamTokenBudgetBpe(s, d)),
    // Round-8 batch 3 (#284-#285): JSON-schema drift, at rest and live
    "dq_schema_drift" -> (Round8Ops.dqSchemaDrift _),
    "stream_schema_drift" -> (streaming.Streaming.streamSchemaDrift _),
    // Round-8 batch 4 (#286-#287): duplication-aware sampling weights
    // and the IVF index-maintenance drift readout
    "corpus_dedup_weight" -> ((s, d) => Analytics.corpusDedupWeight(s, d)),
    "emb_ivf_incremental" -> ((s, d) => Similarity.embIvfIncremental(s, d)),
    // Round-8 batch 5 (#288-#289): PII incidence audit, at rest and live
    "corpus_pii_audit" -> (Round8Ops.corpusPiiAudit _),
    "stream_pii_mix" -> (streaming.Streaming.streamPiiMix _),
    // Round-8 batch 6 (#290): GDPR erasure on the partitioned copy
    "events_erase_user" -> (sources.Partitioned.eventsEraseUser _),
    // Round-8 batch 7 (#291): Z-order locality, measured relationally
    "lineitem_zorder_locality" -> ((s, d) => Round8Ops.lineitemZorderLocality(s, d)),
    // Round-8 batch 8 (#292): internal train/val split leakage
    "corpus_split_leakage" -> ((s, d) => Round8Ops.corpusSplitLeakage(s, d)),
    // Round-8 batch 9 (#293): small-file compaction (the OPTIMIZE move)
    "events_compact_partitions" -> ((s, d) => sources.Partitioned.eventsCompactPartitions(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> Relational.q1Sql,
    "q3_shipping" -> Relational.q3Sql,
    "q5_local" -> Relational.q5Sql,
    "q6_forecast" -> Relational.q6Sql,
    "q10_returns" -> Relational.q10Sql,
    "q18_large_orders" -> Relational.q18Sql,
    "q4_priority" -> Relational2.q4Sql,
    "q7_volume" -> Relational2.q7Sql,
    "q12_priority" -> Relational2.q12Sql,
    "q13_custdist" -> Relational2.q13Sql,
    "q14_promo" -> Relational2.q14Sql,
    "q15_top_supplier" -> Relational2.q15Sql,
    "q17_small_qty" -> Relational2.q17Sql,
    "q19_discounted" -> Relational2.q19Sql,
    "q22_no_orders" -> Relational2.q22Sql,
    "q2_min_cost" -> Relational3.q2Sql,
    "q8_market_share" -> Relational3.q8Sql,
    "q9_profit" -> Relational3.q9Sql,
    "q11_important_parts" -> Relational3.q11Sql,
    "q16_supplier_counts" -> Relational3.q16Sql,
    "q20_promo_suppliers" -> Relational3.q20Sql,
    "q21_waiting_suppliers" -> Relational3.q21Sql,
    "events_rollup" -> Analytics.eventsRollupSql,
    "events_salted_agg" -> Analytics.eventsSaltedAggSql,
    "events_anomaly" -> Analytics.eventsAnomalySql,
    "sample_stratified" -> Analytics.sampleStratifiedSql,
    "emb_centroids" -> Analytics.embCentroidsSql,
    "dedup_clusters" -> Analytics.dedupClustersSql(),
    "doc_tfidf" -> Analytics.docTfidfSql,
    "events_heavy_hitters" -> Analytics.eventsHeavyHittersSql,
    "events_histogram" -> Analytics.eventsHistogramSql,
    "events_interval_join" -> Analytics.eventsIntervalJoinSql,
    "orders_running_total" -> Analytics.ordersRunningTotalSql,
    "events_rank_topk" -> Analytics.eventsRankTopkSql,
    "events_percentiles" -> Analytics2.eventsPercentilesSql,
    "events_rolling_7d" -> Analytics2.eventsRolling7dSql,
    "events_cube" -> Analytics2.eventsCubeSql,
    "orders_set_ops" -> Analytics2.ordersSetOpsSql,
    "events_interarrival" -> Analytics2.eventsInterarrivalSql,
    "events_approx_distinct" -> Analytics2.eventsApproxDistinctSql,
    "orders_ntile" -> Analytics2.ordersNtileSql,
    "customer_order_span" -> Analytics2.customerOrderSpanSql,
    "skew_join_salted" -> Analytics2.skewJoinSaltedSql,
    "emb_covariance" -> Analytics2.embCovarianceSql,
    "events_markov" -> Analytics2.eventsMarkovSql,
    "nation_balance_fullouter" -> Analytics2.nationBalanceFullOuterSql,
    "events_grouping_sets" -> Analytics2.eventsGroupingSetsSql,
    "user_event_paths" -> Analytics2.userEventPathsSql,
    "events_dau_wau" -> Analytics2.eventsDauWauSql,
    "orders_mom_growth" -> Analytics2.ordersMomGrowthSql,
    "brand_affinity" -> Analytics2.brandAffinitySql,
    "doc_bigrams" -> Analytics2.docBigramsSql,
    "emb_quantize" -> Analytics2.embQuantizeSql,
    "emb_pca" -> Similarity.embPcaSql(),
    "emb_project" -> Similarity.embProjectSql(),
    "knn_graph" -> Similarity.knnGraphSql(),
    "events_hourly" -> Analytics2.eventsHourlySql,
    "session_stats" -> Analytics2.sessionStatsSql,
    "brand_revenue_share" -> Analytics2.brandRevenueShareSql,
    "clim_doy" -> MhwSql.climDoySqlQ,
    "climatology_bp" -> MhwSql.climatologyBp,
    "climatology_bp_smooth" -> MhwSql.climatologyBpSmooth,
    "threshold_bp" -> MhwSql.thresholdBp,
    "threshold_bp_smooth" -> MhwSql.thresholdBpSmooth,
    "climatology_legacy" -> MhwSql.climatologyLegacy,
    "threshold_legacy" -> MhwSql.thresholdLegacy,
    "legacy_clim_thresh" -> MhwSql.legacyClimThresh,
    "detrend" -> MhwSql.detrend,
    "detrend_poly2" -> MhwSql.detrendPoly2,
    "detrend_baseline" -> MhwSql.detrendBaseline,
    "detrend_period" -> MhwSql.detrendPeriod,
    "severity" -> MhwSql.severity,
    "mhw_events" -> MhwSql.mhwEvents,
    "mhw_category" -> MhwSql.mhwCategory,
    "mhw_spatial_extent" -> MhwSql.mhwSpatialExtent,
    "mhw_annual_stats" -> MhwSql.mhwAnnualStats,
    "mhw_event_rates" -> MhwSql.mhwEventRates,
    "mhw_cold_spells" -> MhwSql.mhwColdSpells,
    "mhw_trend_significance" -> MhwSql.mhwTrendSignificance,
    "mhw_event_rank" -> MhwSql.mhwEventRank,
    "ts_fill_forward" -> TimeSeries.fillForwardSql,
    "ts_resample_weekly" -> TimeSeries.resampleWeeklySql,
    "ts_changepoint" -> TimeSeries.changepointSql,
    "ts_interp_linear" -> TimeSeries.interpLinearSql(),
    "events_sessionize" -> Events.sessionizeSql,
    "events_session_window" -> Events.sessionWindowNativeSql,
    "events_json" -> Events.jsonStatsSql,
    "events_window_stats" -> Events.windowStatsSql,
    "events_pivot" -> Events.pivotTypesSql,
    "asof_join" -> Events.asofJoinSql,
    "asof_join_nearest" -> Events.asofJoinNearestSql,
    "asof_join_tolerance" -> Events.asofJoinToleranceSql(),
    "events_funnel" -> Events.funnelSql,
    "events_retention" -> Events.retentionSql,
    "text_tokens" -> TextOps.textTokensSql,
    "text_quality" -> TextOps.textQualitySql,
    "text_langid" -> TextOps.textLangidSql,
    "text_fingerprint" -> TextOps.textFingerprintSql,
    "text_winnow_fp" -> TextOps.textWinnowFpSql,
    "dedup_exact" -> TextOps.dedupExactSql,
    "dedup_substring" -> SubstringDedup.dedupSubstringSql(),
    "corpus_dedup_ladder" -> SubstringDedup.corpusDedupLadderSql(),
    "dedup_substring_pairs" -> SubstringDedup.dedupSubstringPairsSql(),
    "corpus_span_removal_plan" -> SubstringDedup.corpusSpanRemovalPlanSql(),
    // Round-9 batch 2 (#302-#305)
    "graph_label_propagation" -> Round9Ops2.graphLabelPropSql(),
    "graph_seed_distance" -> Round9Ops2.graphSeedDistanceSql(),
    "events_diff_in_diff" -> Round9Ops2.eventsDiffInDiffSql,
    "corpus_quality_classifier" -> Round9Ops2.corpusQualityClassifierSql(),
    // Round-9 batch 3 (#306-#309)
    "ts_spectral_entropy" -> Round9Ops3.tsSpectralEntropySql,
    "doc_keyphrase_rake" -> Round9Ops3.docKeyphraseRakeSql(),
    "corpus_classifier_sample" -> Round9Ops3.corpusClassifierSampleSql(),
    "stream_classifier_calibration" -> Round9Ops3.streamClassifierCalibrationSql(),
    // Round-9 batch 4 (#310-#313)
    "dq_value_psi" -> Round9Ops4.dqValuePsiSql,
    "stream_diff_in_diff" -> Round9Ops2.eventsDiffInDiffSql,
    "dedup_lpa_communities" -> Round9Ops4.dedupLpaCommunitiesSql(),
    "graph_modularity" -> Round9Ops4.graphModularitySql(),
    // Round-9 batch 5 (#314-#315)
    "graph_local_bridges" -> Round9Ops5.graphLocalBridgesSql(),
    "corpus_keyphrase_index" -> Round9Ops5.corpusKeyphraseIndexSql(),
    // Round-9 batch 6 (#316-#317)
    "stream_value_psi" -> Round9Ops4.dqValuePsiSql,
    "mhw_onset_composite" -> MhwSql.mhwOnsetComposite(),
    // Round-9 batch 7 (#318-#319)
    "emb_cka_halves" -> Round9Ops7.embCkaHalvesSql(),
    "ts_hurst" -> Round9Ops7.tsHurstSql,
    // Round-9 batch 8 (#320-#321)
    "events_retention_halflife" -> Round9Ops8.eventsRetentionHalflifeSql(),
    "ts_max_drawdown" -> Round9Ops8.tsMaxDrawdownSql,
    // Round-9 batch 9 (#322-#324)
    "emb_cka_matrix" -> Round9Ops9.embCkaMatrixSql(),
    "stream_retention_halflife" -> Round9Ops8.eventsRetentionHalflifeSql(),
    "stream_hurst" -> Round9Ops7.tsHurstSql,
    "dedup_incremental" -> TextOps.dedupIncrementalSql,
    "text_repetition" -> TextOps.textRepetitionSql,
    "text_contamination" -> TextOps.textContaminationSql,
    "text_pii_redact" -> TextOps.textPiiRedactSql,
    "text_token_entropy" -> TextOps.textTokenEntropySql,
    "text_passage_dedup" -> TextOps.textPassageDedupSql,
    "text_gopher_rules" -> TextOps.textGopherRulesSql,
    "dedup_containment" -> TextOps.dedupContainmentSql,
    "text_lm_score" -> TextOps.textLmScoreSql,
    "dedup_ngram_jaccard" -> TextOps.dedupNgramJaccardSql,
    "corpus_curate" -> TextOps.corpusCurateSql,
    "dedup_minhash" -> LshDedup.dedupMinhashSql(),
    "dedup_simhash" -> LshDedup.dedupSimhashSql(),
    "emb_norms" -> Similarity.embNormsSql,
    "knn_brute" -> Similarity.knnBruteSql(),
    "ann_lsh" -> Similarity.annLshSql(),
    "ann_ivf" -> Similarity.annIvfSql(),
    "emb_dedup_cosine" -> Similarity.embDedupCosineSql(),
    "emb_semantic_dedup" -> Similarity.embSemanticDedupSql(),
    "emb_outliers" -> Similarity.embOutliersSql,
    "corpus_curate_semantic" -> Similarity.corpusCurateSemanticSql(),
    "ann_pq" -> SimilarityPq.annPqSql(),
    "events_cms" -> Sketches.eventsCmsSql,
    "events_bloom_join" -> Sketches.eventsBloomJoinSql,
    "corpus_mix_weights" -> Sketches.corpusMixWeightsSql,
    "ts_autocorr" -> Sketches.tsAutocorrSql,
    "ts_ewma" -> TimeSeries2.tsEwmaSql,
    "ts_cross_corr" -> TimeSeries2.tsCrossCorrSql,
    "ts_theilsen" -> TimeSeries2.tsTheilSenSql(),
    "events_anomaly_mad" -> TimeSeries2.eventsAnomalyMadSql,
    "mhw_trend_annual" -> MhwSql.mhwTrendAnnual,
    "ts_seasonal_decompose" -> Sketches.tsSeasonalDecomposeSql,
    "corpus_split" -> Sketches.corpusSplitSql,
    "events_quantile_sketch" -> Sketches.eventsQuantileSketchSql,
    "events_kmv_overlap" -> Sketches.eventsKmvOverlapSql(),
    "corpus_token_budget" -> Curation.corpusTokenBudgetSql(),
    "corpus_weighted_sample" -> Curation.corpusWeightedSampleSql(),
    "events_scd2" -> Curation.eventsScd2Sql,
    "doc_dup_inflation" -> Curation.docDupInflationSql,
    "corpus_shard_pack" -> Curation.corpusShardPackSql(),
    "graph_pagerank" -> Graph.graphPagerankSql(),
    "graph_triangles" -> Graph.graphTrianglesSql,
    "orders_merge_upsert" -> Graph.ordersMergeUpsertSql(),
    "mm_ingest" -> multimodal.Multimodal.mmIngestSql,
    "mm_frames" -> multimodal.Multimodal.mmFramesSql,
    "mm_features" -> multimodal.Multimodal.mmFeaturesSql,
    "mm_resize" -> multimodal.Multimodal.mmResizeSql,
    "mm_dedup" -> multimodal.Multimodal.mmDedupSql,
    "stream_window_counts" -> streaming.Streaming.streamWindowCountsSql,
    "stream_sliding_counts" -> streaming.Streaming.streamSlidingCountsSql,
    "stream_topk" -> streaming.Streaming.streamTopKSql,
    // stream parity is exact: the stream fold replays the batch window
    // expression bit-for-bit, so the batch oracle checks the stream
    "stream_ewma" -> TimeSeries2.tsEwmaSql,
    // same estimator, streamed: registers are the state, so the batch
    // oracle checks the streaming sketch bit-for-bit
    "stream_hll" -> operators.Analytics2.eventsApproxDistinctSql,
    "stream_cms" -> operators.Sketches.eventsCmsSql,
    // streamed bloom registers are bit-identical to the batch build
    "stream_bloom" -> operators.Sketches.eventsBloomJoinSql,
    // streamed histogram registers are bit-identical to the batch sketch
    "stream_quantile" -> operators.Sketches.eventsQuantileSketchSql,
    // streamed k-min sketches are bit-identical to the batch build
    "stream_kmv" -> operators.Sketches.eventsKmvOverlapSql(),
    "stream_sessionize" -> streaming.Streaming.streamSessionizeSql,
    "stream_dedup" -> streaming.Streaming.streamDedupSql,
    "stream_click_attr" -> streaming.Streaming.streamClickAttributionSql,
    "stream_mhw_events" -> streaming.StreamingMhw.streamMhwEventsSql,
    "stream_enrich_dim" -> streaming.Streaming.streamEnrichDimSql,
    // Round-5 batch 3 (#92-#98, #11l)
    "events_rfm" -> Analytics3.eventsRfmSql,
    "events_lag_features" -> Analytics3.eventsLagFeaturesSql,
    "doc_zipf_fit" -> Analytics3.docZipfFitSql,
    "emb_hamming_knn" -> Similarity2.embHammingKnnSql(),
    "emb_mmr" -> Similarity2.embMmrSql(),
    "lineitem_bucketed_join" -> sources.Bucketed.lineitemBucketedJoinSql,
    "mhw_event_dist" -> MhwSql.mhwEventDist,
    // Round-5 batch 4 (#99-#101)
    "events_partitioned_prune" -> sources.Partitioned.eventsPartitionedPruneSql,
    "stream_upsert" -> streaming.StreamingUpsert.streamUpsertSql,
    "doc_fuzzy_match" -> TextOps2.docFuzzyMatchSql(),
    "stream_dedup_watermark" -> streaming.Streaming.streamDedupWatermarkSql,
    "events_minmax_pushdown" -> sources.Partitioned.eventsMinmaxPushdownSql,
    "events_backfill_overwrite" -> sources.Partitioned.eventsBackfillOverwriteSql,
    // Round-5 batch 5 (#104-#106)
    "events_welch_t" -> Analytics3.eventsWelchTSql,
    "customer_pareto" -> Analytics3.customerParetoSql,
    "scd2_as_of" -> Curation.scd2AsOfSql(),
    // Round-5 batch 6 (#107-#108)
    "mm_phash_near_dup" -> graft.multimodal.Multimodal.mmPhashNearDupSql(),
    "events_format_roundtrip" -> sources.Formats.eventsFormatRoundtripSql,
    "orders_cohort_ltv" -> Analytics3.ordersCohortLtvSql,
    "supplier_lead_time" -> sources.Bucketed.supplierLeadTimeSql,
    // Round-5 batch 8 (#11m, #111)
    "clim_incremental" -> MhwSql.climIncremental,
    "stream_knn" -> streaming.StreamingKnn.streamKnnSql,
    "bpe_pair_counts" -> TextOps2.bpePairCountsSql(),
    "emb_centroid_drift" -> Similarity2.embCentroidDriftSql,
    "doc_oov_rate" -> TextOps2.docOovRateSql(),
    // Round-6 batch (#115-#122)
    "ts_holt" -> Round6Ops.tsHoltSql,
    "events_ks_2samp" -> Round6Ops.eventsKs2sampSql,
    "emb_matryoshka_eval" -> Similarity3.embMatryoshkaEvalSql(),
    "doc_pack_sequences" -> Round6Ops.docPackSequencesSql,
    "knn_label_vote" -> Similarity3.knnLabelVoteSql(),
    "stream_centroid_drift" -> streaming.StreamingDrift.streamCentroidDriftSql,
    "part_price_band_join" -> Round6Ops.partPriceBandJoinSql,
    "events_type_entropy" -> Round6Ops.eventsTypeEntropySql,
    // Round-6 batch 2 (#123-#127)
    "dedup_minhash_eval" -> LshDedup.dedupMinhashEvalSql(),
    "emb_rank_fusion" -> Similarity3.embRankFusionSql(),
    "events_pmi" -> Round6Ops.eventsPmiSql,
    "stream_holt" -> streaming.StreamingHolt.streamHoltSql,
    "orders_backlog_aging" -> Round6Ops.ordersBacklogAgingSql,
    // Round-6 batch 3 (#128-#129)
    "corpus_dedup_funnel" -> Curation.corpusDedupFunnelSql(),
    "stream_ks" -> streaming.StreamingKs.streamKsSql,
    "mm_scene_cuts" -> graft.multimodal.Multimodal.mmSceneCutsSql(),
    // Round-6 batch 4 (#131-#134)
    "text_ngram_novelty" -> Round6Ops2.textNgramNoveltySql,
    "corpus_quality_curve" -> Round6Ops2.corpusQualityCurveSql,
    "emb_silhouette" -> Similarity3.embSilhouetteSql,
    "ts_periodogram" -> Round6Ops2.tsPeriodogramSql,
    // Round-6 batch 5 (#135-#138)
    "stream_periodogram" -> streaming.StreamingPeriodogram.streamPeriodogramSql,
    "ts_cusum_alarm" -> Round6Ops2.tsCusumAlarmSql,
    "events_ab_lift" -> Round6Ops2.eventsAbLiftSql,
    "mm_audio_vad" -> graft.multimodal.Multimodal.mmAudioVadSql(),
    // Round-6 batch 6 (#139-#142)
    "ts_forecast_backtest" -> Round6Ops2.tsForecastBacktestSql,
    "supplier_scorecard" -> Round6Ops2.supplierScorecardSql,
    "events_cuped_lift" -> Round6Ops2.eventsCupedLiftSql,
    "emb_recall_curve" -> Similarity3.embRecallCurveSql(),
    // Round-6 batch 7 (#143-#145)
    "stream_cusum" -> streaming.StreamingCusum.streamCusumSql,
    "dedup_tau_sweep" -> LshDedup.dedupTauSweepSql(),
    "events_bot_score" -> Round6Ops2.eventsBotScoreSql,
    // Round-6 batch 8 (#146-#148)
    "ann_recall_matrix" -> Similarity3.annRecallMatrixSql(),
    "mm_keyframes" -> graft.multimodal.Multimodal.mmKeyframesSql(),
    "dedup_cluster_stats" -> Analytics.dedupClusterStatsSql(),
    // Round-6 batch 9 (#149-#150)
    "events_power_analysis" -> Round6Ops2.eventsPowerAnalysisSql,
    "ann_nprobe_curve" -> Similarity.annNprobeCurveSql(),
    // Round-6 batch 10 (#151-#155)
    "emb_triplet_mining" -> Similarity3.embTripletMiningSql(),
    "events_survival_km" -> Round6Ops3.eventsSurvivalKmSql,
    "bpe_train_merges" -> TextOps2.bpeTrainMergesSql(),
    "bpe_encode" -> BpeEncode.bpeEncodeSql(),
    "corpus_bpe_fertility" -> BpeEncode.corpusBpeFertilitySql(),
    "corpus_token_budget_bpe" -> BpeEncode.corpusTokenBudgetBpeSql(),
    "mm_av_sync" -> graft.multimodal.Multimodal.mmAvSyncSql(),
    // Round-6 batch 11 (#156-#158)
    "emb_kmeans_elbow" -> Similarity.embKmeansElbowSql(),
    "corpus_length_buckets" -> Curation.corpusLengthBucketsSql,
    "graph_link_predict" -> Graph.graphLinkPredictSql(),
    // Round-6 batch 12 (#159-#160)
    "events_markov_attribution" -> Round6Ops3.eventsMarkovAttributionSql,
    "emb_pq_distortion" -> SimilarityPq.embPqDistortionSql(),
    // Round-6 batch 13 (#161-#164)
    "orders_benford" -> Round6Ops4.ordersBenfordSql,
    "emb_anisotropy" -> Similarity2.embAnisotropySql,
    "corpus_tokenizer_fertility" -> TextOps2.corpusTokenizerFertilitySql,
    "events_brier_calibration" -> Round6Ops4.eventsBrierCalibrationSql,
    // Round-6 batch 14 (#165-#168)
    "mm_integrity" -> graft.multimodal.Multimodal.mmIntegritySql,
    "events_hod_dow_independence" -> Round6Ops4.eventsHodDowIndependenceSql,
    "orders_dup_payments" -> Round6Ops4.ordersDupPaymentsSql,
    "stream_benford" -> graft.streaming.Streaming.streamBenfordSql,
    // Round-6 batch 15 (#169-#172)
    "dedup_minhash_band_curve" -> LshDedup.dedupMinhashBandCurveSql(),
    "emb_centroid_classifier_eval" -> Similarity3.embCentroidClassifierEvalSql,
    "graph_cluster_coeff" -> Graph.graphClusterCoeffSql(),
    "supplier_herfindahl" -> Analytics3.supplierHerfindahlSql,
    // Round-6 batch 16 (#173-#176)
    "dedup_band_cost" -> LshDedup.dedupBandCostSql(),
    "ts_holt_winters" -> Round6Ops.tsHoltWintersSql,
    "text_readability" -> TextOps2.textReadabilitySql,
    "knn_exposure_bias" -> Similarity3.knnExposureBiasSql(),
    // Round-6 batch 17 (#177-#180)
    "stream_holt_winters" -> graft.streaming.StreamingHolt.streamHoltWintersSql,
    "orders_rfm_migration" -> Round6Ops5.ordersRfmMigrationSql,
    "corpus_vocab_growth" -> Round6Ops5.corpusVocabGrowthSql,
    "lineitem_price_variance" -> Round6Ops5.lineitemPriceVarianceSql,
    // Round-6 batch 18 (#181-#184)
    "emb_hubness" -> Similarity3.embHubnessSql(),
    "part_discount_elasticity" -> Round6Ops5.partDiscountElasticitySql,
    "events_session_paths" -> Round6Ops5.eventsSessionPathsSql,
    "text_boilerplate_share" -> TextOps2.textBoilerplateShareSql,
    // Round-6 batch 19 (#185-#187)
    "corpus_mix_temperature" -> Round6Ops5.corpusMixTemperatureSql,
    "events_fraud_velocity" -> Round6Ops5.eventsFraudVelocitySql,
    "events_dormancy_reactivation" -> Round6Ops5.eventsDormancyReactivationSql,
    // Round-6 batch 20 (#188-#191)
    "text_langid_eval" -> Round6Ops6.textLangidEvalSql,
    "events_markov_entropy" -> Round6Ops6.eventsMarkovEntropySql,
    "lineitem_returns_pchart" -> Round6Ops6.lineitemReturnsPchartSql,
    "orders_seasonal_index" -> Round6Ops6.ordersSeasonalIndexSql,
    // Round-6 batch 21 (#192-#193)
    "doc_vocab_drift" -> Round6Ops6.docVocabDriftSql,
    "events_activity_gini" -> Round6Ops6.eventsActivityGiniSql,
    // Round-6 batch 22 (#194-#197)
    "events_burstiness" -> Round6Ops6.eventsBurstinessSql,
    "corpus_epoch_plan" -> Round6Ops6.corpusEpochPlanSql,
    "events_conversion_lag" -> Round6Ops6.eventsConversionLagSql,
    "graph_assortativity" -> Round6Ops6.graphAssortativitySql(),
    // Round-6 batch 23 (#198-#199)
    "emb_cluster_stability" -> Similarity.embClusterStabilitySql(),
    "doc_feature_corr" -> Round6Ops6.docFeatureCorrSql,
    // Round-6 batch 24 (#200-#203)
    "dq_profile" -> Round6Ops7.dqProfileSql,
    "dq_referential" -> Round6Ops7.dqReferentialSql,
    "ts_mann_kendall" -> Round6Ops7.tsMannKendallSql(),
    "emb_mmd" -> Round6Ops7.embMmdSql(),
    // Round-6 batch 25 (#204-#207)
    "orders_reconcile" -> Round6Ops8.ordersReconcileSql,
    "events_anova" -> Round6Ops8.eventsAnovaSql,
    "events_mwu" -> Round6Ops8.eventsMwuSql(),
    "ts_ljung_box" -> Round6Ops8.tsLjungBoxSql,
    // Round-6 batch 26 (#208-#211)
    "text_watermark" -> Round6Ops9.textWatermarkSql,
    "corpus_source_overlap" -> Round6Ops9.corpusSourceOverlapSql(),
    "emb_effective_rank" -> Round6Ops9.embEffectiveRankSql(),
    "doc_ttr" -> Round6Ops9.docTtrSql,
    // Round-6 batch 27 (#212-#216); the stream variants drain the same
    // registers, so they share the batch oracles
    "events_ams_f2" -> Round6Ops10.eventsAmsF2Sql,
    "stream_ams_f2" -> Round6Ops10.eventsAmsF2Sql,
    "events_bottomk_sample" -> Round6Ops10.eventsBottomkSampleSql,
    "stream_sample" -> Round6Ops10.eventsBottomkSampleSql,
    "graph_kcore" -> Round6Ops10.graphKcoreSql(),
    // Round-6 batch 28 (#217-#220)
    "ts_adf" -> Round6Ops11.tsAdfSql,
    "events_sprt" -> Round6Ops11.eventsSprtSql,
    "mm_modality_balance" -> Round6Ops11.mmModalityBalanceSql,
    "dq_volume_anomaly" -> Round6Ops11.dqVolumeAnomalySql,
    // Round-6 batch 29 (#221-#224)
    "doc_template_detect" -> Round6Ops12.docTemplateDetectSql,
    "text_garbage_score" -> Round6Ops12.textGarbageScoreSql,
    "events_attribution_position" -> Round6Ops12.eventsAttributionPositionSql,
    "text_code_detect" -> Round6Ops12.textCodeDetectSql,
    // Round-6 batch 30 (#225-#228); the stream variant drains #220's
    // registers, so it shares the batch oracle
    "ts_granger" -> Round6Ops13.tsGrangerSql,
    "doc_chunk_passages" -> Round6Ops13.docChunkPassagesSql,
    "events_ab_srm" -> Round6Ops13.eventsAbSrmSql,
    "stream_volume_anomaly" -> Round6Ops11.dqVolumeAnomalySql,
    // Round-6 batch 31 (#229-#232)
    "dq_profile_drift" -> Round6Ops14.dqProfileDriftSql,
    "ts_changepoint_multi" -> Round6Ops14.tsChangepointMultiSql,
    "doc_instruction_detect" -> Round6Ops14.docInstructionDetectSql,
    "ann_shard_plan" -> Round6Ops14.annShardPlanSql(),
    // Round-6 batch 32 (#233-#236)
    "lineitem_price_index" -> Round6Ops15.lineitemPriceIndexSql,
    "dq_rule_check" -> Round6Ops15.dqRuleCheckSql,
    "ts_seasonal_anomaly" -> Round6Ops15.tsSeasonalAnomalySql,
    "events_topk_drift" -> Round6Ops15.eventsTopkDriftSql,
    // Round-6 batch 33 (#237-#241); stream_rule_check drains #239's
    // registers and shares its oracle
    "revenue_tail_hill" -> Round6Ops16.revenueTailHillSql(),
    "stream_doc_quality" -> TextOps.docQualityBySourceSql,
    "dq_event_rules" -> Round6Ops16.dqEventRulesSql,
    "stream_rule_check" -> Round6Ops16.dqEventRulesSql,
    "events_load_heatmap" -> Round6Ops16.eventsLoadHeatmapSql,
    // Round-6 batch 34 (#242-#245)
    "dq_embedding_coverage" -> Round6Ops17.dqEmbeddingCoverageSql,
    "doc_collocations" -> Round6Ops17.docCollocationsSql,
    "events_markov_eval" -> Round6Ops17.eventsMarkovEvalSql,
    "dq_event_dupes" -> Round6Ops17.dqEventDupesSql,
    // Round-6 batch 35 (#246-#249); stream_load_heatmap drains #241's
    // registers and shares its oracle
    "stream_load_heatmap" -> Round6Ops16.eventsLoadHeatmapSql,
    "orders_revenue_bridge" -> Round6Ops18.ordersRevenueBridgeSql,
    "emb_cluster_nmi" -> Round6Ops18.embClusterNmiSql(),
    "dq_vector_dupes" -> Round6Ops18.dqVectorDupesSql,
    // Round-6 batch 36 (#250-#253)
    "events_markov_hitting_time" -> Round6Ops19.eventsMarkovHittingTimeSql,
    "dq_clock_skew" -> Round6Ops19.dqClockSkewSql,
    "supplier_single_source" -> Round6Ops19.supplierSingleSourceSql,
    "text_vocab_coverage" -> Round6Ops19.textVocabCoverageSql,
    // Round-6 batch 37 (#254-#257)
    "mm_resolution_audit" -> Round6Ops20.mmResolutionAuditSql,
    "events_rhythm_profile" -> Round6Ops20.eventsRhythmProfileSql,
    "dq_value_granularity" -> Round6Ops20.dqValueGranularitySql,
    "events_session_depth_conversion" ->
      Round6Ops20.eventsSessionDepthConversionSql,
    // Round-6 batch 38 (#258-#260); the stream twins drain #258/#74
    // registers and share those oracles
    "doc_lang_mix" -> Round6Ops21.docLangMixSql,
    "stream_lang_mix" -> Round6Ops21.docLangMixSql,
    "stream_mix_weights" -> Sketches.corpusMixWeightsSql,
    // Round-6 batch 39 (#261-#263)
    "events_slo_burn" -> Round6Ops22.eventsSloBurnSql,
    "events_growth_accounting" -> Round6Ops22.eventsGrowthAccountingSql,
    "events_value_drift_ks" -> Round6Ops22.eventsValueDriftKsSql,
    // Round-6 batch 40 (#264-#265); stream_slo_burn drains #261's
    // registers and shares its oracle
    "corpus_semantic_contamination" ->
      Round6Ops23.corpusSemanticContaminationSql(),
    "stream_slo_burn" -> Round6Ops22.eventsSloBurnSql,
    // Round-6 batch 41 (#266-#267)
    "corpus_disposition" -> Round6Ops24.corpusDispositionSql,
    "user_feature_vector" -> Round6Ops24.userFeatureVectorSql(
      Round6Ops.eventsTypeEntropySql, Round6Ops20.eventsRhythmProfileSql),
    // Round-6 batch 42 (#268-#269)
    "ts_rolling_corr" -> Round6Ops25.tsRollingCorrSql,
    "events_lifecycle_activity" -> Round6Ops25.eventsLifecycleActivitySql,
    // Round-6 batch 43 (#270-#271)
    "dedup_method_agreement" -> Round6Ops26.dedupMethodAgreementSql,
    "events_icc" -> Round6Ops26.eventsIccSql,
    // Round-6 batch 44 (#272-#273); stream_icc drains #271's registers
    "stream_icc" -> Round6Ops26.eventsIccSql,
    "text_script_mix" -> Round6Ops27.textScriptMixSql,
    // Round-6 batch 45 (#274-#275)
    "text_char_entropy" -> Round6Ops28.textCharEntropySql,
    "events_activity_streaks" -> Round6Ops28.eventsActivityStreaksSql,
    // Round-6 batch 46 (#276); drains #273's registers
    "stream_script_mix" -> Round6Ops27.textScriptMixSql,
    // Round-6 batch 47 (#277-#278)
    "events_aa_calibration" -> Round6Ops29.eventsAaCalibrationSql,
    "events_adoption_curve" -> Round6Ops29.eventsAdoptionCurveSql,
    // Round-6 batch 48 (#279)
    "stream_adoption" -> Round6Ops29.eventsAdoptionCurveSql,
    // Round-8 batch 1 (#280-#281): #280 shares #266's oracle; #281's is
    // the per-source rollup of the shared #222 score fragment
    "stream_disposition" -> Round6Ops24.corpusDispositionSql,
    "stream_garbage_mix" -> Round6Ops12.garbageMixSql,
    // Round-8 batch 2 (#282-#283)
    "dedup_minhash_incremental" -> LshDedup.dedupMinhashIncrementalSql(),
    "stream_token_budget" -> Curation.streamTokenBudgetSql(),
    "stream_token_budget_bpe" -> BpeEncode.corpusTokenBudgetBpeSql(),
    // Round-8 batch 3 (#284-#285): #285 shares #284's oracle
    "dq_schema_drift" -> Round8Ops.dqSchemaDriftSql,
    "stream_schema_drift" -> Round8Ops.dqSchemaDriftSql,
    // Round-8 batch 4 (#286-#287)
    "corpus_dedup_weight" -> Analytics.corpusDedupWeightSql(),
    "emb_ivf_incremental" -> Similarity.embIvfIncrementalSql(),
    // Round-8 batch 5 (#288-#289): #289 shares #288's oracle
    "corpus_pii_audit" -> Round8Ops.corpusPiiAuditSql,
    "stream_pii_mix" -> Round8Ops.corpusPiiAuditSql,
    // Round-8 batch 6 (#290)
    "events_erase_user" -> sources.Partitioned.eventsEraseUserSql,
    // Round-8 batch 7 (#291)
    "lineitem_zorder_locality" -> Round8Ops.lineitemZorderLocalitySql(),
    // Round-8 batch 8 (#292)
    "corpus_split_leakage" -> Round8Ops.corpusSplitLeakageSql(),
    // Round-8 batch 9 (#293)
    "events_compact_partitions" -> sources.Partitioned.eventsCompactPartitionsSql,
  )
}
