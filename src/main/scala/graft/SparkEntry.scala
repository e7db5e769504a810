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
    // Warehouse/pipeline analytics (SURVEY §2 H)
    "events_rollup" -> (Analytics.eventsRollup _),
    "events_salted_agg" -> ((s, d) => Analytics.eventsSaltedAgg(s, d)),
    "events_anomaly" -> ((s, d) => Analytics.eventsAnomaly(s, d)),
    "sample_stratified" -> (Analytics.sampleStratified _),
    "emb_centroids" -> (Analytics.embCentroids _),
    "dedup_clusters" -> ((s, d) => Analytics.dedupClusters(s, d)),
    // MHW / time-series core (SURVEY §2 A)
    "clim_doy" -> (Mhw.climDoyTable _),
    "climatology_bp" -> (Mhw.climatologyBpRaw _),
    "climatology_bp_smooth" -> (Mhw.climatologyBpSmooth _),
    "threshold_bp" -> (Mhw.thresholdBpRaw _),
    "threshold_bp_smooth" -> (Mhw.thresholdBpSmooth _),
    "climatology_legacy" -> (Mhw.climatologyLegacy _),
    "threshold_legacy" -> (Mhw.thresholdLegacy _),
    "detrend" -> (Mhw.detrend _),
    "severity" -> ((s, d) => Mhw.severityChain(s, d, 0.9)),
    "mhw_events" -> (Mhw.mhwEvents _),
    "mhw_category" -> (Mhw.mhwCategory _),
    // Event-stream relational (SURVEY §2 B16-B20)
    "ts_fill_forward" -> (TimeSeries.fillForward _),
    "ts_resample_weekly" -> (TimeSeries.resampleWeekly _),
    "events_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "events_json" -> (Events.jsonStats _),
    "events_window_stats" -> (Events.windowStats _),
    "events_pivot" -> (Events.pivotTypes _),
    "asof_join" -> (Events.asofJoin _),
    "events_funnel" -> (Events.funnel _),
    "events_retention" -> (Events.retention _),
    // Text analysis + dedup (SURVEY §2 C21-C24, D25-D26)
    "text_tokens" -> (TextOps.textTokens _),
    "text_quality" -> (TextOps.textQuality _),
    "text_langid" -> (TextOps.textLangid _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_winnow_fp" -> ((s, d) => TextOps.textWinnowFp(s, d)),
    "dedup_exact" -> (TextOps.dedupExact _),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.dedupNgramJaccard(s, d)),
    // MinHash/SimHash dedup (D27-D28, md5-portable hashing → oracle-checked)
    "dedup_minhash" -> ((s, d) => LshDedup.dedupMinhash(s, d)),
    "dedup_simhash" -> ((s, d) => LshDedup.dedupSimhash(s, d)),
    // Similarity search (E29-E32)
    "emb_norms" -> (Similarity.embNorms _),
    "knn_brute" -> ((s, d) => Similarity.knnBrute(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "emb_dedup_cosine" -> ((s, d) => Similarity.embDedupCosine(s, d)),
    // Multimodal plumbing (F33-F34)
    "mm_ingest" -> (multimodal.Multimodal.mmIngest _),
    "mm_frames" -> (multimodal.Multimodal.mmFrames _),
    "mm_features" -> (multimodal.Multimodal.mmFeatures _),
    "mm_resize" -> (multimodal.Multimodal.mmResize _),
    // Structured Streaming (G35-G36)
    "stream_window_counts" -> (streaming.Streaming.streamWindowCounts _),
    "stream_sessionize" -> (streaming.Streaming.streamSessionize _),
    "stream_dedup" -> (streaming.Streaming.streamDedup _),
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
    "events_rollup" -> Analytics.eventsRollupSql,
    "events_salted_agg" -> Analytics.eventsSaltedAggSql,
    "events_anomaly" -> Analytics.eventsAnomalySql,
    "sample_stratified" -> Analytics.sampleStratifiedSql,
    "emb_centroids" -> Analytics.embCentroidsSql,
    "dedup_clusters" -> Analytics.dedupClustersSql(),
    "clim_doy" -> MhwSql.climDoySqlQ,
    "climatology_bp" -> MhwSql.climatologyBp,
    "climatology_bp_smooth" -> MhwSql.climatologyBpSmooth,
    "threshold_bp" -> MhwSql.thresholdBp,
    "threshold_bp_smooth" -> MhwSql.thresholdBpSmooth,
    "climatology_legacy" -> MhwSql.climatologyLegacy,
    "threshold_legacy" -> MhwSql.thresholdLegacy,
    "detrend" -> MhwSql.detrend,
    "severity" -> MhwSql.severity,
    "mhw_events" -> MhwSql.mhwEvents,
    "mhw_category" -> MhwSql.mhwCategory,
    "ts_fill_forward" -> TimeSeries.fillForwardSql,
    "ts_resample_weekly" -> TimeSeries.resampleWeeklySql,
    "events_sessionize" -> Events.sessionizeSql,
    "events_json" -> Events.jsonStatsSql,
    "events_window_stats" -> Events.windowStatsSql,
    "events_pivot" -> Events.pivotTypesSql,
    "asof_join" -> Events.asofJoinSql,
    "events_funnel" -> Events.funnelSql,
    "events_retention" -> Events.retentionSql,
    "text_tokens" -> TextOps.textTokensSql,
    "text_quality" -> TextOps.textQualitySql,
    "text_langid" -> TextOps.textLangidSql,
    "text_fingerprint" -> TextOps.textFingerprintSql,
    "text_winnow_fp" -> TextOps.textWinnowFpSql,
    "dedup_exact" -> TextOps.dedupExactSql,
    "dedup_ngram_jaccard" -> TextOps.dedupNgramJaccardSql,
    "dedup_minhash" -> LshDedup.dedupMinhashSql(),
    "dedup_simhash" -> LshDedup.dedupSimhashSql(),
    "emb_norms" -> Similarity.embNormsSql,
    "knn_brute" -> Similarity.knnBruteSql,
    "ann_lsh" -> Similarity.annLshSql(),
    "ann_ivf" -> Similarity.annIvfSql(),
    "emb_dedup_cosine" -> Similarity.embDedupCosineSql,
    "mm_ingest" -> multimodal.Multimodal.mmIngestSql,
    "mm_frames" -> multimodal.Multimodal.mmFramesSql,
    "mm_features" -> multimodal.Multimodal.mmFeaturesSql,
    "mm_resize" -> multimodal.Multimodal.mmResizeSql,
    "stream_window_counts" -> streaming.Streaming.streamWindowCountsSql,
    "stream_sessionize" -> streaming.Streaming.streamSessionizeSql,
    "stream_dedup" -> streaming.Streaming.streamDedupSql,
  )
}
