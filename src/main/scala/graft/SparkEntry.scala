package graft

import graft.oracle.{OracleSql, TextSimSql}
import graft.queries.{Analytics, Core, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
  *
  * Every operator from SURVEY.md §2 registers here as a named query; each
  * carries a DuckDB oracle statement in [[oracleSql]] built to be
  * bit-identical (see graft.oracle.*), including the EWMA family (oracle
  * replays the exact recurrence via recursive CTEs) and the stubbed media
  * decode (oracle replays the decoder's byte-fold arithmetic with
  * list_reduce). The only rows-only query is topk_importance — tree
  * training is not oracle-reproducible; MlSpec covers its invariants.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * 49-feature frame + classification target (the reference's Phase 2+3,
    * src/main.py:63-128). */
  def entry(spark: SparkSession): DataFrame =
    graft.features.Targets.withTarget(
      graft.features.Features.computeAllFeatures(
        graft.source.Bars.bars(spark, "/root/testdata/sf0.001")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_bars" -> (Core.ingestBars _),
    "ingest_bars_csv" -> (Core.ingestBarsCsv _),
    "bars_resample" -> (Core.barsResample _),
    "topk_importance" -> (Core.topkImportance _),
    "feat_momentum" -> (Core.featMomentum _),
    "feat_volatility" -> (Core.featVolatility _),
    "feat_temporal" -> (Core.featTemporal _),
    "feat_bollinger" -> (Core.featBollinger _),
    "feat_rsi" -> (Core.featRsi _),
    "feat_macd" -> (Core.featMacd _),
    "targets_classification" -> (Core.targetsClassification _),
    "targets_regression" -> (Core.targetsRegression _),
    "temporal_split" -> (Core.temporalSplit _),
    "union_symbols" -> (Core.unionSymbols _),
    "value_counts" -> (Core.valueCounts _),
    "agg_stats" -> (Core.aggStats _),
    "topk_events" -> (Core.topkEvents _),
    "ml_matrix" -> (Core.mlMatrix _),
    "join_star" -> (Analytics.joinStar _),
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_shipping" -> (Analytics.q3Shipping _),
    "join_asof" -> (Analytics.joinAsof _),
    "window_tumbling" -> (Analytics.windowTumbling _),
    "window_sliding" -> (Analytics.windowSliding _),
    "sessionize" -> (Analytics.sessionize _),
    "window_rank" -> (Analytics.windowRank _),
    "window_firstlast" -> (Analytics.windowFirstLast _),
    "agg_rollup" -> (Analytics.aggRollup _),
    "agg_quantiles" -> (Analytics.aggQuantiles _),
    "sample_bernoulli" -> (Analytics.sampleBernoulli _),
    "sample_stratified" -> (Analytics.sampleStratified _),
    "agg_histogram" -> ((s, dir) => Analytics.aggHistogram(s, dir)),
    "agg_corr" -> (Analytics.aggCorr _),
    "text_source_stats" -> (TextSim.textSourceStats _),
    "agg_distinct" -> (Analytics.aggDistinct _),
    "set_ops" -> (Analytics.setOps _),
    "json_fields" -> (Analytics.jsonFields _),
    "join_anti" -> (Analytics.joinAnti _),
    "join_semi" -> (Analytics.joinSemi _),
    "join_outer" -> (Analytics.joinOuter _),
    "join_range" -> (Analytics.joinRange _),
    "pivot_events" -> (Analytics.pivotEvents _),
    "unpivot_events" -> (Analytics.unpivotEvents _),
    "cv_folds" -> ((s, dir) => Analytics.cvFolds(s, dir)),
    "sim_quantize" -> (TextSim.simQuantize _),
    "text_stats" -> (TextSim.textStats _),
    "text_langid" -> (TextSim.textLangid _),
    "text_fingerprint" -> (TextSim.textFingerprint _),
    "text_tfidf" -> (TextSim.textTfidf _),
    "sim_label_centroids" -> (TextSim.simLabelCentroids _),
    "dedup_exact" -> (TextSim.dedupExact _),
    "dedup_minhash" -> (TextSim.dedupMinhash _),
    "dedup_minhash_pairs" -> (TextSim.dedupMinhashPairs _),
    "dedup_simhash" -> (TextSim.dedupSimhash _),
    "dedup_simhash_pairs" -> (TextSim.dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (TextSim.dedupNgramJaccard _),
    "sim_topk" -> (TextSim.simTopk _),
    "sim_ann_ivf" -> (TextSim.simAnnIvf _),
    "sim_neardup" -> (TextSim.simNeardup _),
    "multimodal_meta" -> (TextSim.multimodalMeta _),
    "multimodal_decode" -> (TextSim.multimodalDecode _),
    "multimodal_frames" -> (TextSim.multimodalFrames _),
    "dedup_clusters" -> (TextSim.dedupClusters _),
    "curate_docs" -> ((s, dir) => TextSim.curateDocs(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "ingest_bars" -> OracleSql.ingestBars,
    "ingest_bars_csv" -> OracleSql.ingestBars,
    "bars_resample" -> OracleSql.barsResample,
    "feat_momentum" -> OracleSql.featMomentum,
    "feat_volatility" -> OracleSql.featVolatility,
    "feat_temporal" -> OracleSql.featTemporal,
    "feat_bollinger" -> OracleSql.featBollinger,
    "feat_rsi" -> OracleSql.featRsi,
    "feat_macd" -> OracleSql.featMacd,
    "targets_classification" -> OracleSql.targetsClassification,
    "targets_regression" -> OracleSql.targetsRegression,
    "temporal_split" -> OracleSql.temporalSplit,
    "union_symbols" -> OracleSql.unionSymbols,
    "value_counts" -> OracleSql.valueCounts,
    "agg_stats" -> OracleSql.aggStats,
    "topk_events" -> OracleSql.topkEvents,
    "ml_matrix" -> OracleSql.mlMatrix,
    "join_star" -> OracleSql.joinStar,
    "q1_pricing" -> OracleSql.q1Pricing,
    "q3_shipping" -> OracleSql.q3Shipping,
    "join_asof" -> OracleSql.joinAsof,
    "window_tumbling" -> OracleSql.windowTumbling,
    "window_sliding" -> OracleSql.windowSliding,
    "sessionize" -> OracleSql.sessionize,
    "window_rank" -> OracleSql.windowRank,
    "window_firstlast" -> OracleSql.windowFirstLast,
    "agg_rollup" -> OracleSql.aggRollup,
    "agg_quantiles" -> OracleSql.aggQuantiles,
    "sample_bernoulli" -> OracleSql.sampleBernoulli,
    "sample_stratified" -> OracleSql.sampleStratified,
    "agg_histogram" -> OracleSql.aggHistogram,
    "agg_corr" -> OracleSql.aggCorr,
    "text_source_stats" -> TextSimSql.textSourceStats,
    "agg_distinct" -> OracleSql.aggDistinct,
    "set_ops" -> OracleSql.setOps,
    "json_fields" -> OracleSql.jsonFields,
    "join_anti" -> OracleSql.joinAnti,
    "join_semi" -> OracleSql.joinSemi,
    "join_outer" -> OracleSql.joinOuter,
    "join_range" -> OracleSql.joinRange,
    "pivot_events" -> OracleSql.pivotEvents,
    "unpivot_events" -> OracleSql.unpivotEvents,
    "cv_folds" -> OracleSql.cvFolds,
    "sim_quantize" -> TextSimSql.simQuantize,
    "text_stats" -> TextSimSql.textStats,
    "text_langid" -> TextSimSql.textLangid,
    "text_fingerprint" -> TextSimSql.textFingerprint,
    "text_tfidf" -> TextSimSql.textTfidf,
    "sim_label_centroids" -> TextSimSql.simLabelCentroids,
    "dedup_exact" -> TextSimSql.dedupExact,
    "dedup_minhash" -> TextSimSql.dedupMinhash,
    "dedup_minhash_pairs" -> TextSimSql.dedupMinhashPairs,
    "dedup_simhash" -> TextSimSql.dedupSimhash,
    "dedup_simhash_pairs" -> TextSimSql.dedupSimhashPairs,
    "dedup_ngram_jaccard" -> TextSimSql.dedupNgramJaccard,
    "sim_topk" -> TextSimSql.simTopk,
    "sim_ann_ivf" -> TextSimSql.simAnnIvf,
    "sim_neardup" -> TextSimSql.simNeardup,
    "multimodal_meta" -> TextSimSql.multimodalMeta,
    "multimodal_decode" -> TextSimSql.multimodalDecode,
    "multimodal_frames" -> TextSimSql.multimodalFrames,
    "dedup_clusters" -> TextSimSql.dedupClusters,
    "curate_docs" -> TextSimSql.curateDocs,
  )
}
