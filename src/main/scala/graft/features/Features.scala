package graft.features

import org.apache.spark.sql.DataFrame

/** Full 49-feature pipeline, composed exactly like the reference's
  * `compute_all_features` (src/features/engineering.py:198-226):
  * technical → momentum → volatility → temporal. Every stage appends columns
  * over the same per-symbol window partitioning, so the composed plan still
  * carries a single hash exchange on `symbol`.
  */
object Features {
  def computeAllFeatures(df: DataFrame): DataFrame = {
    val t = Technical.withTechnical(df)
    val m = Momentum.withMomentum(t)
    val v = Volatility.withVolatility(m)
    Temporal.withTemporal(v)
  }

  /** The 49 feature column names, mirroring the reference's exclusion rule
    * (src/ml/training.py:39-41: everything except OHLCV/datetime/target). */
  val FeatureCols: Seq[String] =
    Seq("rsi", "macd", "macd_signal", "macd_histogram",
      "bb_middle", "bb_upper", "bb_lower", "bb_width") ++
    graft.Params.MomentumPeriods.flatMap(p =>
      Seq(s"return_$p", s"momentum_$p", s"roc_$p", s"sma_$p", s"distance_sma_$p")) ++
    Seq("returns") ++
    graft.Params.VolatilityWindows.flatMap(n =>
      Seq(s"volatility_$n", s"realized_vol_$n", s"hl_range_$n")) ++
    Seq("hour", "minute", "day_of_week", "day", "month",
      "hour_sin", "hour_cos", "day_of_week_sin", "day_of_week_cos",
      "month_sin", "month_cos")
}
