package graft.features

import graft.Params
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental backfill of the finite-window feature families.
  *
  * When a day of bars lands on a 100 TB feature table, recomputing the
  * whole history per symbol is the difference between "process a day" and
  * "process the archive". Every feature with a bounded window — momentum,
  * volatility, Bollinger, calendar — only reaches [[FiniteLookback]] rows
  * back, so the backfill reads the per-symbol history TAIL plus the new
  * rows, computes on that context, and keeps the new rows' features — at
  * O(new + symbols·lookback) cost. Equality with the full recompute is
  * exact in math and ulp-level in fp: the cum−lag rolling sums accumulate
  * from a different origin, so the window differences agree to relative
  * ~1e-12, not bit-for-bit (PropSpec pins this contract at 1e-9 relative
  * on random splits; null gates and lag-based features match exactly).
  *
  * The EWMA families (RSI, MACD) are deliberately excluded: adjust=false/
  * true EWMAs carry unbounded memory, so their incremental form is the
  * stateful streaming path ([[graft.streaming.Streams.streamingRsi]]),
  * which carries exact recurrence state across batches instead of
  * truncating it.
  */
object Incremental {

  /** Rows of history a new row's finite-window features can reach:
    * volatility windows aggregate `returns`, and each return needs its
    * previous close, so the deepest reach is max(V)+1 raw rows (the +1
    * also keeps the tail's first row — whose incremental `returns` is null
    * for lack of a predecessor — strictly OUTSIDE every new row's window);
    * momentum lags raw closes up to max(P); Bollinger spans BbPeriod. */
  val FiniteLookback: Int =
    (Params.VolatilityWindows.max + 1)
      .max(Params.MomentumPeriods.max)
      .max(Params.BbPeriod)

  /** The finite-window feature columns [[finiteFeatures]] emits. */
  val FiniteFeatureCols: Seq[String] =
    Params.MomentumPeriods.flatMap(p => Seq(
      s"return_$p", s"momentum_$p", s"roc_$p", s"sma_$p", s"distance_sma_$p")) ++
    ("returns" +: Params.VolatilityWindows.flatMap(n => Seq(
      s"volatility_$n", s"realized_vol_$n", s"hl_range_$n"))) ++
    Seq("bb_middle", "bb_upper", "bb_lower", "bb_width") ++
    Seq("hour", "minute", "day_of_week", "day", "month",
      "hour_sin", "hour_cos", "day_of_week_sin", "day_of_week_cos",
      "month_sin", "month_cos")

  /** All finite-window families composed (momentum → volatility →
    * Bollinger → temporal) — the per-family operators share one
    * hashpartitioning(symbol) exchange. */
  def finiteFeatures(df: DataFrame): DataFrame =
    Temporal.withTemporal(
      Technical.withBollinger(
        Volatility.withVolatility(
          Momentum.withMomentum(df))))

  /** Compute finite-window features for `newBars` only, reading just the
    * per-symbol lookback tail of `history`. Contract: per symbol, every
    * new bar is strictly later than all history bars (append-only — the
    * same assumption the reference's cache update makes). Symbols with
    * history shorter than the lookback keep ALL their history, so the
    * min_samples null gates match the full recompute exactly. */
  def backfillFinite(history: DataFrame, newBars: DataFrame,
      lookback: Int = FiniteLookback): DataFrame = {
    val w = Window.partitionBy(Frames.SymbolCol)
      .orderBy(col(Frames.TimeCol).desc, col(Frames.TieCol).desc)
    val tail = history
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= lookback)
      .drop("_rn")
    val ctx = tail.withColumn("_is_new", lit(false))
      .unionByName(newBars.withColumn("_is_new", lit(true)))
    finiteFeatures(ctx).filter(col("_is_new")).drop("_is_new")
  }
}
