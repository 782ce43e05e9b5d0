package graft.features

import graft.Params
import graft.expr.Ewma.ewmaSpanOver
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Technical indicators: RSI, MACD, Bollinger Bands
  * (reference: src/features/engineering.py:7-70).
  *
  * RSI uses EWMA with `adjust=false` (engineering.py:42-43), MACD EMAs use
  * Polars' default `adjust=true` (engineering.py:49-52); both run through the
  * custom Catalyst window expression [[graft.expr.Ewma]].
  *
  * Three window stages are required by data dependencies (not a perf bug):
  *   1. `delta = diff(close)` (lag) → gain/loss;
  *   2. EWMA of gain/loss/close (inputs must be materialized columns — window
  *      functions cannot nest);
  *   3. `macd_signal = EWMA(macd)` — an EWMA *of a derived series*
  *      (engineering.py:52), forcing the second pass the reference also does.
  * All three stages share one `hashpartitioning(symbol)` exchange; Spark
  * plans them as consecutive WindowExecs over the same sort order.
  */
object Technical {

  def withTechnical(
      df: DataFrame,
      rsiPeriod: Int = Params.RsiPeriod,
      macdFast: Int = Params.MacdFast,
      macdSlow: Int = Params.MacdSlow,
      macdSignal: Int = Params.MacdSignal,
      bbPeriod: Int = Params.BbPeriod,
      bbStd: Double = Params.BbStd): DataFrame = {
    val w = Frames.bySymbol
    val close = col("close")

    // Stage 1: diff → gain/loss. `(delta > 0).cast * delta` keeps the leading
    // null (null > 0 → null → null * null = null), exactly like Polars
    // (engineering.py:38-40).
    val delta = close - lag(close, 1).over(w)
    val s1 = df.select(col("*"),
      ((delta > 0).cast("double") * delta).as("_gain"),
      ((delta < 0).cast("double") * (-delta)).as("_loss"))

    // Stage 2: Bollinger (finite-window, shared with the incremental
    // backfill path) + EWMAs, same window partitioning.
    val s1b = withBollinger(s1, bbPeriod, bbStd)
    val part = Seq(col(Frames.SymbolCol))
    val ord = Seq(col(Frames.TimeCol), col(Frames.TieCol))
    def ewm(c: org.apache.spark.sql.Column, span: Double, adjust: Boolean) =
      ewmaSpanOver(c, span, adjust, part, ord)
    val s2 = s1b.select(col("*"),
      ewm(col("_gain"), rsiPeriod, adjust = false).as("_avg_gain"),
      ewm(col("_loss"), rsiPeriod, adjust = false).as("_avg_loss"),
      (ewm(close, macdFast, adjust = true) -
        ewm(close, macdSlow, adjust = true)).as("macd"))

    // Stage 3: RSI arithmetic + the second-pass signal EWMA over `macd`.
    val rs = col("_avg_gain") / (col("_avg_loss") + 1e-10)
    val sig = ewm(col("macd"), macdSignal, adjust = true)
    s2.select(col("*"),
        (lit(100) - lit(100) / (lit(1) + rs)).as("rsi"),
        sig.as("macd_signal"),
        (col("macd") - sig).as("macd_histogram"))
      .drop("_gain", "_loss", "_avg_gain", "_avg_loss")
  }

  /** Bollinger bands alone (finite-window: rolling mean/std over bbPeriod
    * closes via the O(n) cum-lag identity) — the standalone form the
    * incremental backfill path composes ([[Incremental]]); [[withTechnical]]
    * calls it with the identical expression trees, so both paths stay
    * bit-equal to the oracle. */
  def withBollinger(df: DataFrame,
      bbPeriod: Int = Params.BbPeriod,
      bbStd: Double = Params.BbStd): DataFrame = {
    val close = col("close")
    val s1c = Frames.withCums(df, Map("_c_bc" -> close, "_c_bc2" -> (close * close)))
    val bbGate = Frames.cumCountGate("_c_bc", bbPeriod)
    val bbS1 = Frames.cumRolling("_c_bc", bbPeriod)
    val bbS2 = Frames.cumRolling("_c_bc2", bbPeriod)
    val bbMid = when(bbGate, bbS1 / bbPeriod)
    val bbSd = when(bbGate,
      sqrt(greatest((bbS2 - bbS1 * bbS1 / bbPeriod) / (bbPeriod - 1), lit(0.0))))
    s1c.select(col("*"),
        bbMid.as("bb_middle"),
        (bbMid + bbSd * bbStd).as("bb_upper"),
        (bbMid - bbSd * bbStd).as("bb_lower"),
        try_divide((bbMid + bbSd * bbStd) - (bbMid - bbSd * bbStd), bbMid).as("bb_width"))
      .drop(Frames.cumHelperCols(Seq("_c_bc", "_c_bc2")): _*)
  }
}
