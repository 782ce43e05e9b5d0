package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Price-action features over the canonical OHLCV bars: VWAP (cumulative
  * session and rolling) and peak-drawdown — the standard microstructure
  * signals a market-data feature store carries next to the reference's
  * momentum/volatility blocks (reference feature family:
  * src/features/engineering.py; these extend it the same per-symbol
  * windowed way).
  *
  * Scale shape: everything runs over the shared [[Frames.bySymbol]] spec —
  * ONE `hashpartitioning(symbol)` exchange + one partition-local sort, like
  * the rest of the 49-feature pipeline. Rolling VWAP uses the O(n) cum−lag
  * identity ([[Frames.withCums]] / [[Frames.cumRolling]]); running peak /
  * max-drawdown are order-insensitive extrema (bit-portable to the oracle
  * with a plain windowed MAX/MIN, unlike sliding sums).
  */
object Market {

  val VwapWindow = 20

  /** Cumulative + rolling volume-weighted average price.
    *
    *   typical  = (high + low + close) / 3
    *   vwap_cum = cumsum(typical·volume) / cumsum(volume)
    *   vwap_N   = rollsum(typical·volume, N) / rollsum(volume, N)
    *              (gated on N observed rows, Polars min_samples semantics)
    *   vwap_distance = (close − vwap_N) / vwap_N · 100
    *
    * Running sums accumulate strictly left-to-right in row order, which the
    * oracle reproduces with `list_sum(list(...) OVER ...)` — the same
    * bit-portability argument as the volatility cums. */
  def withVwap(df: DataFrame, n: Int = VwapWindow): DataFrame = {
    val typical = (col("high") + col("low") + col("close")) / 3.0
    val stage1 = df.select(col("*"), (typical * col("volume")).as("_pv"))
    val stage2 = Frames.withCums(stage1, Map(
      "_c_pv" -> col("_pv"),
      "_c_v" -> col("volume")))
    val gate = Frames.cumCountGate("_c_pv", n)
    val rollPv = Frames.cumRolling("_c_pv", n)
    val rollV = Frames.cumRolling("_c_v", n)
    val vwapN = when(gate, rollPv / rollV)
    stage2.select(col("*"),
        (col("_c_pv") / col("_c_v")).as("vwap_cum"),
        vwapN.as(s"vwap_$n"),
        ((col("close") - vwapN) / vwapN * 100).as("vwap_distance"))
      .drop(Frames.cumHelperCols(Seq("_c_pv", "_c_v")): _*)
      .drop("_pv")
  }

  /** Running peak close, drawdown from peak, and worst (max) drawdown so
    * far — per symbol, time-ordered:
    *
    *   peak         = max(close) over rows so far
    *   drawdown     = (close − peak) / peak        (≤ 0)
    *   max_drawdown = min(drawdown) over rows so far
    *
    * Both window aggregates are extrema — order-insensitive, so the oracle's
    * engine-native windowed MAX/MIN reproduce them bit-exactly with no
    * sequential-fold machinery. Two chained window passes share one
    * exchange + sort (same [[Frames.bySymbol]] spec). */
  def withDrawdown(df: DataFrame): DataFrame = {
    val running = Frames.bySymbol
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val stage1 = df.select(col("*"),
      max(col("close")).over(running).as("peak"))
    stage1.select(col("*"),
        ((col("close") - col("peak")) / col("peak")).as("drawdown"))
      .select(col("*"),
        min(col("drawdown")).over(running).as("max_drawdown"))
  }
}
