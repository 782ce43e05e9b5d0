package graft.features

import graft.Params
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volatility features: pct-change returns, rolling std-dev volatility,
  * realized volatility (sum of squared returns), rolling high-low range
  * (reference: src/features/engineering.py:120-157). 1 + 3 × 3 features.
  *
  * `returns` has NO epsilon in its denominator — the reference's
  * `pct_change()` divides by the raw lag (engineering.py:139), unlike the
  * epsilon-guarded momentum returns. Replicated as-is (Spark non-ANSI and
  * DuckDB both yield null on a zero denominator).
  */
object Volatility {

  def withVolatility(df: DataFrame, windows: Seq[Int] = Params.VolatilityWindows): DataFrame = {
    val w = Frames.bySymbol
    val close = col("close")
    val prev = lag(close, 1).over(w)
    // try_divide: null on a zero denominator under BOTH ANSI modes, matching
    // DuckDB's x/0 → NULL and Polars' eager-NaN-free behavior.
    val returns = try_divide(close - prev, prev)
    val hlRange = try_divide(col("high") - col("low"), close)

    val stage1 = df.select(col("*"), returns.as("returns"), hlRange.as("hl_ratio"))

    val cols = windows.flatMap { n =>
      Seq(
        Frames.rollingStd(col("returns"), n).as(s"volatility_$n"),
        Frames.rollingSum(col("returns") * col("returns"), n).as(s"realized_vol_$n"),
        Frames.rollingMean(col("hl_ratio"), n).as(s"hl_range_$n"))
    }
    stage1.select(col("*") +: cols: _*).drop("hl_ratio")
  }
}
