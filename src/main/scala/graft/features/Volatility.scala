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
  *
  * Rolling aggregates use the O(n) cumulative-sum formulation
  * ([[Frames.withCums]] / [[Frames.cumRolling]]): running sums + lags
  * instead of per-row frame recomputation (O(n·w)) — the same incremental
  * shape Polars' rolling kernels use, and the one that holds at 100 TB.
  * Running sums accumulate strictly left-to-right in both Spark and DuckDB,
  * so the oracle reproduces every bit.
  */
object Volatility {

  def withVolatility(df: DataFrame, windows: Seq[Int] = Params.VolatilityWindows): DataFrame = {
    val w = Frames.bySymbol
    val close = col("close")
    val prev = lag(close, 1).over(w)
    val returns = try_divide(close - prev, prev)
    val hlRange = try_divide(col("high") - col("low"), close)

    val stage1 = df.select(col("*"), returns.as("returns"), hlRange.as("_hl_ratio"))

    // Stage 2: running cums of returns, returns², hl, and non-null counts.
    val stage2 = Frames.withCums(stage1, Map(
      "_c_r" -> col("returns"),
      "_c_r2" -> (col("returns") * col("returns")),
      "_c_hl" -> col("_hl_ratio")))

    // Stage 3: windowed differences of the cums.
    val cols = windows.flatMap { n =>
      val r = Frames.cumRolling("_c_r", n)
      val r2 = Frames.cumRolling("_c_r2", n)
      val hl = Frames.cumRolling("_c_hl", n)
      val gate = Frames.cumCountGate("_c_r", n)
      val hlGate = Frames.cumCountGate("_c_hl", n)
      Seq(
        when(gate, sqrt(greatest((r2 - r * r / n) / (n - 1), lit(0.0)))).as(s"volatility_$n"),
        when(gate, r2).as(s"realized_vol_$n"),
        when(hlGate, hl / n).as(s"hl_range_$n"))
    }
    stage2.select(col("*") +: cols: _*)
      .drop(Frames.cumHelperCols(Seq("_c_r", "_c_r2", "_c_hl")): _*)
      .drop("_hl_ratio")
  }
}
