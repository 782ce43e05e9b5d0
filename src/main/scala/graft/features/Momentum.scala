package graft.features

import graft.Params
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Momentum features: per-period return / momentum / ROC / SMA / SMA-distance
  * (reference: src/features/engineering.py:73-117). 5 features × 4 periods.
  *
  * The `+ 1e-10` denominators replicate the reference's epsilon guards
  * verbatim (engineering.py:96,105,114).
  */
object Momentum {

  def withMomentum(df: DataFrame, periods: Seq[Int] = Params.MomentumPeriods): DataFrame = {
    val w = Frames.bySymbol
    val close = col("close")
    // O(n) SMA via the cumulative-sum identity (see Frames.withCums).
    val cummed = Frames.withCums(df, Map("_c_close" -> close))
    val cols = periods.flatMap { p =>
      val shifted = lag(close, p).over(w)
      val ret = (close - shifted) / (shifted + 1e-10)
      val sma = when(Frames.cumCountGate("_c_close", p),
        Frames.cumRolling("_c_close", p) / p)
      Seq(
        ret.as(s"return_$p"),
        (close - shifted).as(s"momentum_$p"),
        (ret * 100).as(s"roc_$p"),
        sma.as(s"sma_$p"),
        ((close - sma) / (sma + 1e-10) * 100).as(s"distance_sma_$p"))
    }
    cummed.select(col("*") +: cols: _*)
      .drop(Frames.cumHelperCols(Seq("_c_close")): _*)
  }
}
