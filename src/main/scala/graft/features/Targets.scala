package graft.features

import graft.Params
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forward-return prediction target (reference: src/features/targets.py:7-45).
  *
  * `fwd = (lead(close, h) - close) / close` — note: no epsilon in this
  * denominator (targets.py:31), unlike the momentum returns.
  * Classification target is `(fwd > 0)` as int8; regression target is `fwd`.
  * Rows whose target is null (the last `h` rows per symbol) are filtered,
  * matching `df.filter(pl.col("target").is_not_null())` (targets.py:43).
  */
object Targets {

  def withTarget(
      df: DataFrame,
      horizon: Int = Params.PredictionHorizon,
      targetType: String = "classification"): DataFrame = {
    val close = col("close")
    val fwd = try_divide(lead(close, horizon).over(Frames.bySymbol) - close, close)
    val target = targetType match {
      case "classification" => (fwd > 0).cast("tinyint")
      case "regression" => fwd
      case other => throw new IllegalArgumentException(s"Unsupported target type: $other")
    }
    df.withColumn("target", target).filter(col("target").isNotNull)
  }
}
