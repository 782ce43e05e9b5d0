package graft.features

import graft.Params
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar features + cyclic encodings
  * (reference: src/features/engineering.py:160-195).
  *
  * - `day_of_week` follows Polars' ISO convention Monday=1..Sunday=7
  *   (reference engineering.py:180): Spark `weekday()` (Monday=0) + 1;
  *   DuckDB oracle uses `isodow`.
  * - The cyclic encodings use the reference's literal truncated pi
  *   `3.14159` (engineering.py:186-193) — kept verbatim for parity.
  * - Calendar fields are cast to long so Spark, Polars and the DuckDB
  *   oracle agree on integer width.
  *
  * Narrow (no shuffle): pure per-row projection, fully codegen'd.
  */
object Temporal {

  def withTemporal(df: DataFrame, dtCol: String = "datetime"): DataFrame = {
    val ts = col(dtCol)
    val pi2 = lit(2) * lit(Params.Pi.toDouble)
    val base = df.select(col("*"),
      hour(ts).cast("long").as("hour"),
      minute(ts).cast("long").as("minute"),
      (weekday(ts) + 1).cast("long").as("day_of_week"),
      dayofmonth(ts).cast("long").as("day"),
      month(ts).cast("long").as("month"))
    base.select(col("*"),
      sin(col("hour") * pi2 / 24).as("hour_sin"),
      cos(col("hour") * pi2 / 24).as("hour_cos"),
      sin(col("day_of_week") * pi2 / 7).as("day_of_week_sin"),
      cos(col("day_of_week") * pi2 / 7).as("day_of_week_cos"),
      sin(col("month") * pi2 / 12).as("month_sin"),
      cos(col("month") * pi2 / 12).as("month_cos"))
  }
}
