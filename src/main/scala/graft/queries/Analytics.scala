package graft.queries

import graft.analytics.{Relational, TimeWindows}
import graft.source.{Bars, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Core.r6

/** Oracle-checked relational / event-time queries (north-star extensions,
  * SURVEY.md §7.6). */
object Analytics {

  /** Star-schema revenue rollup: broadcast dims, one fact shuffle. */
  def joinStar(s: SparkSession, dir: String): DataFrame = {
    val df = Relational.starRevenue(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.nation(s, dir), Tables.region(s, dir))
    df.select(col("n_name"), (col("revenue") + lit(0.0)).as("revenue"), col("n_items"))
      .orderBy("n_name")
  }

  /** As-of join: for each purchase, the user's most recent prior-or-equal
    * error event. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = Bars.readEvents(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    Relational.asofJoin(purchases, errors,
        key = "user_id", leftTime = "ts", rightTime = "ts", tie = "event_id",
        valueCols = Seq("event_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_event_id").as("last_error_id"))
      .orderBy("event_id")
  }

  /** Tumbling 1h event-time windows (batch mode of the streaming operator). */
  def windowTumbling(s: SparkSession, dir: String): DataFrame =
    TimeWindows.tumbling(Bars.readEvents(s, dir))
      .select(col("w_start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), r6(col("value_sum")).as("value_sum"))
      .orderBy("w_start", "event_type")

  /** Sliding 1h/15m event-time windows. */
  def windowSliding(s: SparkSession, dir: String): DataFrame =
    TimeWindows.sliding(Bars.readEvents(s, dir))
      .select(col("w_start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), r6(col("value_sum")).as("value_sum"))
      .orderBy("w_start", "event_type")

  /** Gap-based sessionization (30 min) per user. */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Relational.sessionize(Bars.readEvents(s, dir))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"))
      .orderBy("user_id", "session_idx")
}
