package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregations over the events stream table, using
  * Spark's native `window()` — the same operator Structured Streaming uses,
  * run here in batch mode so the DuckDB oracle can check it
  * (SURVEY.md §7.6). Aggregations are partial+final hash aggs; the only
  * shuffle is on the (window, group) key.
  */
object TimeWindows {

  /** Tumbling event-time windows: counts + value sum per (window, type). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("value_sum"))

  /** Sliding event-time windows (width 1h, slide 15m): each event lands in
    * width/slide windows; Spark expands them without a join. */
  def sliding(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("value_sum"))
}
