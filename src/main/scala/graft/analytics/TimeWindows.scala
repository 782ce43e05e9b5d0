package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps

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

  /** Time-grid gap fill + forward fill over per-key resampled bars — the
    * resample step that turns an irregular event stream into the dense,
    * regularly-spaced series downstream rolling features assume (a bar for
    * EVERY interval; empty intervals carry the last observed close and
    * `is_gap` = 1, n_ticks = 0).
    *
    * Input: one row per (symbol, bar_start) that HAS data (e.g. the hourly
    * resample); output: one row per (symbol, grid point) between each
    * symbol's first and last bar.
    *
    * Scale shape: the grid comes from an O(symbols) min/max aggregate whose
    * explode factor is bounded by the calendar span, not the data volume;
    * the grid⋈bars join shuffles on (symbol, bar_start) — the same key both
    * sides, no row multiplication; the forward fill is one
    * last(ignoreNulls) window pass per symbol. close values are copies
    * (no arithmetic), so the fill is bit-exact on any engine. */
  def gapfill(hourly: DataFrame, step: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = hourly.groupBy("symbol")
      .agg(min(col("bar_start")).as("_t0"), max(col("bar_start")).as("_t1"))
      .select(col("symbol"),
        explode(sequence(col("_t0"), col("_t1"), expr(s"INTERVAL $step")))
          .as("bar_start"))
    val w = Window.partitionBy("symbol").orderBy("bar_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("symbol", "bar_start"), "left")
      .select(col("symbol"), col("bar_start"),
        last(col("close"), ignoreNulls = true).over(w).as("close"),
        col("close").isNull.cast("int").as("is_gap"),
        coalesce(col("n_ticks"), lit(0L)).as("n_ticks"))
  }

  /** Dickey–Fuller unit-root diagnostic on the hourly event-count series:
    * regress Δy_t on (1, y_{t−1}) and report the t-statistic of the
    * mean-reversion coefficient ρ — strongly negative t means the ingest
    * rate mean-reverts (stationary), t near 0 means a random-walk drift
    * the capacity planner must treat differently. (The statistic is the
    * DF test's; compare against the DF critical values offline.)
    *
    * All data-sized sums are EXACT integers (y, y², Δ, Δ², yΔ over
    * integer counts); ρ, α, the residual sum of squares, and the t-stat
    * assemble from those six scalars in a fixed expression order on both
    * engines — no float accumulation. Same bounded hourly-series class
    * as [[hourlyAcf]]. */
  def hourlyStationarity(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("hr")
    val d = events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
      .select(col("y"), lag(col("y"), 1).over(w).as("x"))
      .filter(col("x").isNotNull)
      .select(col("x"), (col("y") - col("x")).as("dy"))
    val agg = d.agg(count(lit(1)).as("n"),
      sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"),
      sum(col("dy")).as("sd"), sum(col("dy") * col("dy")).as("sdd"),
      sum(col("x") * col("dy")).as("sxd"))
    val n = col("n").cast("double")
    val (s1, s2) = (col("s1").cast("double"), col("s2").cast("double"))
    val (sd, sdd, sxd) = (col("sd").cast("double"), col("sdd").cast("double"),
      col("sxd").cast("double"))
    val rho = (n * sxd - s1 * sd) / (n * s2 - s1 * s1)
    val alpha = (sd - rho * s1) / n
    val ssr = sdd + n * alpha * alpha + rho * rho * s2 -
      lit(2.0) * alpha * sd - lit(2.0) * rho * sxd +
      lit(2.0) * alpha * rho * s1
    val se = sqrt((ssr / (n - 2.0)) * n / (n * s2 - s1 * s1))
    agg.select(col("n").as("n_obs"), rho.as("rho"), alpha.as("alpha"),
      (rho / se).as("df_t"))
  }

  /** Forecast-baseline evaluation on the hourly event-count series: MAE
    * and RMSE of the naive (y_{t−1}) and seasonal-naive (y_{t−24})
    * one-step forecasts, plus MASE (Hyndman & Koehler 2006) — the
    * seasonal model's MAE scaled by the naive MAE, the scale-free skill
    * score a forecasting pipeline gates its models against: any model
    * worth shipping must beat MASE of its own seasonal-naive baseline.
    *
    * Counts are integers, so every |error| and squared-error sum is an
    * EXACT long; each emitted metric is one or two float ops on those
    * scalars — no float accumulation, bit-exact parity by construction.
    * Same bounded single-partition class as [[hourlyAcf]]: the windows
    * run over the one-row-per-hour aggregate. */
  def hourlyForecastEval(events: DataFrame, season: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("hr")
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
    val d = hourly.select(col("y"),
      (col("y") - lag(col("y"), 1).over(w)).as("d1"),
      (col("y") - lag(col("y"), season).over(w)).as("ds"))
    val agg = d.agg(
      count(col("d1")).as("n1"), sum(abs(col("d1"))).as("sa1"),
      sum(col("d1") * col("d1")).as("sq1"),
      count(col("ds")).as("ns"), sum(abs(col("ds"))).as("sas"),
      sum(col("ds") * col("ds")).as("sqs"))
    val mae1 = col("sa1").cast("double") / col("n1")
    val maes = col("sas").cast("double") / col("ns")
    agg.select(col("n1").as("n_pairs_naive"), col("ns").as("n_pairs_seasonal"),
      mae1.as("mae_naive"),
      sqrt(col("sq1").cast("double") / col("n1")).as("rmse_naive"),
      maes.as("mae_seasonal"),
      sqrt(col("sqs").cast("double") / col("ns")).as("rmse_seasonal"),
      (maes / mae1).as("mase_seasonal"))
  }

  /** Autocorrelation function of the hourly event-count series at lags
    * 1..maxLag — the periodicity diagnostic read before picking a
    * seasonal model (a daily cycle shows as a spike at lag 24). Uses the
    * full-series-mean ACF convention:
    * r_h = Σ(y_t−ȳ)(y_{t+h}−ȳ) / Σ(y_t−ȳ)².
    *
    * Everything data-sized is EXACT integer arithmetic: the numerator
    * expands to Σy_t·y_{t+h}, the head/tail partial sums, and the pair
    * count — all long sums over integer counts — and the denominator to
    * the global power sums; each ACF value is then a handful of float
    * ops on those exact scalars, written in the same association order
    * on both engines. No float accumulation anywhere.
    *
    * Scale shape: events collapse to one row per hour first (the only
    * data-sized shuffle); the lag pairing is a self-join of the bounded
    * hourly series fanned ×maxLag, grouped with map-side partials; the
    * global scalars ride one broadcast 1-row cross. The row_number runs
    * over the aggregated series — the same justified bounded
    * single-partition class as [[decomposeHourly]]. */
  def hourlyAcf(events: DataFrame, maxLag: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
    val numbered = hourly
      .select(col("y"), row_number().over(Window.orderBy("hr"))
        .cast("long").as("rn"))
      .pinned()
    val ex = numbered
      .select(col("rn"), col("y"), explode(expr(s"sequence(1, $maxLag)"))
        .as("lag"))
      .select((col("rn") + col("lag")).as("rn2"), col("y").as("y1"),
        col("lag").cast("long").as("lag"))
    val per = ex
      .join(numbered.select(col("rn").as("rn2"), col("y").as("y2")), "rn2")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("y1") * col("y2")).as("sxy"),
        sum(col("y1")).as("s_head"), sum(col("y2")).as("s_tail"))
    val tot = numbered.agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
      sum(col("y") * col("y")).as("ss"))
    val ybar = col("s").cast("double") / col("n")
    val num = col("sxy").cast("double") -
      ybar * (col("s_head") + col("s_tail")).cast("double") +
      col("n_pairs").cast("double") * ybar * ybar
    val den = col("ss").cast("double") - col("n").cast("double") * ybar * ybar
    per.crossJoin(broadcast(tot))
      .select(col("lag"), col("n_pairs"), (num / den).as("acf"))
  }

  /** Classical additive seasonal decomposition of the hourly event-count
    * series: y = trend + seasonal + residual, with the textbook centered
    * 2×24 moving average for the even daily period —
    * trend_t = (y_{t−12} + 2·Σ_{−11..+11} y + y_{t+12}) / 48 — and the
    * seasonal index as the mean detrended deviation per hour-of-day.
    *
    * All intermediates stay EXACT integers until one final division:
    * T48 = 48·trend and D48 = 48·y − T48 are longs, and the per-hod
    * seasonal index divides an exact integer sum once — so both engines
    * agree bit-for-bit regardless of partitioning or merge order (no
    * float-accumulation surface at all).
    *
    * Scale shape: the raw events collapse to one row per hour FIRST (the
    * only full shuffle); the unpartitioned windows then run over the
    * aggregated series — bounded at one row per hour (<10⁵ rows for a
    * decade), the same justified single-partition class as the 10-row
    * lift-table window. Rows-based frames over OBSERVED hours: gap-fill
    * upstream (see [[gapfill]]) if the corpus can go hours-silent. */
  def decomposeHourly(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
    val seq_ = Window.orderBy("hr")
    val inner = Window.orderBy("hr").rowsBetween(-11, 11)
    val t48 = lag(col("y"), 12).over(seq_) +
      lit(2L) * sum(col("y")).over(inner) + lead(col("y"), 12).over(seq_)
    val d = hourly
      .select(col("hr"), hour(col("hr")).cast("long").as("hod"), col("y"),
        t48.as("t48"))
      .withColumn("d48", lit(48L) * col("y") - col("t48"))
    val seas = d.filter(col("d48").isNotNull).groupBy("hod")
      .agg((sum(col("d48")).cast("double") / (lit(48.0) * count(lit(1))))
        .as("seasonal"))
    d.join(seas, Seq("hod"), "left")
      .select(col("hr"), col("hod"), col("y"),
        (col("t48").cast("double") / 48.0).as("trend"),
        col("seasonal"),
        (col("y").cast("double") - col("t48").cast("double") / 48.0 -
          col("seasonal")).as("resid"))
  }
}
