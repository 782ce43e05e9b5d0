package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over the events table: ordered funnels and
  * cohort retention — the two sequence-shaped aggregations an event
  * pipeline runs beyond plain grouped counts.
  *
  * Scale shape: both operators reduce to per-user aggregates joined on
  * `user_id` — every stage shuffles on the SAME key, so AQE/exchange reuse
  * keeps it one partitioning end to end, and nothing is ever widened to
  * per-event pair data. No window over the full event stream, no
  * collect_list of a user's history (unbounded per-user state at 100 TB) —
  * each funnel stage carries exactly one (user_id, timestamp) row.
  */
object Behavior {

  /** Ordered funnel: for each prefix of `stages`, the number of users who
    * completed the stages IN ORDER — stage i+1 counts only events strictly
    * after the user's stage-i completion time (their EARLIEST valid
    * completion, the standard greedy funnel semantics).
    *
    * Returns (stage_idx, stage, n_users), one row per stage.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // reach(i): (user_id, t_reach) = earliest completion of stage i given
    // in-order completion of stages 0..i-1
    val reaches = stages.tail.scanLeft(
      events.filter(col("event_type") === stages.head)
        .groupBy("user_id").agg(min(col("ts")).as("t_reach"))) {
      (prev, stage) =>
        events.filter(col("event_type") === stage).as("e")
          .join(prev.as("p"),
            col("e.user_id") === col("p.user_id") &&
            col("e.ts") > col("p.t_reach"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min(col("e.ts")).as("t_reach"))
    }
    reaches.zip(stages).zipWithIndex.map { case ((reach, stage), i) =>
      reach.agg(count(lit(1)).as("n_users"))
        .select(lit(i).cast("long").as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Weekly cohort retention: users are cohorted by the Monday-start week
    * of their FIRST event; each (cohort_week, week_offset) cell counts the
    * cohort's users active that many weeks later. The (user, week) activity
    * set is distinct-ed BEFORE the cohort join — the join input shrinks to
    * at most users × weeks rows regardless of event volume. */
  def weeklyRetention(events: DataFrame): DataFrame = {
    val cohorts = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
      .distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / lit(7))
          .cast("long").as("week_offset"))
      // count(*) == distinct users: (user, act_week) is distinct and each
      // user has exactly one cohort week
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each ordered pair (prev_type, next_type) of consecutive events of
    * the SAME user (ordered by ts, event_id), the transition count and the
    * row-normalized probability p = n / Σ_next n.
    *
    * Scale shape: one window shuffle on `user_id` for the lag (per-user
    * state is a single previous value, not a history), then a grouped count
    * over at most |types|² keys — map-side partial aggregation collapses
    * the pair stream before the tiny final shuffle, and the probability
    * normalization is a window over that |types|²-row aggregate, never over
    * events. */
  /** Per-user activity cadence: event count, active span, and
    * inter-arrival gap stats (mean/min/max, seconds). The mean gap is
    * (span)/(n−1) — the telescoping identity, no gap materialization —
    * while min/max come from one lag pass.
    *
    * Scale shape: the lag window and the final aggregate share the
    * user_id hash partitioning, so the second stage reuses the first's
    * exchange; state per user is O(1). */
  def userCadence(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val gap = (us - lag(us, 1).over(w)).cast("double") / 1e6
    events
      .select(col("user_id"), col("ts"), gap.as("_gap"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .cast("double") / 1e6).as("span_s"),
        min(col("_gap")).as("min_gap_s"),
        max(col("_gap")).as("max_gap_s"))
      .select(col("user_id"), col("n_events"), col("span_s"),
        when(col("n_events") > 1,
          col("span_s") / (col("n_events") - 1).cast("double"))
          .as("mean_gap_s"),
        col("min_gap_s"), col("max_gap_s"))
  }

  /** Inter-arrival burstiness per user (Goh & Barabási 2008):
    * B = (σ − μ)/(σ + μ) over the user's event gaps — B → −1 periodic,
    * 0 Poisson, → +1 bursty — plus the coefficient of variation. The
    * temporal-texture signal [[userCadence]]'s min/mean/max can't see.
    *
    * Gaps are integer SECONDS (µs div 1e6), so Σx and Σx² are exact longs
    * in any accumulation order — no sequential-fold machinery needed; the
    * one double conversion happens in the identical variance tree on both
    * engines (Σx up to ~1e10 and Σx² up to ~1e17 are exact in a double).
    * Same one-exchange lag-then-aggregate shape as [[userCadence]]. */
  def userBurstiness(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapS = expr("(unix_micros(ts) - unix_micros(_prev_ts)) div 1000000L")
    val gaps = events
      .select(col("user_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("_prev_ts"))
      .select(col("user_id"), gapS.as("_g"))
      .filter(col("_g").isNotNull)
    val agg = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_g")).as("_s1"), sum(col("_g") * col("_g")).as("_s2"))
    val m = col("_s1").cast("double") / col("n_gaps")
    val variance = when(col("n_gaps") > 1,
      greatest(
        (col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") /
            col("n_gaps")) / (col("n_gaps") - 1),
        lit(0.0)))
    agg.select(col("user_id"), col("n_gaps"), m.as("_m"),
        sqrt(variance).as("_sd"))
      .select(col("user_id"), col("n_gaps"), col("_m").as("mean_gap_s"),
        col("_sd").as("std_gap_s"),
        when(col("_m") > 0.0, col("_sd") / col("_m")).as("cv"),
        when(col("_sd") + col("_m") > 0.0,
          (col("_sd") - col("_m")) / (col("_sd") + col("_m")))
          .as("burstiness"))
  }

  /** Pairwise event-type co-occurrence with support and lift — the
    * association-rule screen (which behaviors travel together) over the
    * per-user distinct type sets.
    *
    * Scale shape: ONE user-keyed aggregate builds each user's distinct
    * type set (bounded by the closed |types| vocabulary, never event
    * history), pairs are generated array-side from the sorted set (no
    * self-join on a data-sized table), and the pair counts collapse
    * map-side into at most |types|² keys. The per-type user counts and the
    * user total ride along as broadcast frames. */
  def assocPairs(events: DataFrame): DataFrame = {
    val sets = events.groupBy("user_id")
      .agg(array_sort(collect_set(col("event_type"))).as("_ts"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(_ts, (x, i) ->
          |  transform(slice(_ts, i + 2, size(_ts)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    val typeCnt = sets.select(explode(col("_ts")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val nUsers = sets.agg(count(lit(1)).as("n_users"))
    val ta = broadcast(typeCnt
      .select(col("event_type").as("type_a"), col("n_t").as("n_a")))
    val tb = broadcast(typeCnt
      .select(col("event_type").as("type_b"), col("n_t").as("n_b")))
    val support = col("n_ab").cast("double") / col("n_users")
    pairs.join(ta, Seq("type_a")).join(tb, Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        support.as("support"),
        (support / ((col("n_a").cast("double") / col("n_users")) *
          (col("n_b").cast("double") / col("n_users")))).as("lift"))
  }

  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("event_type").as("next_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
    val wRow = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    counts.select(col("prev_type"), col("next_type"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(wRow)).as("p"))
  }

  /** Top-k L-step user journey paths — the path-analysis companion to
    * [[transitionMatrix]] (which sees only pairwise structure; a frequent
    * 3-step funnel like view>click>purchase is invisible in the pairs).
    * Sliding event-type windows per user via lead(1..L−1), counted
    * globally, top-k via TakeOrderedAndProject (no global sort). One
    * user-keyed exchange + one count aggregate — path cardinality is
    * |vocab|^L (125 here), so the aggregate is tiny at any data scale. */
  def topPaths(events: DataFrame, steps: Int = 3, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val legs = col("event_type") +:
      (1 until steps).map(i => lead(col("event_type"), i).over(w))
    // Complete = ALL legs non-null, not just the furthest lead: concat_ws
    // skips nulls, so a null event_type mid-window would otherwise emit a
    // truncated path flagged complete while the oracle's `||` concatenation
    // nulls the whole path — both engines agree only under the all-legs gate.
    events
      .select(concat_ws(">", legs: _*).as("path"),
        legs.map(_.isNotNull).reduce(_ && _).as("_complete"))
      .filter(col("_complete"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Per-user Shannon entropy of the event-type distribution — the
    * behavioral-diversity signal (0 = single-minded, log2(#types) =
    * uniform) that segments bots/scrapers (near-zero) from organic
    * sessions. Two user-keyed aggregates + one type-keyed join back; the
    * per-user sum folds over the event_type-sorted list (sequential-fold
    * contract, oracle bit-equal — event types are unique per user, so the
    * sort order is total). */
  /** Conversion-latency distribution: for every user with a signup, the
    * time from FIRST signup to the first purchase at-or-after it, bucketed
    * in whole hours — the activation-funnel latency histogram growth teams
    * read activation SLAs off. Users who signed up but never purchased
    * after land in bucket −1 (they are the denominator a naive
    * converted-only histogram silently drops). All-integer output
    * (microsecond floor division); two user-keyed min-aggregates + one
    * conditional join — the as-of cost class, no window at all. */
  def timeToConvert(events: DataFrame): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("s_us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    // the time condition rides the JOIN, not a post-filter: a user whose
    // purchases all precede the signup must keep the unmatched row
    // (bucket −1), which a filter after a plain left join would drop
    signup.as("s").join(purchases.as("p"),
        col("s.user_id") === col("p.user_id") && col("p_us") >= col("s_us"),
        "left")
      .groupBy(col("s.user_id"), col("s_us"))
      .agg(min(col("p_us")).as("first_p"))
      .select(when(col("first_p").isNotNull,
        floor((col("first_p") - col("s_us")) / lit(3600000000L)).cast("long"))
        .otherwise(lit(-1L)).as("latency_hours"))
      .groupBy("latency_hours")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort LTV curves: users cohorted by first-activity week, purchase
    * revenue accumulated per cohort over cohort age —
    *
    *   cum_ltv(cohort, a) = Σ_{age ≤ a} revenue(cohort, age) / |cohort|
    *
    * the curve a growth model reads payback periods off (next to
    * [[weeklyRetention]]'s activity version). Weeks via date_trunc (Monday
    * start on both engines), age in whole weeks via integer day division.
    *
    * Scale shape: one user-keyed first-week aggregate, one broadcast-sized
    * cohort-size table, one (cohort, age) aggregate with map-side partials,
    * then the running sum over a ≤-weeks-long ordered frame per cohort —
    * the tiny-window class, nothing data-sized on the driver. */
  def userLtv(events: DataFrame): DataFrame = {
    val wk = to_date(date_trunc("week", col("ts")))
    val firstWeek = events
      .groupBy("user_id").agg(min(wk).as("cohort_week"))
    val cohortSize = firstWeek.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_users"))
    val rev = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), wk.as("week"), col("value"))
      .join(firstWeek, Seq("user_id"))
      .groupBy("cohort_week",  "week")
      .agg(countDistinct(col("user_id")).as("active_buyers"),
        sum(col("value")).as("revenue"))
      .withColumn("age_weeks",
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("int"))
    val w = Window.partitionBy("cohort_week").orderBy("age_weeks")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(cohortSize, Seq("cohort_week"))
      .select(col("cohort_week"), col("age_weeks"), col("cohort_users"),
        col("active_buyers"), col("revenue"),
        (sum(col("revenue")).over(w) / col("cohort_users").cast("double"))
          .as("cum_ltv"))
  }

  /** Multi-touch attribution: credit each conversion's preceding touch
    * events under the three classic position models —
    *
    *   first_touch: 1.0 to the earliest touch in the lookback window
    *   last_touch:  1.0 to the latest
    *   linear:      1/n to each of the n touches
    *
    * and roll the credit up per (model, channel). The lookback is an
    * integer-microsecond gate (`t_ts ∈ (c_ts − window, c_ts]`), so the
    * window edge is bit-portable; ties inside a conversion break on the
    * unique touch event_id, making first/last winners deterministic.
    * Conversions with no touch in the window simply attribute nothing
    * (they surface as total_credit < #conversions).
    *
    * Scale shape: ONE user-keyed interval join (bounded by per-user
    * activity, the as-of-join cost class — never a time-unkeyed cross),
    * one conversion-keyed window pass for (n, first, last), then a
    * 3×-explode of per-touch credit structs into a tiny (model, channel)
    * aggregate. */
  def attribution(events: DataFrame, convType: String = "purchase",
      channels: Seq[String] = Seq("click", "view", "signup"),
      windowHours: Int = 24): DataFrame = {
    val winUs = windowHours.toLong * 3600L * 1000000L
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        unix_micros(col("ts")).as("c_us"))
    val touch = events.filter(col("event_type").isin(channels.map(lit): _*))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("t_us"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("t_us") <= col("c_us") &&
        col("t_us") > col("c_us") - lit(winUs))
    val w = Window.partitionBy("conv_id")
    val scored = j
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn_first",
        row_number().over(w.orderBy(col("t_us"), col("t_id"))))
      .withColumn("rn_last",
        row_number().over(w.orderBy(col("t_us").desc, col("t_id").desc)))
    scored.select(col("channel"), explode(array(
        struct(lit("first_touch").as("model"),
          when(col("rn_first") === 1, lit(1.0)).otherwise(lit(0.0)).as("credit")),
        struct(lit("last_touch").as("model"),
          when(col("rn_last") === 1, lit(1.0)).otherwise(lit(0.0)).as("credit")),
        struct(lit("linear").as("model"),
          (lit(1.0) / col("n").cast("double")).as("credit")))).as("mc"))
      .select(col("mc.model").as("model"), col("channel"), col("mc.credit").as("credit"))
      .groupBy("model", "channel")
      .agg(sum(col("credit")).as("credit"),
        count(when(col("credit") > 0.0, 1)).as("touches_credited"))
  }

  def userTypeEntropy(events: DataFrame): DataFrame = {
    val c = events.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val tot = c.groupBy("user_id").agg(sum(col("c")).as("n"))
    c.join(tot, Seq("user_id"))
      .select(col("user_id"), col("event_type"), col("n"),
        (-(col("c").cast("double") / col("n")) *
          log2(col("c").cast("double") / col("n"))).as("h"))
      .groupBy("user_id")
      .agg(max(col("n")).as("n_events"), count(lit(1)).as("n_types"),
        array_sort(collect_list(struct(col("event_type"), col("h")))).as("_s"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("aggregate(_s, 0D, (acc, x) -> acc + x.h)").as("type_entropy"))
  }
}
