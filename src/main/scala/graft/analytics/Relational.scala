package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY.md §2.6/§7.6):
  * star-schema equi-joins and a generic as-of join. Designed for the 100 TB
  * path: dimensions broadcast, the fact table never leaves its partitioning,
  * and the as-of join is a union + single window pass (no per-row probes, no
  * range-join explosion).
  */
object Relational {

  /** Star probe: revenue per nation over
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    *
    * Scale shape: customer/nation/region are broadcast (no shuffle for the
    * dimension side); only lineitem ⋈ orders shuffles, on the join key both
    * sides already share. Aggregation is partial (map-side) + final.
    */
  def starRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer.as("c")
      .join(broadcast(nation.as("n")), col("c.c_nationkey") === col("n.n_nationkey"))
      .join(broadcast(region.as("r")), col("n.n_regionkey") === col("r.r_regionkey"))
      .select(col("c.c_custkey"), col("n.n_name"), col("r.r_name"))
    lineitem.as("l")
      .join(orders.as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(broadcast(dims.as("d")), col("o.o_custkey") === col("d.c_custkey"))
      .groupBy(col("d.n_name").as("n_name"))
      .agg(
        sum(col("l.l_extendedprice") * (lit(1) - col("l.l_discount"))).as("rev"),
        count(lit(1)).as("n_items"))
      // revenue rounded at the data's 1e-4 granularity in floor form (not
      // r6): a distributed sum of ~1e5-scale terms carries order-dependent
      // fp error above 1e-6, and at 1e-4 granularity the floor form has no
      // reachable half-tie points — bit-stable under any sum order.
      .select(col("n_name"),
        graft.queries.Core.r4(col("rev")).as("revenue"), col("n_items"))
      .orderBy("n_name")
  }

  /** Generic as-of join: for every left row, the most recent right row with
    * `rightTime <= leftTime` on the same key.
    *
    * Implementation: tag + union both sides, one window pass per key ordered
    * by (time, side, tie) with right rows sorting before left rows at equal
    * timestamps (`<=` semantics), then `last(value, ignoreNulls)` over the
    * running frame. One shuffle on the key, linear work — the classic
    * scalable as-of shape (vs. a quadratic range join).
    *
    * @param valueCols right-side columns to carry (null when no match yet)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tie: String,
      valueCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val lSide = left.select(
      Seq(col(key).as("_k"), col(leftTime).as("_t"), col(tie).as("_tie"),
        lit(1).as("_is_left"),
        lit(null).cast(right.schema(rightTime).dataType).as("_r__t")) ++
      lCols.map(c => col(c).as(s"_l_$c")) ++
      valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rSide = right.select(
      Seq(col(key).as("_k"), col(rightTime).as("_t"), col(tie).as("_tie"),
        lit(0).as("_is_left"), col(rightTime).as("_r__t")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
      valueCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_is_left"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (valueCols.map(c => s"_asof_$c" -> s"_r_$c") :+
        ("_asof__t" -> "_r__t"))
      .foldLeft(lSide.unionByName(rSide)) { case (df, (out, in)) =>
        df.withColumn(out, last(col(in), ignoreNulls = true).over(w))
      }
    // tolerance (merge_asof-style): a match older than the bound is no
    // match — nulled per row; integer-microsecond arithmetic, so the gate
    // replays exactly cross-engine. Null _asof__t (no match at all) makes
    // the predicate null, which `when` treats as false — still null out.
    def gated(c: String) = toleranceMicros match {
      case Some(m) => when(
        unix_micros(col("_t")) - unix_micros(col("_asof__t")) <= m,
        col(s"_asof_$c")).as(s"asof_$c")
      case None => col(s"_asof_$c").as(s"asof_$c")
    }
    filled.filter(col("_is_left") === 1)
      .select(lCols.map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(gated): _*)
  }

  /** Nearest-neighbor as-of join: for every left row, the right row (same
    * key) whose time is CLOSEST in either direction; equidistant → the
    * earlier (backward) match. The [[asofJoin]] union+window construction
    * run in both directions — still ONE shuffle on the key, two
    * partition-local sorts (the passes order equal-timestamp ties
    * oppositely so a same-instant right row is visible to both), then an
    * integer-microsecond distance compare, which replays exactly
    * cross-engine. Emits `nearest_dt_us` (signed: negative = matched
    * earlier) plus `nearest_<c>` per value column. */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tie: String,
      valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lSide = left.select(
      Seq(col(key).as("_k"), col(leftTime).as("_t"), col(tie).as("_tie"),
        lit(1).as("_is_left"),
        lit(null).cast(right.schema(rightTime).dataType).as("_r__t")) ++
      lCols.map(c => col(c).as(s"_l_$c")) ++
      valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val rSide = right.select(
      Seq(col(key).as("_k"), col(rightTime).as("_t"), col(tie).as("_tie"),
        lit(0).as("_is_left"), col(rightTime).as("_r__t")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
      valueCols.map(c => col(c).as(s"_r_$c")): _*)
    val wB = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_is_left"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_is_left").desc, col("_tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = (valueCols :+ "_t").foldLeft(lSide.unionByName(rSide)) {
      (df, c) =>
        val in = if (c == "_t") "_r__t" else s"_r_$c"
        df.withColumn(s"_b_$c", last(col(in), ignoreNulls = true).over(wB))
          .withColumn(s"_f_$c", first(col(in), ignoreNulls = true).over(wF))
    }
    val db = unix_micros(col("_t")) - unix_micros(col("_b__t"))
    val df_ = unix_micros(col("_f__t")) - unix_micros(col("_t"))
    val useB = col("_f__t").isNull || (col("_b__t").isNotNull && db <= df_)
    filled.filter(col("_is_left") === 1)
      .select(lCols.map(c => col(s"_l_$c").as(c)) ++
        Seq(when(useB, -db).otherwise(df_).as("nearest_dt_us")) ++
        valueCols.map(c =>
          when(useB, col(s"_b_$c")).otherwise(col(s"_f_$c"))
            .as(s"nearest_$c")): _*)
  }

  /** Skew-safe equi-join: salt the skewed (left) side's key into
    * `saltFactor` sub-keys and explode the build (right) side across all
    * salts, so one hot key spreads over `saltFactor` reducers instead of
    * one straggler task. AQE's skew-join handles moderate skew at runtime;
    * explicit salting is for the pathological keys a 100 TB pipeline meets
    * (null-heavy user ids, one dominant symbol). Deterministic salt
    * (hash of the tie column) keeps results reproducible.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, tie: String = "event_id"): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(col(tie)), lit(saltFactor)))
    val exploded = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Gap-based sessionization (30-min default): per key, a new session starts
    * when the gap to the previous event exceeds `gapMinutes`. Batch analogue
    * of a streaming session window; one shuffle on the key, two window
    * passes (flag, then running sum), then a grouped rollup.
    */
  def sessionize(events: DataFrame, key: String = "user_id", time: String = "ts",
      tie: String = "event_id", gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), col(tie))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events.withColumn("_new_s",
      when(lag(col(time), 1).over(w).isNull ||
        unix_micros(col(time)) - unix_micros(lag(col(time), 1).over(w)) > gapUs, 1L)
        .otherwise(0L))
    flagged
      .withColumn("session_idx",
        sum(col("_new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(time)).as("session_start"),
        max(col(time)).as("session_end"))
  }

  /** Exact weighted median per group: sort by (value, unique id), run the
    * INTEGER cumulative weight (exact under any association), take the
    * first value whose doubled cumulative weight reaches the group total —
    * the weighted lower median, deterministic by the id tiebreak. Weights
    * must be integral; see Analytics.aggWeightedMedian for the registered
    * instance and its oracle replay. */
  def weightedMedian(df: DataFrame, group: Column, value: Column,
      weight: Column, id: Column): DataFrame = {
    // floor() before the cast: a bare double→long cast truncates toward
    // zero in Spark but rounds half-to-even in DuckDB's CAST AS BIGINT,
    // so a non-integral weight would silently diverge cross-engine; with
    // floor on both sides the engines agree by construction
    val base = df.select(group.as("g"), value.as("v"),
      floor(weight).cast("long").as("qty"), id.as("id"))
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    base.select(col("g"), col("v"), col("qty"),
        sum(col("qty")).over(w).as("_cumw"),
        sum(col("qty")).over(tot).as("_totw"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        max(col("_totw")).as("total_weight"),
        min(when(col("_cumw") * 2 >= col("_totw"), col("v")))
          .as("weighted_median"))
  }

  /** Peak concurrent sessions per hour — the load curve capacity planning
    * reads: classic sweep-line over [[sessionize]]'s intervals (+1 at each
    * session start, −1 at its end), the running count taken over the
    * GLOBAL boundary order. A start ties BEFORE an end at the same instant
    * (delta DESC), then (user, session) for a total order — the
    * max-overlap reading, so a one-event session still registers.
    *
    * Scale shape: the running count goes through
    * [[graft.analytics.Ranking.withGlobalRunningSum]] (range-bucketed
    * integer offsets — the sweep-line WITHOUT the single-partition window
    * that kills sweep-lines at scale; integer weights make the bucketed
    * sum bit-equal to the sequential one under any bucketing), then one
    * hourly max aggregate. Hours with no boundary don't emit (concurrency
    * is unchanged there — the reader carries the previous level
    * forward). */
  def sessionConcurrency(events: DataFrame, key: String = "user_id",
      time: String = "ts", tie: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    val sess = sessionize(events, key, time, tie, gapMinutes)
    val bounds = sess.select(
        unix_micros(col("session_start")).as("us"), lit(1L).as("delta"),
        col(key).as("k"), col("session_idx"))
      .unionAll(sess.select(
        unix_micros(col("session_end")).as("us"), lit(-1L).as("delta"),
        col(key).as("k"), col("session_idx")))
    val swept = graft.analytics.Ranking.withGlobalRunningSum(
      bounds, col("us"),
      Seq(col("us"), col("delta").desc, col("k"), col("session_idx")),
      col("delta"), "concurrent")
    swept
      .groupBy(floor(col("us") / lit(3600000000L)).cast("long").as("hour_bucket"))
      .agg(count(lit(1)).as("n_boundaries"),
        max(col("concurrent")).as("peak_concurrent"))
  }
}
