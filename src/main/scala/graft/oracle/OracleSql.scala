package graft.oracle

import graft.Params

/** DuckDB oracle SQL, one statement per entry in `SparkEntry.queries`.
  *
  * Every statement mirrors its Spark query's arithmetic tree exactly —
  * identical constants ([[graft.Params]]), identical association order,
  * identical null gates, floor-form 6-decimal rounding on derived doubles
  * (`floor(x·1e6 + 0.5)/1e6`, see graft.queries.Core.r6), identical
  * deterministic ORDER BY — so the driver's row-hash compare is bit-stable.
  * The momentum/volatility blocks are generated from the same period lists
  * the Spark side uses.
  */
object OracleSql {

  private val P = Params.MomentumPeriods
  private val V = Params.VolatilityWindows
  private val eps = Params.Eps
  private val pi = Params.Pi

  private val W = "PARTITION BY symbol ORDER BY datetime, event_id"
  private def frame(n: Int) =
    s"PARTITION BY symbol ORDER BY datetime, event_id ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
  /** Running (cumulative) frame — both engines accumulate strictly in row
    * order over this frame, which is what makes the O(n) cum-lag rolling
    * formulation bit-portable (see graft.features.Frames). */
  private val Wrun = s"$W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
  private def cumRolling(name: String, n: Int) =
    s"$name - COALESCE(LAG($name, $n) OVER ($W), 0.0)"
  private def cumGate(name: String, n: Int) =
    s"(${name}_n - COALESCE(LAG(${name}_n, $n) OVER ($W), 0)) = $n"
  // floor-form rounding (see graft.queries.Core.r6): identical IEEE ops in
  // both engines, immune to the round()-goes-through-decimal-string ties;
  // the |x| > 9e9 guard mirrors Spark's (long-returning floor would clamp)
  private def r(e: String) =
    s"CASE WHEN abs(($e)) > 9000000000.0 THEN ($e) " +
      s"ELSE floor(($e) * 1000000 + 0.5) / 1000000 END"
  // 4-decimal variant for money sums (see graft.queries.Core.r4): floors at
  // the data's 1e-4 granularity, same magnitude guard scaled ×100 so a sum
  // past ~9e11 passes through in both engines instead of Spark's long floor
  // silently clamping
  private def r4(e: String) =
    s"CASE WHEN abs(($e)) > 900000000000.0 THEN ($e) " +
      s"ELSE floor(($e) * 10000 + 0.5) / 10000 END"

  /** events → bars adapter CTE (FIXTURES.md §4), shared by all bar queries. */
  val barsCte: String =
    s"""WITH bars0 AS (
       |  SELECT CAST(user_id % ${Params.Symbols} AS VARCHAR) AS symbol, event_id, ts AS datetime, value
       |  FROM events
       |), bars1 AS (
       |  SELECT symbol, event_id, datetime,
       |         COALESCE(LAG(value, 1) OVER ($W), value) AS open,
       |         value AS close,
       |         CAST(event_id % 1000 AS DOUBLE) AS volume
       |  FROM bars0
       |), bars AS (
       |  SELECT symbol, event_id, datetime, open, close, volume,
       |         GREATEST(open, close) AS high, LEAST(open, close) AS low
       |  FROM bars1
       |)""".stripMargin

  val ingestBars: String =
    s"""$barsCte
       |SELECT symbol, event_id, datetime,
       |       ${r("open")} AS open, ${r("high")} AS high, ${r("low")} AS low,
       |       ${r("close")} AS close, volume
       |FROM bars ORDER BY event_id""".stripMargin

  val featMomentum: String = {
    val lags = P.map(p => s"LAG(close, $p) OVER ($W) AS lag_$p").mkString(",\n         ")
    val rollings = P.flatMap(p => Seq(
      s"${cumRolling("_c_close", p)} AS s_$p",
      s"${cumGate("_c_close", p)} AS g_$p")).mkString(",\n         ")
    val smas = P.map(p =>
      s"CASE WHEN g_$p THEN s_$p / $p END AS sma_$p").mkString(",\n         ")
    val out = P.flatMap(p => Seq(
      s"${r(s"(close - lag_$p) / (lag_$p + $eps)")} AS return_$p",
      s"${r(s"close - lag_$p")} AS momentum_$p",
      s"${r(s"(close - lag_$p) / (lag_$p + $eps) * 100")} AS roc_$p",
      s"${r(s"sma_$p")} AS sma_$p",
      s"${r(s"(close - sma_$p) / (sma_$p + $eps) * 100")} AS distance_sma_$p"))
      .mkString(",\n       ")
    s"""$barsCte, m1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_close,
       |         COUNT(close) OVER ($Wrun) AS _c_close_n
       |  FROM bars
       |), m2 AS (
       |  SELECT symbol, event_id, close,
       |         $lags,
       |         $rollings
       |  FROM m1
       |), m3 AS (
       |  SELECT symbol, event_id, close,
       |         ${P.map(p => s"lag_$p").mkString(", ")},
       |         $smas
       |  FROM m2
       |)
       |SELECT symbol, event_id,
       |       $out
       |FROM m3 ORDER BY event_id""".stripMargin
  }

  /** Sequential running sum: DuckDB's partitioned running SUM pairwise-
    * combines (non-sequential), unlike Spark's strictly-incremental window
    * Sum — list_sum over the frame-ordered list restores the exact
    * left-to-right fold. Verified bit-equal to a Python fold on both sides. */
  private def cumSum(e: String) =
    s"COALESCE(list_sum(list($e) OVER ($Wrun)), 0.0)"

  /** Running cums + non-null counts for the volatility family (mirrors
    * Frames.withCums over returns / returns² / hl_ratio). */
  private val volCums: String = Seq(
    s"${cumSum("returns")} AS _c_r",
    s"COUNT(returns) OVER ($Wrun) AS _c_r_n",
    s"${cumSum("returns * returns")} AS _c_r2",
    s"COUNT(returns * returns) OVER ($Wrun) AS _c_r2_n",
    s"${cumSum("hl_ratio")} AS _c_hl",
    s"COUNT(hl_ratio) OVER ($Wrun) AS _c_hl_n").mkString(",\n         ")

  private def volRollings(ns: Seq[Int]): String = ns.flatMap(n => Seq(
    s"${cumRolling("_c_r", n)} AS rs_$n",
    s"${cumRolling("_c_r2", n)} AS rq_$n",
    s"${cumRolling("_c_hl", n)} AS hs_$n",
    s"${cumGate("_c_r", n)} AS rg_$n",
    s"${cumGate("_c_hl", n)} AS hg_$n")).mkString(",\n         ")

  val featVolatility: String = {
    val out = V.flatMap(n => Seq(
      s"${r(s"CASE WHEN rg_$n THEN sqrt(greatest((rq_$n - rs_$n * rs_$n / $n) / ${n - 1}, 0.0)) END")} AS volatility_$n",
      s"${r(s"CASE WHEN rg_$n THEN rq_$n END")} AS realized_vol_$n",
      s"${r(s"CASE WHEN hg_$n THEN hs_$n / $n END")} AS hl_range_$n"))
      .mkString(",\n       ")
    s"""$barsCte, v1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS returns,
       |         (high - low) / close AS hl_ratio
       |  FROM bars
       |), v2 AS (
       |  SELECT symbol, event_id, datetime, returns,
       |         $volCums
       |  FROM v1
       |), v3 AS (
       |  SELECT symbol, event_id, returns,
       |         ${volRollings(V)}
       |  FROM v2
       |)
       |SELECT symbol, event_id, ${r("returns")} AS returns,
       |       $out
       |FROM v3 ORDER BY event_id""".stripMargin
  }

  /** VWAP (mirrors features.Market.withVwap): running cums via the
    * sequential list_sum fold, rolling 20 via the cum−lag identity, the
    * same count gate as every rolling feature. */
  val featVwap: String = {
    val n = graft.features.Market.VwapWindow
    s"""$barsCte, vw1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ((high + low + close) / 3.0) * volume AS _pv, volume
       |  FROM bars
       |), vw2 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("_pv")} AS _c_pv,
       |         COUNT(_pv) OVER ($Wrun) AS _c_pv_n,
       |         ${cumSum("volume")} AS _c_v
       |  FROM vw1
       |), vw3 AS (
       |  SELECT symbol, event_id, close,
       |         _c_pv / _c_v AS vwap_cum,
       |         CASE WHEN ${cumGate("_c_pv", n)}
       |              THEN (${cumRolling("_c_pv", n)}) / (${cumRolling("_c_v", n)}) END AS vwap_$n
       |  FROM vw2
       |)
       |SELECT symbol, event_id,
       |       ${r("vwap_cum")} AS vwap_cum, ${r(s"vwap_$n")} AS vwap_$n,
       |       ${r(s"(close - vwap_$n) / vwap_$n * 100")} AS vwap_distance
       |FROM vw3 ORDER BY event_id""".stripMargin
  }

  /** Drawdown (mirrors features.Market.withDrawdown): running MAX/MIN are
    * order-insensitive extrema, so engine-native windowed aggregates are
    * bit-portable with no sequential-fold machinery. */
  /** Mirrors Core.featAtr (Market.withAtr, n=14): true range with the
    * first-row coalesce, rolling mean via the sequential cum−lag sums. */
  val featAtr: String = {
    val n = graft.features.Market.AtrWindow
    s"""$barsCte, a1 AS (
       |  SELECT symbol, event_id, datetime,
       |         COALESCE(
       |           GREATEST(high - low,
       |                    abs(high - LAG(close, 1) OVER ($W)),
       |                    abs(low - LAG(close, 1) OVER ($W))),
       |           high - low) AS tr
       |  FROM bars
       |), a2 AS (
       |  SELECT symbol, event_id, datetime, tr,
       |         ${cumSum("tr")} AS _c_tr,
       |         COUNT(tr) OVER ($Wrun) AS _c_tr_n
       |  FROM a1
       |)
       |SELECT symbol, event_id, ${r("tr")} AS tr,
       |       ${r(s"CASE WHEN ${cumGate("_c_tr", n)} THEN (${cumRolling("_c_tr", n)}) / $n END")} AS atr_$n
       |FROM a2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featChandelier (Market.withChandelier, n=22, k=3): the
    * featAtr tree at n=22, native rolling extrema, identical gates and
    * hh − k·atr / ll + k·atr association. */
  val featChandelier: String = {
    val n = graft.features.Market.ChandelierWindow
    val k = graft.features.Market.ChandelierMult
    val fr = frame(n)
    val atr = s"CASE WHEN ${cumGate("_c_tr", n)} THEN (${cumRolling("_c_tr", n)}) / $n END"
    s"""$barsCte, a1 AS (
       |  SELECT symbol, event_id, datetime, high, low,
       |         COALESCE(
       |           GREATEST(high - low,
       |                    abs(high - LAG(close, 1) OVER ($W)),
       |                    abs(low - LAG(close, 1) OVER ($W))),
       |           high - low) AS tr
       |  FROM bars
       |), a2 AS (
       |  SELECT symbol, event_id, datetime, high, low, tr,
       |         ${cumSum("tr")} AS _c_tr,
       |         COUNT(tr) OVER ($Wrun) AS _c_tr_n
       |  FROM a1
       |), a3 AS (
       |  SELECT symbol, event_id, datetime,
       |         COUNT(high) OVER ($fr) AS cnt,
       |         MAX(high) OVER ($fr) AS hh,
       |         MIN(low) OVER ($fr) AS ll,
       |         $atr AS atr
       |  FROM a2
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN cnt = $n AND atr IS NOT NULL THEN hh - $k * atr END")} AS chandelier_long,
       |       ${r(s"CASE WHEN cnt = $n AND atr IS NOT NULL THEN ll + $k * atr END")} AS chandelier_short
       |FROM a3 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featStochastic (Market.withStochastic, n=14, smooth=3):
    * rolling MIN/MAX are order-insensitive extrema (bit-portable natively);
    * %D is the explicit left-to-right 3-term sum, null-propagating. */
  val featStochastic: String = {
    val n = graft.features.Market.StochWindow
    s"""$barsCte, s1 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN COUNT(close) OVER (${frame(n)}) = $n
       |                   AND MAX(high) OVER (${frame(n)}) > MIN(low) OVER (${frame(n)})
       |              THEN (close - MIN(low) OVER (${frame(n)})) /
       |                   (MAX(high) OVER (${frame(n)}) - MIN(low) OVER (${frame(n)})) * 100
       |         END AS pct_k
       |  FROM bars
       |)
       |SELECT symbol, event_id, ${r("pct_k")} AS pct_k,
       |       ${r(s"(pct_k + LAG(pct_k, 1) OVER ($W) + LAG(pct_k, 2) OVER ($W)) / ${graft.features.Market.StochSmooth}")} AS pct_d
       |FROM s1 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featWilliamsR (Market.withWilliamsR, n=14): the same
    * order-insensitive rolling extrema and full-frame/flat-frame gating as
    * featStochastic, numerator flipped to (hh − close) and scaled −100. */
  val featWilliamsR: String = {
    val n = graft.features.Market.StochWindow
    s"""$barsCte
       |SELECT symbol, event_id,
       |       ${r(s"""CASE WHEN COUNT(close) OVER (${frame(n)}) = $n
       |                 AND MAX(high) OVER (${frame(n)}) > MIN(low) OVER (${frame(n)})
       |            THEN (MAX(high) OVER (${frame(n)}) - close) /
       |                 (MAX(high) OVER (${frame(n)}) - MIN(low) OVER (${frame(n)})) * -100
       |       END""")} AS williams_r
       |FROM bars ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featAmihud (Market.withAmihud, n=20): null-skipping
    * running sums (list_sum over the frame-ordered list == Spark's
    * windowed sum), row-count vs non-null-count gating, mean over the
    * non-null count. */
  val featAmihud: String = {
    val n = graft.features.Market.AmihudWindow
    s"""$barsCte, i0 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN close * volume > 0.0
       |              THEN abs((close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W))
       |                   / (close * volume) * 1000000.0 END AS ilq
       |  FROM bars
       |), i1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("ilq")} AS _c_ilq,
       |         COUNT(ilq) OVER ($Wrun) AS _c_ilq_n,
       |         CAST(COUNT(*) OVER ($Wrun) AS DOUBLE) AS _c_one
       |  FROM i0
       |), i2 AS (
       |  SELECT symbol, event_id,
       |         _c_one - COALESCE(LAG(_c_one, $n) OVER ($W), 0.0) AS rows_n,
       |         _c_ilq_n - COALESCE(LAG(_c_ilq_n, $n) OVER ($W), 0) AS cnt,
       |         ${cumRolling("_c_ilq", n)} AS ssum
       |  FROM i1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN rows_n = $n.0 AND cnt > 0 THEN ssum / cnt END")} AS amihud_$n
       |FROM i2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featRollSpread (Market.withRollSpread, n=20): the
    * autocorrelation oracle's cum−lag machinery with nulls KEPT in-frame
    * (list_sum skips them exactly like Spark's windowed sum); population
    * covariance, spread only when cov < 0. */
  val featRollSpread: String = {
    val n = graft.features.Market.RollWindow
    val nD = s"$n.0"
    s"""$barsCte, p0 AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS dp
       |  FROM bars
       |), p1 AS (
       |  SELECT symbol, event_id, datetime, dp,
       |         LAG(dp, 1) OVER ($W) AS dpl
       |  FROM p0
       |), p2 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN dp IS NOT NULL AND dpl IS NOT NULL
       |              THEN dp * dpl END AS xy,
       |         CASE WHEN dpl IS NOT NULL THEN dp END AS x,
       |         dpl AS y
       |  FROM p1
       |), p3 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("x")} AS _c_rx,
       |         ${cumSum("y")} AS _c_ry,
       |         ${cumSum("xy")} AS _c_rxy,
       |         COUNT(xy) OVER ($Wrun) AS _c_rxy_n
       |  FROM p2
       |), p4 AS (
       |  SELECT symbol, event_id,
       |         ($nD * (${cumRolling("_c_rxy", n)}) -
       |          (${cumRolling("_c_rx", n)}) * (${cumRolling("_c_ry", n)})) /
       |         ($nD * $nD) AS cov,
       |         ${cumGate("_c_rxy", n)} AS g
       |  FROM p3
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g AND cov < 0.0 THEN 2.0 * sqrt(-cov) END")} AS roll_spread_$n
       |FROM p4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featAroon (Market.withAroon, n=25): gather the frame
    * once per row (list OVER, frame-ordered like the CCI array) and
    * locate the most recent extremum via list_position(list_reverse) —
    * identical tie resolution to Spark's array_position(reverse). The
    * only doubles are exact integer positions scaled at the end. */
  val featAroon: String = {
    val n = graft.features.Market.AroonWindow
    val f = frame(n)
    s"""$barsCte, ar1 AS (
       |  SELECT symbol, event_id,
       |         CASE WHEN COUNT(close) OVER ($f) = $n
       |              THEN list(high) OVER ($f) END AS ah,
       |         CASE WHEN COUNT(close) OVER ($f) = $n
       |              THEN list(low) OVER ($f) END AS al
       |  FROM bars
       |), ar2 AS (
       |  SELECT symbol, event_id,
       |         ($n.0 - CAST(list_position(list_reverse(ah), list_max(ah)) - 1 AS DOUBLE)) * 100.0 / $n AS up,
       |         ($n.0 - CAST(list_position(list_reverse(al), list_min(al)) - 1 AS DOUBLE)) * 100.0 / $n AS dn
       |  FROM ar1
       |)
       |SELECT symbol, event_id,
       |       ${r("up")} AS aroon_up, ${r("dn")} AS aroon_down,
       |       ${r("up - dn")} AS aroon_osc
       |FROM ar2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featVortex (Market.withVortex, n=14): first-bar-NULL
    * true range (the ADX seeding), null-skipping running sums via the
    * cum−lag identity, gate on n non-null ranges with a positive sum. */
  val featVortex: String = {
    val n = graft.features.Market.VortexWindow
    s"""$barsCte, v0 AS (
       |  SELECT symbol, event_id, datetime,
       |         abs(high - LAG(low, 1) OVER ($W)) AS vmp,
       |         abs(low - LAG(high, 1) OVER ($W)) AS vmm,
       |         CASE WHEN LAG(close, 1) OVER ($W) IS NOT NULL
       |              THEN GREATEST(high - low,
       |                            abs(high - LAG(close, 1) OVER ($W)),
       |                            abs(low - LAG(close, 1) OVER ($W))) END AS vtr
       |  FROM bars
       |), v1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("vmp")} AS _c_vmp,
       |         ${cumSum("vmm")} AS _c_vmm,
       |         ${cumSum("vtr")} AS _c_vtr,
       |         COUNT(vtr) OVER ($Wrun) AS _c_vtr_n
       |  FROM v0
       |), v2 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_vtr", n)} AS str,
       |         ${cumRolling("_c_vmp", n)} AS smp,
       |         ${cumRolling("_c_vmm", n)} AS smm,
       |         ${cumGate("_c_vtr", n)} AS g
       |  FROM v1
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g AND str > 0.0 THEN smp / str END")} AS vi_plus,
       |       ${r("CASE WHEN g AND str > 0.0 THEN smm / str END")} AS vi_minus
       |FROM v2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featCmf (Market.withCmf, n=20): flat bars contribute
    * a 0 money-flow multiplier; cum−lag rolling sums, gate on n rows
    * with positive rolling volume. */
  val featCmf: String = {
    val n = graft.features.Market.CmfWindow
    s"""$barsCte, c0 AS (
       |  SELECT symbol, event_id, datetime, volume,
       |         CASE WHEN high > low
       |              THEN ((close - low) - (high - close)) / (high - low)
       |              ELSE 0.0 END * volume AS mfv
       |  FROM bars
       |), c1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("mfv")} AS _c_mfv,
       |         ${cumSum("volume")} AS _c_cv,
       |         COUNT(volume) OVER ($Wrun) AS _c_cv_n
       |  FROM c0
       |), c2 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_mfv", n)} AS fs,
       |         ${cumRolling("_c_cv", n)} AS vs,
       |         ${cumGate("_c_cv", n)} AS g
       |  FROM c1
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g AND vs > 0.0 THEN fs / vs END")} AS cmf_$n
       |FROM c2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featRangeVol (Market.withRangeVol, n=20): the
    * Parkinson/Garman–Klass constants are the SAME Scala-computed double
    * literals on both engines; logs are total (prices > 0); cum−lag
    * rolling means; GK NULL where its frame mean goes negative. */
  val featRangeVol: String = {
    val n = graft.features.Market.RangeVolWindow
    val fourLn2 = graft.features.Market.FourLn2
    val gk = graft.features.Market.GkCoef
    s"""$barsCte, rvl AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN high > 0.0 AND low > 0.0 THEN ln(high / low) END AS lhl,
       |         CASE WHEN close > 0.0 AND open > 0.0 THEN ln(close / open) END AS lco
       |  FROM bars
       |), rv0 AS (
       |  SELECT symbol, event_id, datetime,
       |         lhl * lhl AS hl2,
       |         0.5 * (lhl * lhl) - $gk * (lco * lco) AS gkt
       |  FROM rvl
       |), rv1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("hl2")} AS _c_hl2,
       |         COUNT(hl2) OVER ($Wrun) AS _c_hl2_n,
       |         ${cumSum("gkt")} AS _c_gkt
       |  FROM rv0
       |), rv2 AS (
       |  SELECT symbol, event_id,
       |         (${cumRolling("_c_hl2", n)}) / $n / $fourLn2 AS pm,
       |         (${cumRolling("_c_gkt", n)}) / $n AS gm,
       |         ${cumGate("_c_hl2", n)} AS g
       |  FROM rv1
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g THEN sqrt(pm) END")} AS parkinson_$n,
       |       ${r("CASE WHEN g AND gm >= 0.0 THEN sqrt(gm) END")} AS garman_klass_$n
       |FROM rv2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featUlcer (Market.withUlcer, n=14): order-insensitive
    * rolling MAX drawdown base, squared-drawdown rolling mean via the
    * cum−lag identity counting non-null dd² only (2n−1 bar warm-up). */
  val featUlcer: String = {
    val n = graft.features.Market.UlcerWindow
    val f = frame(n)
    s"""$barsCte, u0 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN COUNT(close) OVER ($f) = $n
       |                   AND MAX(close) OVER ($f) > 0.0
       |              THEN (close - MAX(close) OVER ($f)) / MAX(close) OVER ($f) * 100.0
       |         END AS dd
       |  FROM bars
       |), u1 AS (
       |  SELECT symbol, event_id, datetime, dd * dd AS dd2
       |  FROM u0
       |), u2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("dd2")} AS _c_dd2,
       |         COUNT(dd2) OVER ($Wrun) AS _c_dd2_n
       |  FROM u1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN ${cumGate("_c_dd2", n)} THEN sqrt((${cumRolling("_c_dd2", n)}) / $n) END")} AS ulcer_$n
       |FROM u2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featTrix (Market.withTrix, span=15): three chained
    * recursive-CTE replays of the adjust=true EWMA recurrence (the
    * featMacd machinery applied to its own output twice), then the
    * 1-bar rate of change of the third smoothing. */
  val featTrix: String = {
    val n = graft.features.Market.TrixSpan
    val dn = d(n)
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), e1 AS (
       |  SELECT symbol, rn, close AS nf, CAST(1.0 AS DOUBLE) AS df FROM x1 WHERE rn = 1
       |  UNION ALL
       |  SELECT x1.symbol, x1.rn, e1.nf * $dn + x1.close, e1.df * $dn + 1.0
       |  FROM e1 JOIN x1 ON x1.symbol = e1.symbol AND x1.rn = e1.rn + 1
       |), m1 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v1 FROM e1
       |), e2 AS (
       |  SELECT symbol, rn, v1 AS nf, CAST(1.0 AS DOUBLE) AS df FROM m1 WHERE rn = 1
       |  UNION ALL
       |  SELECT m1.symbol, m1.rn, e2.nf * $dn + m1.v1, e2.df * $dn + 1.0
       |  FROM e2 JOIN m1 ON m1.symbol = e2.symbol AND m1.rn = e2.rn + 1
       |), m2 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v2 FROM e2
       |), e3 AS (
       |  SELECT symbol, rn, v2 AS nf, CAST(1.0 AS DOUBLE) AS df FROM m2 WHERE rn = 1
       |  UNION ALL
       |  SELECT m2.symbol, m2.rn, e3.nf * $dn + m2.v2, e3.df * $dn + 1.0
       |  FROM e3 JOIN m2 ON m2.symbol = e3.symbol AND m2.rn = e3.rn + 1
       |), m3 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v3 FROM e3
       |), tt AS (
       |  SELECT symbol, rn, v3,
       |         LAG(v3, 1) OVER (PARTITION BY symbol ORDER BY rn) AS pv
       |  FROM m3
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("CASE WHEN pv IS NOT NULL AND pv <> 0.0 THEN (v3 - pv) / pv * 100.0 END")} AS trix
       |FROM x1 JOIN tt ON tt.symbol = x1.symbol AND tt.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featTsi (Market.withTsi): momentum and |momentum| share
    * null positions, so their adjust=true EWMA chains share ONE df
    * accumulator per stage — the recursions replay (nf, anf, df) seeded at
    * rn = 2 (mom is null on bar 1), exactly the Ewma expression's
    * leading-null semantics. LEFT JOIN emits NULL tsi on bar 1. */
  val featTsi: String = {
    import graft.features.Market._
    val dL = d(TsiLong)
    val dS = d(TsiShort)
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), m0 AS MATERIALIZED (
       |  SELECT symbol, rn,
       |         close - LAG(close, 1) OVER (PARTITION BY symbol ORDER BY rn) AS mom
       |  FROM x1
       |), e1 AS (
       |  SELECT symbol, rn, mom AS nf, abs(mom) AS anf, CAST(1.0 AS DOUBLE) AS df
       |  FROM m0 WHERE rn = 2
       |  UNION ALL
       |  SELECT m0.symbol, m0.rn,
       |         e1.nf * $dL + m0.mom, e1.anf * $dL + abs(m0.mom), e1.df * $dL + 1.0
       |  FROM e1 JOIN m0 ON m0.symbol = e1.symbol AND m0.rn = e1.rn + 1
       |), m1 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v, anf / df AS av FROM e1
       |), e2 AS (
       |  SELECT symbol, rn, v AS nf, av AS anf, CAST(1.0 AS DOUBLE) AS df
       |  FROM m1 WHERE rn = 2
       |  UNION ALL
       |  SELECT m1.symbol, m1.rn,
       |         e2.nf * $dS + m1.v, e2.anf * $dS + m1.av, e2.df * $dS + 1.0
       |  FROM e2 JOIN m1 ON m1.symbol = e2.symbol AND m1.rn = e2.rn + 1
       |), tt AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS e2v, anf / df AS ae2v FROM e2
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("CASE WHEN ae2v IS NOT NULL AND ae2v <> 0.0 THEN e2v / ae2v * 100.0 END")} AS tsi
       |FROM x1 LEFT JOIN tt ON tt.symbol = x1.symbol AND tt.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featPpo (Market.withPpo): the MACD fast/slow pair with
    * the slow-EMA normalization; the signal recursion seeds at each
    * symbol's FIRST NON-NULL ppo (running COUNT(ppo) = 1) and skips null
    * inputs with the state untouched — the Ewma expression's null
    * semantics, which matter because a leading close of exactly 0 (sf0.1
    * events carry value = 0 rows) nulls ppo until the first positive
    * close. */
  private def ppoLikeSql(src: String, pfx: String): String = {
    import graft.features.Market._
    val f = d(PpoFast)
    val sl = d(PpoSlow)
    val sg = d(PpoSignal)
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, $src AS v, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), emas AS (
       |  SELECT symbol, rn, v AS nf, CAST(1.0 AS DOUBLE) AS df,
       |         v AS ns, CAST(1.0 AS DOUBLE) AS ds
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         emas.nf * $f + b2.v,  emas.df * $f + 1.0,
       |         emas.ns * $sl + b2.v, emas.ds * $sl + 1.0
       |  FROM emas JOIN b2 ON b2.symbol = emas.symbol AND b2.rn = emas.rn + 1
       |), m AS MATERIALIZED (
       |  SELECT symbol, rn,
       |         CASE WHEN ns / ds <> 0.0
       |              THEN (nf / df - ns / ds) / (ns / ds) * 100.0 END AS ppo,
       |         COUNT(CASE WHEN ns / ds <> 0.0 THEN 1 END)
       |           OVER (PARTITION BY symbol ORDER BY rn) AS nn
       |  FROM emas
       |), sig AS (
       |  SELECT symbol, rn, ppo, ppo AS sn, CAST(1.0 AS DOUBLE) AS sd
       |  FROM m WHERE ppo IS NOT NULL AND nn = 1
       |  UNION ALL
       |  SELECT m.symbol, m.rn, m.ppo,
       |         CASE WHEN m.ppo IS NULL THEN sig.sn ELSE sig.sn * $sg + m.ppo END,
       |         CASE WHEN m.ppo IS NULL THEN sig.sd ELSE sig.sd * $sg + 1.0 END
       |  FROM sig JOIN m ON m.symbol = sig.symbol AND m.rn = sig.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("sig.ppo")} AS $pfx,
       |       ${r("sig.sn / sig.sd")} AS ${pfx}_signal,
       |       ${r("sig.ppo - sig.sn / sig.sd")} AS ${pfx}_hist
       |FROM b2 LEFT JOIN sig ON sig.symbol = b2.symbol AND sig.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  val featPpo: String = ppoLikeSql("close", "ppo")

  /** Mirrors Core.featPvo (Market.withPvo): the PPO recursion over volume
    * — the zero-EMA guard and first-non-null signal seeding are live here
    * (volume hits 0). */
  val featPvo: String = ppoLikeSql("volume", "pvo")

  /** Mirrors Core.featKlinger (Market.withKlinger): volume force
    * vf = volume · sign(Δhlc3) is null on bar 1, so the fast/slow EMA
    * pair seeds at rn = 2 (one recursion, shared df — identical null
    * positions) and the signal chain seeds at rn = 2 over the derived
    * kvo. */
  val featKlinger: String = {
    import graft.features.Market._
    val f = d(KlingerFast)
    val sl = d(KlingerSlow)
    val sg = d(KlingerSignal)
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, ROW_NUMBER() OVER ($W) AS rn,
       |         (high + low + close) / 3.0 AS hlc3, volume
       |  FROM bars
       |), v0 AS MATERIALIZED (
       |  SELECT symbol, rn,
       |         volume * sign(hlc3 - LAG(hlc3, 1)
       |           OVER (PARTITION BY symbol ORDER BY rn)) AS vf
       |  FROM x1
       |), e1 AS (
       |  SELECT symbol, rn, vf AS nf, CAST(1.0 AS DOUBLE) AS df,
       |         vf AS ns, CAST(1.0 AS DOUBLE) AS ds
       |  FROM v0 WHERE rn = 2
       |  UNION ALL
       |  SELECT v0.symbol, v0.rn,
       |         e1.nf * $f + v0.vf,  e1.df * $f + 1.0,
       |         e1.ns * $sl + v0.vf, e1.ds * $sl + 1.0
       |  FROM e1 JOIN v0 ON v0.symbol = e1.symbol AND v0.rn = e1.rn + 1
       |), m AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df - ns / ds AS kvo FROM e1
       |), sig AS (
       |  SELECT symbol, rn, kvo, kvo AS sn, CAST(1.0 AS DOUBLE) AS sd
       |  FROM m WHERE rn = 2
       |  UNION ALL
       |  SELECT m.symbol, m.rn, m.kvo,
       |         sig.sn * $sg + m.kvo, sig.sd * $sg + 1.0
       |  FROM sig JOIN m ON m.symbol = sig.symbol AND m.rn = sig.rn + 1
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("sig.kvo")} AS kvo,
       |       ${r("sig.sn / sig.sd")} AS klinger_signal
       |FROM x1 LEFT JOIN sig ON sig.symbol = x1.symbol AND sig.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featAlligator (Market.withAlligator): the three Wilder
    * SMMA recursions (adjust=false, α=1/n — seed y₁=x₁, step
    * prev·(1−α) + α·x in that association order, matching the Ewma
    * expression) replayed in ONE recursive CTE with three accumulators,
    * then the same causal lag displacements. */
  val featAlligator: String = {
    import graft.features.Market._
    def al(n: Int) = (1.0 / n).toString
    def dl(n: Int) = (1.0 - 1.0 / n).toString
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, (high + low) / 2.0 AS mp,
       |         ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), ew AS (
       |  SELECT symbol, rn, mp AS j, mp AS t, mp AS l FROM x1 WHERE rn = 1
       |  UNION ALL
       |  SELECT x1.symbol, x1.rn,
       |         ew.j * ${dl(AlligatorJaw)} + ${al(AlligatorJaw)} * x1.mp,
       |         ew.t * ${dl(AlligatorTeeth)} + ${al(AlligatorTeeth)} * x1.mp,
       |         ew.l * ${dl(AlligatorLips)} + ${al(AlligatorLips)} * x1.mp
       |  FROM ew JOIN x1 ON x1.symbol = ew.symbol AND x1.rn = ew.rn + 1
       |), sh AS (
       |  SELECT symbol, rn,
       |         LAG(j, $AlligatorJawShift) OVER (PARTITION BY symbol ORDER BY rn) AS jaw,
       |         LAG(t, $AlligatorTeethShift) OVER (PARTITION BY symbol ORDER BY rn) AS teeth,
       |         LAG(l, $AlligatorLipsShift) OVER (PARTITION BY symbol ORDER BY rn) AS lips
       |  FROM ew
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("sh.jaw")} AS alligator_jaw,
       |       ${r("sh.teeth")} AS alligator_teeth,
       |       ${r("sh.lips")} AS alligator_lips
       |FROM x1 JOIN sh ON sh.symbol = x1.symbol AND sh.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featMassIndex (Market.withMassIndex): the same two
    * chained adjust=true EMA₉ recursions over high−low, the identical
    * zero-guard on the smoothed denominator, and the rolling 25-sum as
    * cum − lag(cum, 25) where the running cum is a SEQUENTIAL list fold
    * (Spark's window Sum is strictly incremental; DuckDB's native
    * windowed SUM pairwise-associates and would drift). */
  val featMassIndex: String = {
    val n = graft.features.Market.MassSpan
    val win = graft.features.Market.MassWindow
    val dn = d(n)
    val wr = "PARTITION BY symbol ORDER BY rn"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, high - low AS rng, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), e1 AS (
       |  SELECT symbol, rn, rng AS nf, CAST(1.0 AS DOUBLE) AS df FROM x1 WHERE rn = 1
       |  UNION ALL
       |  SELECT x1.symbol, x1.rn, e1.nf * $dn + x1.rng, e1.df * $dn + 1.0
       |  FROM e1 JOIN x1 ON x1.symbol = e1.symbol AND x1.rn = e1.rn + 1
       |), m1 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v1 FROM e1
       |), e2 AS (
       |  SELECT symbol, rn, v1 AS nf, CAST(1.0 AS DOUBLE) AS df FROM m1 WHERE rn = 1
       |  UNION ALL
       |  SELECT m1.symbol, m1.rn, e2.nf * $dn + m1.v1, e2.df * $dn + 1.0
       |  FROM e2 JOIN m1 ON m1.symbol = e2.symbol AND m1.rn = e2.rn + 1
       |), m2 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v2 FROM e2
       |), rt AS MATERIALIZED (
       |  SELECT m1.symbol, m1.rn,
       |         CASE WHEN m2.v2 <> 0.0 THEN m1.v1 / m2.v2 END AS ratio
       |  FROM m1 JOIN m2 ON m2.symbol = m1.symbol AND m2.rn = m1.rn
       |), cm AS (
       |  SELECT symbol, rn,
       |         COALESCE(list_sum(list(ratio) OVER ($wr
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 0.0)
       |           AS cum
       |  FROM rt
       |), mx AS (
       |  SELECT symbol, rn,
       |         CASE WHEN rn >= $win
       |              THEN cum - COALESCE(LAG(cum, $win) OVER ($wr), 0.0)
       |         END AS mass_index
       |  FROM cm
       |)
       |SELECT x1.symbol, x1.event_id, ${r("mx.mass_index")} AS mass_index
       |FROM x1 JOIN mx ON mx.symbol = x1.symbol AND mx.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featDemaTema (Market.withDemaTema, span=20): the same
    * three chained adjust=true EMA recursions as featTrix, combined with
    * the identical association order (2·v1 − v2; (3·v1 − 3·v2) + v3). */
  val featDemaTema: String = {
    val n = graft.features.Market.DemaSpan
    val dn = d(n)
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), e1 AS (
       |  SELECT symbol, rn, close AS nf, CAST(1.0 AS DOUBLE) AS df FROM x1 WHERE rn = 1
       |  UNION ALL
       |  SELECT x1.symbol, x1.rn, e1.nf * $dn + x1.close, e1.df * $dn + 1.0
       |  FROM e1 JOIN x1 ON x1.symbol = e1.symbol AND x1.rn = e1.rn + 1
       |), m1 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v1 FROM e1
       |), e2 AS (
       |  SELECT symbol, rn, v1 AS nf, CAST(1.0 AS DOUBLE) AS df FROM m1 WHERE rn = 1
       |  UNION ALL
       |  SELECT m1.symbol, m1.rn, e2.nf * $dn + m1.v1, e2.df * $dn + 1.0
       |  FROM e2 JOIN m1 ON m1.symbol = e2.symbol AND m1.rn = e2.rn + 1
       |), m2 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v2 FROM e2
       |), e3 AS (
       |  SELECT symbol, rn, v2 AS nf, CAST(1.0 AS DOUBLE) AS df FROM m2 WHERE rn = 1
       |  UNION ALL
       |  SELECT m2.symbol, m2.rn, e3.nf * $dn + m2.v2, e3.df * $dn + 1.0
       |  FROM e3 JOIN m2 ON m2.symbol = e3.symbol AND m2.rn = e3.rn + 1
       |), m3 AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df AS v3 FROM e3
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("2.0 * v1 - v2")} AS dema_$n,
       |       ${r("3.0 * v1 - 3.0 * v2 + v3")} AS tema_$n
       |FROM x1
       |JOIN m1 ON m1.symbol = x1.symbol AND m1.rn = x1.rn
       |JOIN m2 ON m2.symbol = x1.symbol AND m2.rn = x1.rn
       |JOIN m3 ON m3.symbol = x1.symbol AND m3.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Core.featChande (Market.withChande, n=14): null-propagating
    * up/down deltas, both rolling sums via the sequential cum−lag fold,
    * flat-frame (Σup+Σdn = 0) gated like the Spark side. */
  val featChande: String = {
    val n = Params.ChandeWindow
    s"""$barsCte, c1 AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), c2 AS (
       |  SELECT symbol, event_id, datetime,
       |         CAST(delta > 0 AS DOUBLE) * delta AS _up,
       |         CAST(delta < 0 AS DOUBLE) * (-delta) AS _dn
       |  FROM c1
       |), c3 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("_up")} AS _c_up,
       |         COUNT(_up) OVER ($Wrun) AS _c_up_n,
       |         ${cumSum("_dn")} AS _c_dn
       |  FROM c2
       |), c4 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_up", n)} AS su,
       |         ${cumRolling("_c_dn", n)} AS sd,
       |         ${cumGate("_c_up", n)} AS g
       |  FROM c3
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN g AND (su + sd) > 0.0 THEN (su - sd) / (su + sd) * 100.0 END")} AS cmo_$n
       |FROM c4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featDpo (Market.withDpo, n=20, shift=11): displaced lag
    * minus the cum−lag rolling mean, both gates mirrored. */
  val featDpo: String = {
    val n = Params.DpoWindow
    val shift = n / 2 + 1
    s"""$barsCte, dp1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_dc,
       |         COUNT(close) OVER ($Wrun) AS _c_dc_n
       |  FROM bars
       |), dp2 AS (
       |  SELECT symbol, event_id,
       |         LAG(close, $shift) OVER ($W) AS shifted,
       |         ${cumRolling("_c_dc", n)} AS sm,
       |         ${cumGate("_c_dc", n)} AS g
       |  FROM dp1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN g AND shifted IS NOT NULL THEN shifted - sm / $n END")} AS dpo_$n
       |FROM dp2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featElderRay (Market.withElderRay, span=13): the
    * adjust=true num/den EWMA recurrence replayed recursively (same
    * per-step tree as the Ewma expression), bull/bear as high/low minus
    * the evaluated num/den. */
  val featElderRay: String = {
    val sp = Params.ElderSpan
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, high, low, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), em AS (
       |  SELECT symbol, rn, close AS nm, CAST(1.0 AS DOUBLE) AS dd FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         em.nm * ${d(sp)} + b2.close, em.dd * ${d(sp)} + 1.0
       |  FROM em JOIN b2 ON b2.symbol = em.symbol AND b2.rn = em.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("em.nm / em.dd")} AS ema_$sp,
       |       ${r("b2.high - em.nm / em.dd")} AS elder_bull,
       |       ${r("b2.low - em.nm / em.dd")} AS elder_bear
       |FROM b2 JOIN em ON em.symbol = b2.symbol AND em.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.featHeikinAshi (Market.withHeikinAshi): ha_close narrow,
    * the ha_open recursion replayed as v·0.5 + 0.5·x — the EXACT
    * adjust=false α=0.5 Ewma tree the Spark side evaluates — seeded with
    * x₁ = (open₁+close₁)/2 at rn=1. */
  val featHeikinAshi: String =
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, h1 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, open, high, low, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         (open + high + low + close) / 4.0 AS ha_close
       |  FROM bars
       |), h2 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, high, low, ha_close,
       |         COALESCE(LAG(ha_close, 1) OVER ($W), (open + close) / 2.0) AS x
       |  FROM h1
       |), ho AS (
       |  SELECT symbol, rn, x AS v FROM h2 WHERE rn = 1
       |  UNION ALL
       |  SELECT h2.symbol, h2.rn, ho.v * 0.5 + 0.5 * h2.x
       |  FROM ho JOIN h2 ON h2.symbol = ho.symbol AND h2.rn = ho.rn + 1
       |)
       |SELECT h2.symbol, h2.event_id,
       |       ${r("ho.v")} AS ha_open,
       |       ${r("GREATEST(h2.high, ho.v, h2.ha_close)")} AS ha_high,
       |       ${r("LEAST(h2.low, ho.v, h2.ha_close)")} AS ha_low,
       |       ${r("h2.ha_close")} AS ha_close
       |FROM h2 JOIN ho ON ho.symbol = h2.symbol AND ho.rn = h2.rn
       |ORDER BY h2.event_id""".stripMargin

  /** Mirrors Core.featSqueeze (Market.withSqueeze, n=20): Bollinger's
    * exact cum−lag chain composed with the original-form Keltner (SMA of
    * typical price ± SMA of range); the squeeze flag compares the same
    * unrounded doubles. */
  val featSqueeze: String = {
    val n = Params.BbPeriod
    val k = Params.BbStd
    s"""$barsCte, sq1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_bc,
       |         COUNT(close) OVER ($Wrun) AS _c_bc_n,
       |         ${cumSum("close * close")} AS _c_bc2,
       |         ${cumSum("(high + low + close) / 3.0")} AS _c_tp,
       |         COUNT((high + low + close) / 3.0) OVER ($Wrun) AS _c_tp_n,
       |         ${cumSum("high - low")} AS _c_rg
       |  FROM bars
       |), sq2 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_bc", n)} AS s1,
       |         ${cumRolling("_c_bc2", n)} AS s2,
       |         ${cumGate("_c_bc", n)} AS g1,
       |         ${cumRolling("_c_tp", n)} AS stp,
       |         ${cumRolling("_c_rg", n)} AS srg,
       |         ${cumGate("_c_tp", n)} AS g2
       |  FROM sq1
       |), sq3 AS (
       |  SELECT symbol, event_id,
       |         CASE WHEN g1 THEN s1 / $n END AS mid,
       |         CASE WHEN g1 THEN sqrt(greatest((s2 - s1 * s1 / $n) / ${n - 1}, 0.0)) END AS sd,
       |         CASE WHEN g2 THEN stp / $n END AS kmid,
       |         CASE WHEN g2 THEN srg / $n END AS band
       |  FROM sq2
       |)
       |SELECT symbol, event_id,
       |       ${r(s"mid + sd * $k")} AS bb_upper,
       |       ${r(s"mid - sd * $k")} AS bb_lower,
       |       ${r("kmid + band")} AS kel_high,
       |       ${r("kmid - band")} AS kel_low,
       |       CAST(mid + sd * $k < (kmid + band) AND mid - sd * $k > (kmid - band) AS INT) AS squeeze_on
       |FROM sq3 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.funnelSessions (gap=30min): identical session
    * numbering and the three chained conditional-min windows — all
    * integer µs, exact on both engines. */
  val funnelSessions: String = {
    val gapUs = 30L * 60L * 1000000L
    val Wu = "PARTITION BY user_id ORDER BY ts, event_id"
    val Ws = "PARTITION BY user_id, session_idx"
    s"""WITH f AS (
       |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
       |         CASE WHEN LAG(ts, 1) OVER ($Wu) IS NULL
       |                OR epoch_us(ts) - epoch_us(LAG(ts, 1) OVER ($Wu)) > $gapUs
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |), fs AS (
       |  SELECT *, CAST(SUM(new_s) OVER ($Wu
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM f
       |), t1 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
       |              OVER ($Ws) AS _t1 FROM fs
       |), t2 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'click' AND us >= _t1 THEN us END)
       |              OVER ($Ws) AS _t2 FROM t1
       |), t3 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us >= _t2 THEN us END)
       |              OVER ($Ws) AS _t3 FROM t2
       |)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |       MAX(CAST(_t1 IS NOT NULL AS INT)) AS reached_view,
       |       MAX(CAST(_t2 IS NOT NULL AS INT)) AS reached_click,
       |       MAX(CAST(_t3 IS NOT NULL AS INT)) AS reached_purchase
       |FROM t3 GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin
  }

  /** Mirrors Core.featUnderwater: running extrema + flagged-row-number
    * max — all order-insensitive, bit-portable natively. */
  val featUnderwater: String =
    s"""$barsCte, u1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         MAX(close) OVER ($Wrun) AS peak
       |  FROM bars
       |), u2 AS (
       |  SELECT symbol, event_id, close, rn, peak,
       |         MAX(CASE WHEN close >= peak THEN rn END) OVER ($Wrun) AS peak_rn
       |  FROM u1
       |)
       |SELECT symbol, event_id, ${r("peak")} AS peak,
       |       rn - peak_rn AS underwater_bars,
       |       CAST(close < peak AS INT) AS is_underwater
       |FROM u2 ORDER BY event_id""".stripMargin

  /** Mirrors Core.featVwma (Market.withVwma, n=20): two sequential cums,
    * cum−lag rolling, both divisions gated like the Spark tree. */
  val featVwma: String = {
    val n = graft.features.Market.VwmaWindow
    s"""$barsCte, v1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close * volume")} AS _c_cv,
       |         COUNT(close * volume) OVER ($Wrun) AS _c_cv_n,
       |         ${cumSum("volume")} AS _c_vl,
       |         COUNT(volume) OVER ($Wrun) AS _c_vl_n
       |  FROM bars
       |), v2 AS (
       |  SELECT symbol, event_id, close,
       |         CASE WHEN ${cumGate("_c_cv", n)}
       |                   AND (${cumRolling("_c_vl", n)}) > 0.0
       |              THEN (${cumRolling("_c_cv", n)}) / (${cumRolling("_c_vl", n)})
       |         END AS vwma
       |  FROM v1
       |)
       |SELECT symbol, event_id, ${r("vwma")} AS vwma_$n,
       |       ${r("CASE WHEN vwma <> 0.0 THEN (close - vwma) / vwma * 100 END")} AS vwma_distance
       |FROM v2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featEom (Market.withEom, n=14): lag-diff of the bar
    * midpoint, the inverted box-ratio product in the same left-associated
    * order, volume>0 division gate, then the gated cum−lag SMA. */
  val featEom: String = {
    val n = graft.features.Market.EomWindow
    s"""$barsCte, e1 AS (
       |  SELECT symbol, event_id, datetime, high, low, volume,
       |         (high + low) / 2.0 - LAG((high + low) / 2.0, 1) OVER ($W) AS _dm
       |  FROM bars
       |), e2 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN volume > 0.0
       |              THEN _dm * (high - low + $eps) * ${graft.features.Market.EomScale} / volume
       |         END AS emv
       |  FROM e1
       |), e3 AS (
       |  SELECT symbol, event_id, datetime, emv,
       |         ${cumSum("emv")} AS _c_emv,
       |         COUNT(emv) OVER ($Wrun) AS _c_emv_n
       |  FROM e2
       |)
       |SELECT symbol, event_id, ${r("emv")} AS emv,
       |       ${r(s"CASE WHEN ${cumGate("_c_emv", n)} THEN (${cumRolling("_c_emv", n)}) / $n END")} AS emv_sma_$n
       |FROM e3 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featQstick (Market.withQstick, n=10): candle body, an
    * integer CASE sign, and the gated cum−lag body SMA. */
  val featQstick: String = {
    val n = graft.features.Market.QstickWindow
    s"""$barsCte, q1 AS (
       |  SELECT symbol, event_id, datetime, close - open AS body
       |  FROM bars
       |), q2 AS (
       |  SELECT symbol, event_id, datetime, body,
       |         CASE WHEN body > 0.0 THEN 1 WHEN body < 0.0 THEN -1 ELSE 0 END AS direction,
       |         ${cumSum("body")} AS _c_body,
       |         COUNT(body) OVER ($Wrun) AS _c_body_n
       |  FROM q1
       |)
       |SELECT symbol, event_id, ${r("body")} AS body, direction,
       |       ${r(s"CASE WHEN ${cumGate("_c_body", n)} THEN (${cumRolling("_c_body", n)}) / $n END")} AS qstick_$n
       |FROM q2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featVhf (Market.withVhf, n=28): order-insensitive window
    * extrema over the n-row frame, sequential cum−lag path length, the
    * non-zero-path gate ahead of the division. */
  val featVhf: String = {
    val n = graft.features.Market.VhfWindow
    s"""$barsCte, h1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         abs(close - LAG(close, 1) OVER ($W)) AS _ad
       |  FROM bars
       |), h2 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("_ad")} AS _c_ad,
       |         COUNT(_ad) OVER ($Wrun) AS _c_ad_n,
       |         MAX(close) OVER (${frame(n)}) AS hh,
       |         MIN(close) OVER (${frame(n)}) AS ll
       |  FROM h1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN ${cumGate("_c_ad", n)} AND (${cumRolling("_c_ad", n)}) > 0.0 THEN (hh - ll) / (${cumRolling("_c_ad", n)}) END")} AS vhf_$n
       |FROM h2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featUltimate (Market.withUltimate, 7/14/28): explicit
    * COALESCE prev-close (no reliance on least/greatest null-skip), two
    * sequential cums serving all three horizons, per-horizon full-window +
    * non-zero-TR gates, NULL propagation through the weighted sum. */
  val featUltimate: String = {
    val Seq(p1, p2, p3) = graft.features.Market.UltimatePeriods
    val pc = s"COALESCE(LAG(close, 1) OVER ($W), close)"
    def avg(n: Int) =
      s"CASE WHEN ${cumGate("_c_bp", n)} AND (${cumRolling("_c_tr", n)}) > 0.0 " +
        s"THEN (${cumRolling("_c_bp", n)}) / (${cumRolling("_c_tr", n)}) END"
    s"""$barsCte, u1 AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LEAST(low, $pc) AS _bp,
       |         GREATEST(high, $pc) - LEAST(low, $pc) AS _tr
       |  FROM bars
       |), u2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("_bp")} AS _c_bp, COUNT(_bp) OVER ($Wrun) AS _c_bp_n,
       |         ${cumSum("_tr")} AS _c_tr, COUNT(_tr) OVER ($Wrun) AS _c_tr_n
       |  FROM u1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"100.0 * (4.0 * ${avg(p1)} + 2.0 * ${avg(p2)} + ${avg(p3)}) / 7.0")} AS ultimate_osc
       |FROM u2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featKst (Market.withKst, ROC 10/15/20/30 → SMA
    * 10/10/10/15, signal 9): four gated cum−lag SMAs, the 1-2-3-4 weighted
    * sum in the identical left-associated order, then the gated signal SMA
    * over the kst stream. */
  val featKst: String = {
    val rocs = graft.features.Market.KstRocPeriods
    val smas = graft.features.Market.KstSmaPeriods
    val sig = graft.features.Market.KstSignal
    val rocExprs = rocs.map(p =>
      s"(close - LAG(close, $p) OVER ($W)) / (LAG(close, $p) OVER ($W) + $eps) * 100 AS _roc_$p")
      .mkString(",\n         ")
    val cums = rocs.flatMap(p => Seq(
      s"${cumSum(s"_roc_$p")} AS _c_roc_$p",
      s"COUNT(_roc_$p) OVER ($Wrun) AS _c_roc_${p}_n")).mkString(",\n         ")
    val rcmas = rocs.zip(smas).map { case (p, sm) =>
      s"CASE WHEN ${cumGate(s"_c_roc_$p", sm)} THEN (${cumRolling(s"_c_roc_$p", sm)}) / $sm END"
    }
    s"""$barsCte, k1 AS (
       |  SELECT symbol, event_id, datetime,
       |         $rocExprs
       |  FROM bars
       |), k2 AS (
       |  SELECT symbol, event_id, datetime,
       |         $cums
       |  FROM k1
       |), k3 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${rcmas(0)} + ${rcmas(1)} * 2.0 + ${rcmas(2)} * 3.0 + ${rcmas(3)} * 4.0 AS kst
       |  FROM k2
       |), k4 AS (
       |  SELECT symbol, event_id, datetime, kst,
       |         ${cumSum("kst")} AS _c_kst, COUNT(kst) OVER ($Wrun) AS _c_kst_n
       |  FROM k3
       |)
       |SELECT symbol, event_id, ${r("kst")} AS kst,
       |       ${r(s"CASE WHEN ${cumGate("_c_kst", sig)} THEN (${cumRolling("_c_kst", sig)}) / $sig END")} AS kst_signal
       |FROM k4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.windowStreak: gaps-and-islands run lengths — pure
    * integer/string window arithmetic, no rounding anywhere. */
  val windowStreak: String =
    s"""$barsCte, t1 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN close > LAG(close, 1) OVER ($W) THEN 'up'
       |              WHEN close < LAG(close, 1) OVER ($W) THEN 'down'
       |              WHEN LAG(close, 1) OVER ($W) IS NOT NULL THEN 'flat'
       |         END AS direction
       |  FROM bars
       |), t2 AS (
       |  SELECT symbol, event_id, datetime, direction,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         ROW_NUMBER() OVER (PARTITION BY symbol, direction ORDER BY datetime, event_id) AS rnd
       |  FROM t1
       |)
       |SELECT symbol, event_id, direction,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY symbol, direction, rn - rnd ORDER BY datetime, event_id) AS BIGINT) AS streak_len
       |FROM t2 ORDER BY event_id""".stripMargin

  /** Mirrors Core.featHull (Market.withHull, n=16): every WMA closed-form
    * over two sequential cums with the row-number weight identity —
    * identical trees, identical interpolated denominators. */
  val featHull: String = {
    val n = graft.features.Market.HullWindow
    val half = n / 2
    val rt = math.sqrt(n.toDouble).toInt
    def wma(cx: String, crx: String, w: Int) =
      s"CASE WHEN ${cumGate(cx, w)} THEN ((${cumRolling(crx, w)}) - " +
        s"(_rn - $w) * (${cumRolling(cx, w)})) / ${w * (w + 1) / 2.0} END"
    s"""$barsCte, h1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         CAST(ROW_NUMBER() OVER ($W) AS DOUBLE) AS _rn
       |  FROM bars
       |), h2 AS (
       |  SELECT symbol, event_id, datetime, _rn,
       |         ${cumSum("close")} AS _c_x, COUNT(close) OVER ($Wrun) AS _c_x_n,
       |         ${cumSum("_rn * close")} AS _c_rx, COUNT(_rn * close) OVER ($Wrun) AS _c_rx_n
       |  FROM h1
       |), h3 AS (
       |  SELECT symbol, event_id, datetime, _rn,
       |         ${wma("_c_x", "_c_rx", half)} * 2.0 - ${wma("_c_x", "_c_rx", n)} AS hma_raw
       |  FROM h2
       |), h4 AS (
       |  SELECT symbol, event_id, datetime, _rn, hma_raw,
       |         ${cumSum("hma_raw")} AS _c_h, COUNT(hma_raw) OVER ($Wrun) AS _c_h_n,
       |         ${cumSum("_rn * hma_raw")} AS _c_rh, COUNT(_rn * hma_raw) OVER ($Wrun) AS _c_rh_n
       |  FROM h3
       |)
       |SELECT symbol, event_id, ${r("hma_raw")} AS hma_raw,
       |       ${r(wma("_c_h", "_c_rh", rt))} AS hma_$n
       |FROM h4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featAwesome (Market.withAwesome): the same median
    * price, the same sequential-fold running cum, the same cum−lag
    * rolling means and full-window gates, subtracted in the same order. */
  val featAwesome: String = {
    val f = graft.features.Market.AwesomeFast
    val sl = graft.features.Market.AwesomeSlow
    def sma(w: Int) =
      s"CASE WHEN ${cumGate("_c_mp", w)} THEN (${cumRolling("_c_mp", w)}) / ${w.toDouble} END"
    s"""$barsCte, a1 AS (
       |  SELECT symbol, event_id, datetime, (high + low) / 2.0 AS _mp
       |  FROM bars
       |), a2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("_mp")} AS _c_mp,
       |         COUNT(_mp) OVER ($Wrun) AS _c_mp_n
       |  FROM a1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"${sma(f)} - ${sma(sl)}")} AS awesome
       |FROM a2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featCoppock (Market.withCoppock): the same ROC sum
    * (identical association), the same Hull-class WMA closed form over
    * SEQUENTIAL list-fold cums, the same full-window count gate. */
  val featCoppock: String = {
    val nl = graft.features.Market.CoppockRocLong
    val ns = graft.features.Market.CoppockRocShort
    val wn = graft.features.Market.CoppockWma
    val wma =
      s"CASE WHEN ${cumGate("_c_c", wn)} THEN ((${cumRolling("_c_rc", wn)}) - " +
        s"(_rn - $wn) * (${cumRolling("_c_c", wn)})) / ${wn * (wn + 1) / 2.0} END"
    s"""$barsCte, c1 AS (
       |  SELECT symbol, event_id, datetime,
       |         CAST(ROW_NUMBER() OVER ($W) AS DOUBLE) AS _rn,
       |         (close / LAG(close, $nl) OVER ($W) - 1.0) * 100.0 +
       |         (close / LAG(close, $ns) OVER ($W) - 1.0) * 100.0 AS coppock_raw
       |  FROM bars
       |), c2 AS (
       |  SELECT symbol, event_id, datetime, _rn, coppock_raw,
       |         ${cumSum("coppock_raw")} AS _c_c,
       |         COUNT(coppock_raw) OVER ($Wrun) AS _c_c_n,
       |         ${cumSum("_rn * coppock_raw")} AS _c_rc,
       |         COUNT(_rn * coppock_raw) OVER ($Wrun) AS _c_rc_n
       |  FROM c1
       |)
       |SELECT symbol, event_id, ${r("coppock_raw")} AS coppock_raw,
       |       ${r(wma)} AS coppock
       |FROM c2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featForce (Market.withForce, span 13, adjust=false):
    * the leading-NULL diff seeds the recursion at bar 2; identical
    * decay/alpha literals via Double.toString. */
  val featForce: String = {
    val sp = graft.features.Market.ForceSpan
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, ROW_NUMBER() OVER ($W) AS rn,
       |         (close - LAG(close, 1) OVER ($W)) * volume AS fr
       |  FROM bars
       |), g AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2, fr FROM b2 WHERE fr IS NOT NULL
       |), ew AS (
       |  SELECT symbol, rn2, fr AS v FROM g WHERE rn2 = 1
       |  UNION ALL
       |  SELECT g.symbol, g.rn2, ew.v * ${d(sp)} + ${a(sp)} * g.fr
       |  FROM ew JOIN g ON g.symbol = ew.symbol AND g.rn2 = ew.rn2 + 1
       |)
       |SELECT b2.symbol, b2.event_id, ${r("b2.fr")} AS force_raw,
       |       ${r("ew.v")} AS force_$sp
       |FROM b2
       |LEFT JOIN g ON g.symbol = b2.symbol AND g.event_id = b2.event_id
       |LEFT JOIN ew ON ew.symbol = g.symbol AND ew.rn2 = g.rn2
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.featChaikinOsc (Market.withChaikinOsc, spans 3/10,
    * adjust=true): sequential list_sum A/D line, then the MACD-style
    * twin-EMA recursive replay over it. */
  val featChaikinOsc: String = {
    val f = graft.features.Market.ChaikinFast
    val sl = graft.features.Market.ChaikinSlow
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, c1 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime,
       |         ((close - low) - (high - close)) / (high - low + $eps) * volume AS _mfv
       |  FROM bars
       |), c2 AS MATERIALIZED (
       |  SELECT symbol, event_id, ROW_NUMBER() OVER ($W) AS rn,
       |         list_sum(list(_mfv) OVER ($Wrun)) AS ad
       |  FROM c1
       |), ew AS (
       |  SELECT symbol, rn, ad, ad AS nf, CAST(1.0 AS DOUBLE) AS df,
       |         ad AS ns, CAST(1.0 AS DOUBLE) AS ds
       |  FROM c2 WHERE rn = 1
       |  UNION ALL
       |  SELECT c2.symbol, c2.rn, c2.ad,
       |         ew.nf * ${d(f)} + c2.ad,  ew.df * ${d(f)} + 1.0,
       |         ew.ns * ${d(sl)} + c2.ad, ew.ds * ${d(sl)} + 1.0
       |  FROM ew JOIN c2 ON c2.symbol = ew.symbol AND c2.rn = ew.rn + 1
       |)
       |SELECT c2b.symbol, c2b.event_id, ${r("ew.ad")} AS ad_line,
       |       ${r("ew.nf / ew.df - ew.ns / ew.ds")} AS chaikin_osc
       |FROM c2 c2b JOIN ew ON ew.symbol = c2b.symbol AND ew.rn = c2b.rn
       |ORDER BY c2b.event_id""".stripMargin
  }

  /** Mirrors Core.featNviPvi (Market.withVolumeIndex): the CondProd
    * recursion replayed as a recursive CTE — identical gross-factor tree
    * (zero-prior-close gate), identical v·f association, seed 1000 (the
    * first bar's lagged volume is NULL, so neither condition fires). */
  val featNviPvi: String = {
    val base = graft.features.Market.VolumeIndexBase.toString
    def step(prev: String, cmp: String) =
      s"CASE WHEN b2.volume $cmp b2.pv AND b2.gf IS NOT NULL " +
        s"THEN $prev * b2.gf ELSE $prev END"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, ROW_NUMBER() OVER ($W) AS rn,
       |         volume, LAG(volume, 1) OVER ($W) AS pv,
       |         1.0 + CASE WHEN LAG(close, 1) OVER ($W) <> 0.0
       |                    THEN (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W)
       |               END AS gf
       |  FROM bars
       |), vi AS (
       |  SELECT symbol, rn, CAST($base AS DOUBLE) AS nvi, CAST($base AS DOUBLE) AS pvi
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         ${step("vi.nvi", "<")},
       |         ${step("vi.pvi", ">")}
       |  FROM vi JOIN b2 ON b2.symbol = vi.symbol AND b2.rn = vi.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id, ${r("vi.nvi")} AS nvi, ${r("vi.pvi")} AS pvi
       |FROM b2 JOIN vi ON vi.symbol = b2.symbol AND vi.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.featGarch (Market.withGarch): the LinearRec affine
    * recursion replayed as a recursive CTE — identical ω + α·x + β·v
    * association, identical zero-prev-close return gate, base =
    * ω/(1−α−β) emitted via Double.toString. */
  val featGarch: String = {
    val w0 = graft.features.Market.GarchOmega.toString
    val al = graft.features.Market.GarchAlpha.toString
    val be = graft.features.Market.GarchBeta.toString
    val base = (graft.features.Market.GarchOmega /
      (1.0 - graft.features.Market.GarchAlpha -
        graft.features.Market.GarchBeta)).toString
    def step(x: String, v: String) =
      s"CASE WHEN $x IS NULL THEN $v ELSE $w0 + $al * $x + $be * $v END"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, rr AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN LAG(close, 1) OVER ($W) <> 0.0
       |              THEN (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W)
       |         END AS r
       |  FROM bars
       |), b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, ROW_NUMBER() OVER ($W) AS rn,
       |         LAG(r, 1) OVER ($W) * LAG(r, 1) OVER ($W) AS x
       |  FROM rr
       |), g AS (
       |  SELECT symbol, rn, x, ${step("x", s"CAST($base AS DOUBLE)")} AS v
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn, b2.x, ${step("b2.x", "g.v")}
       |  FROM g JOIN b2 ON b2.symbol = g.symbol AND b2.rn = g.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("CASE WHEN b2.x IS NOT NULL THEN g.v END")} AS garch_var,
       |       ${r("CASE WHEN b2.x IS NOT NULL THEN sqrt(g.v) END")} AS garch_vol
       |FROM b2 JOIN g ON g.symbol = b2.symbol AND g.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.featConnorsRsi (Market.withConnorsRsi, 3/2/20): two
    * recursive-CTE RSI replays (close diffs and signed-streak diffs), the
    * gaps-and-islands streak in identical integer windows, and the
    * percent-rank leg via list_filter (null prior returns drop out of the
    * filtered count on both engines; the gate counts non-null returns,
    * not array length). */
  val featConnorsRsi: String = {
    val p1 = graft.features.Market.CrsiRsiPeriod
    val p2 = graft.features.Market.CrsiStreakPeriod
    val rw = graft.features.Market.CrsiRankWindow
    val wPrev = s"$W ROWS BETWEEN $rw PRECEDING AND 1 PRECEDING"
    def rsiExpr(ag: String, al: String) =
      s"100 - (100 / (1 + $ag / ($al + $eps)))"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, c1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         close - LAG(close, 1) OVER ($W) AS d1,
       |         CASE WHEN close > LAG(close, 1) OVER ($W) THEN 1
       |              WHEN close < LAG(close, 1) OVER ($W) THEN -1
       |              WHEN LAG(close, 1) OVER ($W) IS NOT NULL THEN 0 END AS dir,
       |         (close - LAG(close, 1) OVER ($W)) / (LAG(close, 1) OVER ($W) + $eps) AS ret
       |  FROM bars
       |), c2 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY symbol, dir ORDER BY datetime, event_id) AS rnd
       |  FROM c1
       |), c3 AS (
       |  SELECT symbol, event_id, datetime, rn, d1, ret,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY symbol, dir, rn - rnd ORDER BY datetime, event_id)
       |              * COALESCE(dir, 0) AS DOUBLE) AS streak
       |  FROM c2
       |), c4 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, d1, ret,
       |         streak - LAG(streak, 1) OVER ($W) AS ds,
       |         list(ret) OVER ($wPrev) AS arr,
       |         COUNT(ret) OVER ($wPrev) AS nprev
       |  FROM c3
       |), g1 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2,
       |         CAST(d1 > 0 AS DOUBLE) * d1 AS gain,
       |         CAST(d1 < 0 AS DOUBLE) * (-d1) AS loss
       |  FROM c4 WHERE d1 IS NOT NULL
       |), ew1 AS (
       |  SELECT symbol, rn2, gain AS ag, loss AS al FROM g1 WHERE rn2 = 1
       |  UNION ALL
       |  SELECT g1.symbol, g1.rn2,
       |         ew1.ag * ${d(p1)} + ${a(p1)} * g1.gain,
       |         ew1.al * ${d(p1)} + ${a(p1)} * g1.loss
       |  FROM ew1 JOIN g1 ON g1.symbol = ew1.symbol AND g1.rn2 = ew1.rn2 + 1
       |), g2 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2,
       |         CAST(ds > 0 AS DOUBLE) * ds AS gain,
       |         CAST(ds < 0 AS DOUBLE) * (-ds) AS loss
       |  FROM c4 WHERE ds IS NOT NULL
       |), ew2 AS (
       |  SELECT symbol, rn2, gain AS ag, loss AS al FROM g2 WHERE rn2 = 1
       |  UNION ALL
       |  SELECT g2.symbol, g2.rn2,
       |         ew2.ag * ${d(p2)} + ${a(p2)} * g2.gain,
       |         ew2.al * ${d(p2)} + ${a(p2)} * g2.loss
       |  FROM ew2 JOIN g2 ON g2.symbol = ew2.symbol AND g2.rn2 = ew2.rn2 + 1
       |), fin AS (
       |  SELECT c4.symbol, c4.event_id,
       |         ${rsiExpr("ew1.ag", "ew1.al")} AS rsi3,
       |         ${rsiExpr("ew2.ag", "ew2.al")} AS rsis,
       |         CASE WHEN c4.nprev = $rw AND c4.ret IS NOT NULL
       |              THEN len(list_filter(c4.arr, x -> x < c4.ret)) * 100.0 / $rw
       |         END AS prank
       |  FROM c4
       |  LEFT JOIN g1 ON g1.symbol = c4.symbol AND g1.event_id = c4.event_id
       |  LEFT JOIN ew1 ON ew1.symbol = g1.symbol AND ew1.rn2 = g1.rn2
       |  LEFT JOIN g2 ON g2.symbol = c4.symbol AND g2.event_id = c4.event_id
       |  LEFT JOIN ew2 ON ew2.symbol = g2.symbol AND ew2.rn2 = g2.rn2
       |)
       |SELECT symbol, event_id, ${r("rsi3")} AS crsi_rsi,
       |       ${r("rsis")} AS crsi_streak_rsi, ${r("prank")} AS crsi_pct_rank,
       |       ${r("(rsi3 + rsis + prank) / 3.0")} AS crsi
       |FROM fin ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featVolOfVol (Market.withVolOfVol, n=20): two chained
    * sequential-cum std passes with the identical raw-sums tree. */
  val featVolOfVol: String = {
    val n = graft.features.Market.VovWindow
    def stdOf(c1: String, c2: String) =
      s"CASE WHEN ${cumGate(c1, n)} THEN sqrt(greatest(((${cumRolling(c2, n)}) - " +
        s"(${cumRolling(c1, n)}) * (${cumRolling(c1, n)}) / $n) / ${n - 1}, 0.0)) END"
    s"""$barsCte, vv1 AS (
       |  SELECT symbol, event_id, datetime,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS vr
       |  FROM bars
       |), vv2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("vr")} AS _c_v1, COUNT(vr) OVER ($Wrun) AS _c_v1_n,
       |         ${cumSum("vr * vr")} AS _c_v2, COUNT(vr * vr) OVER ($Wrun) AS _c_v2_n
       |  FROM vv1
       |), vv3 AS (
       |  SELECT symbol, event_id, datetime, ${stdOf("_c_v1", "_c_v2")} AS vol
       |  FROM vv2
       |), vv4 AS (
       |  SELECT symbol, event_id, datetime, vol,
       |         ${cumSum("vol")} AS _c_w1, COUNT(vol) OVER ($Wrun) AS _c_w1_n,
       |         ${cumSum("vol * vol")} AS _c_w2, COUNT(vol * vol) OVER ($Wrun) AS _c_w2_n
       |  FROM vv3
       |)
       |SELECT symbol, event_id, ${r("vol")} AS vol_$n,
       |       ${r(stdOf("_c_w1", "_c_w2"))} AS vol_of_vol_$n
       |FROM vv4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.barsAnchoredVwap (Market.withAnchoredVwap): per-day
    * sequential list_sum folds over the identical (symbol, date)
    * partitions, same gates. */
  val barsAnchoredVwap: String = {
    val wd = "PARTITION BY symbol, CAST(datetime AS DATE) " +
      "ORDER BY datetime, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"""$barsCte, av1 AS (
       |  SELECT symbol, event_id, close,
       |         list_sum(list((high + low + close) / 3.0 * volume) OVER ($wd)) AS dpv,
       |         list_sum(list(volume) OVER ($wd)) AS dv
       |  FROM bars
       |), av2 AS (
       |  SELECT symbol, event_id, close,
       |         CASE WHEN dv > 0.0 THEN dpv / dv END AS av
       |  FROM av1
       |)
       |SELECT symbol, event_id, ${r("av")} AS anchored_vwap,
       |       ${r("CASE WHEN av <> 0.0 THEN (close - av) / av * 100 END")} AS avwap_distance
       |FROM av2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.eventsDauWau: distinct (day, user) pairs, the
    * bounded 7-day fan-out, exact integer distinct counts. */
  val eventsDauWau: String =
    s"""WITH du AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
       |), vis AS (
       |  SELECT DISTINCT du.day + CAST(t.i AS INTEGER) AS day, du.user_id
       |  FROM du, UNNEST(generate_series(0, 6)) t(i)
       |), dau AS (
       |  SELECT day, COUNT(*) AS dau FROM du GROUP BY 1
       |), wau AS (
       |  SELECT day, COUNT(*) AS wau FROM vis GROUP BY 1
       |)
       |SELECT day, dau, wau, ${r("CAST(dau AS DOUBLE) / wau")} AS stickiness
       |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  /** Mirrors Core.featVpin (V=5000, n=10): identical tick-rule sign,
    * monotone volume buckets, trailing-bucket imbalance share — every sum
    * is an integer-valued double, exact in any association order. */
  val featVpin: String = {
    val frame = "PARTITION BY symbol ORDER BY bar_id " +
      "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW"
    s"""$barsCte, t1 AS (
       |  SELECT symbol, event_id, volume,
       |         CASE WHEN close > LAG(close, 1) OVER ($W) THEN 1
       |              WHEN close < LAG(close, 1) OVER ($W) THEN -1
       |              ELSE 0 END AS sgn,
       |         SUM(volume) OVER ($Wrun) AS cumv
       |  FROM bars
       |), b AS (
       |  SELECT symbol, CAST(floor(cumv / 5000.0) AS BIGINT) AS bar_id,
       |         SUM(CASE WHEN sgn = 1 THEN volume ELSE 0.0 END) AS buy_vol,
       |         SUM(CASE WHEN sgn = -1 THEN volume ELSE 0.0 END) AS sell_vol,
       |         SUM(volume) AS vtot
       |  FROM t1 GROUP BY 1, 2
       |), r0 AS (
       |  SELECT symbol, bar_id, buy_vol, sell_vol, vtot,
       |         SUM(abs(buy_vol - sell_vol)) OVER ($frame) AS rimb,
       |         SUM(vtot) OVER ($frame) AS rv,
       |         COUNT(*) OVER ($frame) AS cnt
       |  FROM b
       |)
       |SELECT symbol, bar_id, buy_vol, sell_vol, vtot,
       |       ${r("CASE WHEN cnt = 10 AND rv > 0.0 THEN rimb / rv END")} AS vpin
       |FROM r0 ORDER BY symbol, bar_id""".stripMargin
  }

  /** Mirrors Core.featRiskadj (Market.withRiskAdj, n=20): the volatility
    * family's sequential cums plus the semideviation leg, identical gated
    * ratio trees. */
  val featRiskadj: String = {
    val n = graft.features.Market.RiskAdjWindow
    val dd2 = "CASE WHEN ra IS NOT NULL THEN " +
      "CASE WHEN ra < 0.0 THEN ra * ra ELSE 0.0 END END"
    s"""$barsCte, ra1 AS (
       |  SELECT symbol, event_id, datetime,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS ra
       |  FROM bars
       |), ra2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("ra")} AS _c_m, COUNT(ra) OVER ($Wrun) AS _c_m_n,
       |         ${cumSum("ra * ra")} AS _c_m2, COUNT(ra * ra) OVER ($Wrun) AS _c_m2_n,
       |         ${cumSum(dd2)} AS _c_dd, COUNT($dd2) OVER ($Wrun) AS _c_dd_n
       |  FROM ra1
       |), ra3 AS (
       |  SELECT symbol, event_id,
       |         CASE WHEN ${cumGate("_c_m", n)} THEN (${cumRolling("_c_m", n)}) / $n END AS mn,
       |         CASE WHEN ${cumGate("_c_m", n)} THEN sqrt(greatest(((${cumRolling("_c_m2", n)}) - (${cumRolling("_c_m", n)}) * (${cumRolling("_c_m", n)}) / $n) / ${n - 1}, 0.0)) END AS sd,
       |         CASE WHEN ${cumGate("_c_m", n)} THEN sqrt((${cumRolling("_c_dd", n)}) / $n) END AS dd
       |  FROM ra2
       |)
       |SELECT symbol, event_id, ${r("dd")} AS downside_dev_$n,
       |       ${r("CASE WHEN sd > 0.0 THEN mn / sd END")} AS sharpe_$n,
       |       ${r("CASE WHEN dd > 0.0 THEN mn / dd END")} AS sortino_$n
       |FROM ra3 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.graphDegrees: identical symmetrized edge
    * construction, two exact integer aggregates. */
  val graphDegrees: String =
    """WITH pairs AS (
      |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS a,
      |         'p' || CAST(l_partkey AS VARCHAR) AS b
      |  FROM lineitem
      |), e AS (
      |  SELECT a AS src FROM pairs UNION ALL SELECT b AS src FROM pairs
      |), d AS (
      |  SELECT src, COUNT(*) AS degree FROM e GROUP BY 1
      |)
      |SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY 1 ORDER BY degree""".stripMargin

  /** Mirrors Core.featZigzag (Market.withZigzag, θ=5%): the ZigZag
    * state machine replayed as a recursive CTE — identical branch trees,
    * retracement thresholds emitted via Double.toString of the SAME
    * computed 1∓θ doubles the expression uses. */
  val featZigzag: String = {
    val lo = (1.0 - graft.features.Market.ZigzagTheta).toString
    val hi = (1.0 + graft.features.Market.ZigzagTheta).toString
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), zz AS (
       |  SELECT symbol, rn, CAST(1.0 AS DOUBLE) AS dir, close AS ext,
       |         CAST(0.0 AS DOUBLE) AS flip
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         CASE WHEN zz.dir = 1.0
       |              THEN CASE WHEN b2.close < zz.ext * $lo THEN -1.0 ELSE 1.0 END
       |              ELSE CASE WHEN b2.close > zz.ext * $hi THEN 1.0 ELSE -1.0 END END,
       |         CASE WHEN zz.dir = 1.0
       |              THEN CASE WHEN b2.close < zz.ext * $lo THEN b2.close ELSE GREATEST(zz.ext, b2.close) END
       |              ELSE CASE WHEN b2.close > zz.ext * $hi THEN b2.close ELSE LEAST(zz.ext, b2.close) END END,
       |         CASE WHEN zz.dir = 1.0
       |              THEN CASE WHEN b2.close < zz.ext * $lo THEN 1.0 ELSE 0.0 END
       |              ELSE CASE WHEN b2.close > zz.ext * $hi THEN 1.0 ELSE 0.0 END END
       |  FROM zz JOIN b2 ON b2.symbol = zz.symbol AND b2.rn = zz.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id, CAST(zz.dir AS INT) AS zz_dir,
       |       ${r("zz.ext")} AS zz_extreme, CAST(zz.flip AS INT) AS zz_reversal
       |FROM b2 JOIN zz ON zz.symbol = b2.symbol AND zz.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.barsRenko (Market.withRenko, brick=5.0): the Renko state
    * machine replayed as a recursive CTE — identical double-typed floor and
    * branch trees, brick literal via Double.toString of the SAME constant.
    * The running brick count sums exact small integers, so the windowed
    * SUM carries no float-order surface. */
  val barsRenko: String = {
    val b = graft.features.Market.RenkoBrick.toString
    val kUp = s"floor((b2.close - rk.anchor) / $b)"
    val kDn = s"floor((rk.anchor - b2.close) / $b)"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), rk AS (
       |  SELECT symbol, rn, close AS anchor, CAST(0.0 AS DOUBLE) AS dir,
       |         CAST(0.0 AS DOUBLE) AS bricks
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         CASE WHEN $kUp >= 1.0 THEN rk.anchor + $kUp * $b
       |              WHEN $kDn >= 1.0 THEN rk.anchor - $kDn * $b
       |              ELSE rk.anchor END,
       |         CASE WHEN $kUp >= 1.0 THEN 1.0
       |              WHEN $kDn >= 1.0 THEN -1.0
       |              ELSE rk.dir END,
       |         CASE WHEN $kUp >= 1.0 THEN $kUp
       |              WHEN $kDn >= 1.0 THEN $kDn
       |              ELSE 0.0 END
       |  FROM rk JOIN b2 ON b2.symbol = rk.symbol AND b2.rn = rk.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id, ${r("rk.anchor")} AS renko_anchor,
       |       CAST(rk.dir AS INT) AS renko_dir,
       |       CAST(rk.bricks AS BIGINT) AS renko_bricks,
       |       CAST(SUM(CAST(rk.bricks AS BIGINT))
       |              OVER (PARTITION BY b2.symbol ORDER BY rk.rn) AS BIGINT)
       |         AS renko_count
       |FROM b2 JOIN rk ON rk.symbol = b2.symbol AND rk.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.featChoppiness (Market.withChoppiness, n=14): same
    * COALESCE prev-close TR, sequential cum−lag path sum, native extrema,
    * ln(n) interpolated as the driver-computed literal. */
  val featChoppiness: String = {
    val n = graft.features.Market.ChopWindow
    val lnN = math.log(n.toDouble).toString
    val pc = s"COALESCE(LAG(close, 1) OVER ($W), close)"
    s"""$barsCte, ch1 AS (
       |  SELECT symbol, event_id, datetime, high, low,
       |         GREATEST(high, $pc) - LEAST(low, $pc) AS _ctr
       |  FROM bars
       |), ch2 AS (
       |  SELECT symbol, event_id, datetime, high, low,
       |         ${cumSum("_ctr")} AS _c_ctr, COUNT(_ctr) OVER ($Wrun) AS _c_ctr_n,
       |         MAX(high) OVER (${frame(n)}) AS hh,
       |         MIN(low) OVER (${frame(n)}) AS ll
       |  FROM ch1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN ${cumGate("_c_ctr", n)} AND hh > ll AND (${cumRolling("_c_ctr", n)}) > 0.0 THEN 100.0 * ln((${cumRolling("_c_ctr", n)}) / (hh - ll)) / $lnN END")} AS chop_$n
       |FROM ch2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featRvol: exact (symbol, hour) volume profile, one
    * gated division. */
  val featRvol: String =
    s"""$barsCte, rv AS (
       |  SELECT symbol, event_id, hour(datetime) AS hod, volume FROM bars
       |), prof AS (
       |  SELECT symbol, hod, SUM(volume) / COUNT(*) AS avgv
       |  FROM rv GROUP BY 1, 2
       |)
       |SELECT r0.symbol, r0.event_id, r0.hod, r0.volume,
       |       ${r("CASE WHEN p.avgv > 0.0 THEN r0.volume / p.avgv END")} AS rvol
       |FROM rv r0 JOIN prof p USING (symbol, hod)
       |ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.eventsAnomaly (w=24): integer hourly counts through
    * integer running/rolling sums (order-insensitive — plain windowed SUM
    * is exact), identical mean/var/z trees. */
  val eventsAnomaly: String = {
    val w = 24
    val Wh = "PARTITION BY event_type ORDER BY hb"
    s"""WITH hourly AS (
       |  SELECT event_type, CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hb,
       |         COUNT(*) AS n
       |  FROM events GROUP BY 1, 2
       |), a1 AS (
       |  SELECT event_type, hb, n,
       |         SUM(n) OVER ($Wh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _c1,
       |         SUM(n * n) OVER ($Wh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _c2,
       |         COUNT(*) OVER ($Wh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cn
       |  FROM hourly
       |), a2 AS (
       |  SELECT event_type, hb, n,
       |         _c1 - COALESCE(LAG(_c1, $w) OVER ($Wh), 0) AS rs,
       |         _c2 - COALESCE(LAG(_c2, $w) OVER ($Wh), 0) AS rs2,
       |         (_cn - COALESCE(LAG(_cn, $w) OVER ($Wh), 0)) = $w AS g
       |  FROM a1
       |), a3 AS (
       |  SELECT event_type, hb, n, g,
       |         sqrt(greatest((CAST(rs2 AS DOUBLE) - CAST(rs AS DOUBLE) * CAST(rs AS DOUBLE) / $w) / ${w - 1}, 0.0)) AS sd,
       |         CAST(rs AS DOUBLE) / $w AS mean
       |  FROM a2
       |)
       |SELECT event_type, hb, n,
       |       ${r(s"CASE WHEN g AND sd > 0.0 THEN (CAST(n AS DOUBLE) - mean) / sd END")} AS z,
       |       CAST(abs(CASE WHEN g AND sd > 0.0 THEN (CAST(n AS DOUBLE) - mean) / sd END) > 3.0 AS INT) AS is_anomaly
       |FROM a3 ORDER BY event_type, hb""".stripMargin
  }

  /** Mirrors Core.featPsar (Market.withPsar, 0.02/0.02/0.2): the four-state
    * Wilder recursion replayed with the SAME branch order as the window
    * expression (flip checked before new-extreme), constants emitted from
    * the same Scala literals. */
  val featPsar: String = {
    val a0 = Params.PsarAf0.toString
    val ic = Params.PsarInc.toString
    val mx = Params.PsarAfMax.toString
    val sp = "ps.sar + ps.af * (ps.ep - ps.sar)"
    val flip = s"(ps.tr = 1.0 AND k.low < ($sp)) OR (ps.tr <> 1.0 AND k.high > ($sp))"
    val newext = "(ps.tr = 1.0 AND k.high > ps.ep) OR (ps.tr <> 1.0 AND k.low < ps.ep)"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, k AS MATERIALIZED (
       |  SELECT symbol, event_id, high, low, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), ps AS (
       |  SELECT symbol, rn, low AS sar, high AS ep,
       |         CAST($a0 AS DOUBLE) AS af, CAST(1.0 AS DOUBLE) AS tr
       |  FROM k WHERE rn = 1
       |  UNION ALL
       |  SELECT k.symbol, k.rn,
       |         CASE WHEN $flip THEN ps.ep ELSE $sp END,
       |         CASE WHEN $flip THEN (CASE WHEN ps.tr = 1.0 THEN k.low ELSE k.high END)
       |              WHEN $newext THEN (CASE WHEN ps.tr = 1.0 THEN k.high ELSE k.low END)
       |              ELSE ps.ep END,
       |         CASE WHEN $flip THEN $a0
       |              WHEN $newext THEN LEAST(ps.af + $ic, $mx)
       |              ELSE ps.af END,
       |         CASE WHEN $flip THEN (CASE WHEN ps.tr = 1.0 THEN -1.0 ELSE 1.0 END)
       |              ELSE ps.tr END
       |  FROM ps JOIN k ON k.symbol = ps.symbol AND k.rn = ps.rn + 1
       |)
       |SELECT k.symbol, k.event_id,
       |       ${r("ps.sar")} AS psar,
       |       CAST(ps.tr AS INT) AS psar_trend
       |FROM k JOIN ps ON ps.symbol = k.symbol AND ps.rn = k.rn
       |ORDER BY k.event_id""".stripMargin
  }

  /** Mirrors Core.barsDollar (T from Params): the cumulative dollar fold
    * is the sequential per-symbol list_sum; open/close key-deterministic
    * arg_min/arg_max, the dollar sum r4-rounded. */
  val barsDollar: String = {
    val t = Params.DollarBarSize.toString
    s"""$barsCte, db1 AS (
       |  SELECT symbol, event_id, close, volume, close * volume AS _d,
       |         ${cumSum("close * volume")} AS _cum
       |  FROM bars
       |), db2 AS (
       |  SELECT symbol, event_id, close, volume, _d,
       |         CAST(floor(_cum / $t) AS BIGINT) AS bar_id
       |  FROM db1
       |)
       |SELECT symbol, bar_id, COUNT(*) AS n_ticks,
       |       ${r("arg_min(close, event_id)")} AS open,
       |       ${r("MAX(close)")} AS high,
       |       ${r("MIN(close)")} AS low,
       |       ${r("arg_max(close, event_id)")} AS close,
       |       SUM(volume) AS volume,
       |       ${r4("SUM(_d)")} AS dollar
       |FROM db2 GROUP BY 1, 2 ORDER BY symbol, bar_id""".stripMargin
  }

  /** Mirrors Core.barsImbalance (T from Params): the threshold-reset
    * bucket recursion replayed per symbol (row's bucket is the id open
    * BEFORE any reset, exactly the window expression's `cur` slot), then
    * the same key-deterministic OHLCV aggregate. */
  val barsImbalance: String = {
    val t = Params.ImbalanceThreshold.toString
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, k AS MATERIALIZED (
       |  SELECT symbol, event_id, close, volume, ROW_NUMBER() OVER ($W) AS rn,
       |         sign(close - LAG(close, 1) OVER ($W)) AS tick
       |  FROM bars
       |), ib AS (
       |  SELECT symbol, rn, CAST(0.0 AS DOUBLE) AS cur,
       |         CASE WHEN abs(COALESCE(tick, 0.0)) >= $t
       |              THEN 0.0 ELSE COALESCE(tick, 0.0) END AS acc,
       |         CASE WHEN abs(COALESCE(tick, 0.0)) >= $t
       |              THEN 1.0 ELSE 0.0 END AS id
       |  FROM k WHERE rn = 1
       |  UNION ALL
       |  SELECT k.symbol, k.rn, ib.id,
       |         CASE WHEN abs(ib.acc + COALESCE(k.tick, 0.0)) >= $t
       |              THEN 0.0 ELSE ib.acc + COALESCE(k.tick, 0.0) END,
       |         CASE WHEN abs(ib.acc + COALESCE(k.tick, 0.0)) >= $t
       |              THEN ib.id + 1.0 ELSE ib.id END
       |  FROM ib JOIN k ON k.symbol = ib.symbol AND k.rn = ib.rn + 1
       |)
       |SELECT k.symbol, CAST(ib.cur AS BIGINT) AS bar_id,
       |       COUNT(*) AS n_ticks,
       |       SUM(COALESCE(k.tick, 0.0)) AS imbalance,
       |       ${r("arg_min(k.close, k.event_id)")} AS open,
       |       ${r("MAX(k.close)")} AS high,
       |       ${r("MIN(k.close)")} AS low,
       |       ${r("arg_max(k.close, k.event_id)")} AS close,
       |       SUM(k.volume) AS volume
       |FROM k JOIN ib ON ib.symbol = k.symbol AND ib.rn = k.rn
       |GROUP BY 1, 2 ORDER BY k.symbol, bar_id""".stripMargin
  }

  /** Mirrors Core.cvPurged (k=5, embargo = n div 50): pure integer
    * boundary arithmetic over the global (ts, event_id) row numbering. */
  val cvPurged: String = {
    val k = Params.PurgedFolds
    val ef = Params.EmbargoFrac
    s"""WITH numbered AS (
       |  SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
       |         COUNT(*) OVER () AS n
       |  FROM events
       |), folds AS (SELECT UNNEST(range(1, ${k + 1})) AS fold)
       |SELECT fold, event_id,
       |       CASE WHEN rn >= (fold - 1) * n // $k + 1 AND rn <= fold * n // $k
       |            THEN 'test'
       |            WHEN rn >= (fold - 1) * n // $k + 1 - n // $ef
       |                 AND rn <= fold * n // $k + n // $ef
       |            THEN 'embargo'
       |            ELSE 'train' END AS role
       |FROM numbered CROSS JOIN folds
       |ORDER BY fold, event_id""".stripMargin
  }

  /** Mirrors Core.mlRoc (k=10): identical score/label windows, the same
    * (lo, hi, j) threshold tree, exact integer TP/FP counting per grid
    * point. */
  val mlRoc: String = {
    val k = 10
    val thr = s"lo + (hi - lo) * CAST(j AS DOUBLE) / $k"
    s"""$barsCte, sc AS (
       |  SELECT close - LAG(close, 5) OVER ($W) AS score,
       |         CAST(LEAD(close, 1) OVER ($W) > close AS INT) AS label
       |  FROM bars
       |), f AS (
       |  SELECT * FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
       |), mm AS (
       |  SELECT MIN(score) AS lo, MAX(score) AS hi FROM f
       |), grid AS (
       |  SELECT f.score, f.label, mm.lo, mm.hi, gs.j
       |  FROM f CROSS JOIN mm CROSS JOIN (SELECT UNNEST(range(0, ${k + 1})) AS j) gs
       |), agg AS (
       |  SELECT j, MAX($thr) AS threshold,
       |         COUNT(CASE WHEN score >= ($thr) AND label = 1 THEN 1 END) AS tp,
       |         COUNT(CASE WHEN score >= ($thr) AND label = 0 THEN 1 END) AS fp,
       |         COUNT(CASE WHEN label = 1 THEN 1 END) AS pos,
       |         COUNT(CASE WHEN label = 0 THEN 1 END) AS neg
       |  FROM grid GROUP BY j
       |)
       |SELECT j, ${r("threshold")} AS threshold, tp, fp,
       |       ${r("CAST(tp AS DOUBLE) / pos")} AS tpr,
       |       ${r("CAST(fp AS DOUBLE) / neg")} AS fpr,
       |       ${r("CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END")} AS precision
       |FROM agg ORDER BY j""".stripMargin
  }

  /** Mirrors Core.mlAuc: ROW_NUMBER over (score, event_id) — the oracle
    * affords the global sort the Spark side replaces with bucket-offset
    * numbering; exact integer U statistic (`//` ↔ Spark `div`), one
    * double division at the end. */
  val mlAuc: String =
    s"""$barsCte, sc AS (
       |  SELECT event_id, close - LAG(close, 5) OVER ($W) AS score,
       |         CAST(LEAD(close, 1) OVER ($W) > close AS INT) AS label
       |  FROM bars
       |), f AS (
       |  SELECT * FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
       |), rk AS (
       |  SELECT label, ROW_NUMBER() OVER (ORDER BY score, event_id) AS rn
       |  FROM f
       |), agg AS (
       |  SELECT CAST(SUM(CASE WHEN label = 1 THEN rn END) AS BIGINT) AS rank_sum,
       |         COUNT(CASE WHEN label = 1 THEN 1 END) AS npos,
       |         COUNT(CASE WHEN label = 0 THEN 1 END) AS nneg
       |  FROM rk
       |), u AS (
       |  SELECT npos, nneg, rank_sum - (npos * (npos + 1)) // 2 AS u_stat
       |  FROM agg
       |)
       |SELECT npos, nneg, u_stat,
       |       ${r("CAST(u_stat AS DOUBLE) / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE))")} AS auc
       |FROM u""".stripMargin

  /** Mirrors Core.mlLift (k=10): identical integer decile assignment
    * (`//` ↔ `div`) over the same (score, event_id) ranking, cumulative /
    * total windows over the 10-row aggregate. */
  val mlLift: String = {
    val k = 10
    s"""$barsCte, sc AS (
       |  SELECT event_id, close - LAG(close, 5) OVER ($W) AS score,
       |         CAST(LEAD(close, 1) OVER ($W) > close AS INT) AS label
       |  FROM bars
       |), f AS (
       |  SELECT * FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
       |), rk AS (
       |  SELECT label, ROW_NUMBER() OVER (ORDER BY score, event_id) AS rn
       |  FROM f
       |), d AS (
       |  SELECT label,
       |         $k - ((rn - 1) * $k) // (SELECT COUNT(*) FROM f) AS decile
       |  FROM rk
       |), a AS (
       |  SELECT decile, COUNT(*) AS n_rows,
       |         COUNT(CASE WHEN label = 1 THEN 1 END) AS n_pos
       |  FROM d GROUP BY decile
       |), cw AS (
       |  SELECT decile, n_rows, n_pos,
       |         CAST(SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       |         SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot_pos,
       |         SUM(n_rows) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot_rows
       |  FROM a
       |)
       |SELECT decile, n_rows, n_pos, cum_pos,
       |       ${r("CAST(cum_pos AS DOUBLE) / tot_pos")} AS cum_gain,
       |       ${r("(CAST(n_pos AS DOUBLE) / n_rows) / (CAST(tot_pos AS DOUBLE) / tot_rows)")} AS lift
       |FROM cw ORDER BY decile""".stripMargin
  }

  /** Mirrors Core.mlPrAuc: the same (score DESC, event_id) global ranking,
    * positives re-ranked by their rank, AP = mean(pos_rn / rn). Every rank
    * is an exact integer on both engines; the single float surface is the
    * final mean of P ratios, orders below the 6-decimal floor. */
  val mlPrAuc: String =
    s"""$barsCte, sc AS (
       |  SELECT event_id, close - LAG(close, 5) OVER ($W) AS score,
       |         CAST(LEAD(close, 1) OVER ($W) > close AS INT) AS label
       |  FROM bars
       |), f AS (
       |  SELECT * FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
       |), rk AS (
       |  SELECT label, ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS rn
       |  FROM f
       |), p AS (
       |  SELECT rn, ROW_NUMBER() OVER (ORDER BY rn) AS pos_rn
       |  FROM rk WHERE label = 1
       |), agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS npos,
       |         SUM(CAST(pos_rn AS DOUBLE) / CAST(rn AS DOUBLE)) AS ap_sum
       |  FROM p
       |)
       |SELECT npos, ${r("ap_sum / CAST(npos AS DOUBLE)")} AS ap
       |FROM agg""".stripMargin

  /** Mirrors Core.mlNdcg: the same exact-integer quartile grading
    * (`//` ↔ Spark `div` over the identical (fwd, event_id) ranking), the
    * same two top-100 orderings, and the DCG terms written with the same
    * power/log2 shape. The only float surface: 100 per-term divisions
    * summed once per leg. */
  val mlNdcg: String = {
    val k = 100
    s"""$barsCte, sc AS (
       |  SELECT event_id, close - LAG(close, 5) OVER ($W) AS score,
       |         (LEAD(close, 1) OVER ($W) - close) / close AS fwd
       |  FROM bars
       |), f AS (
       |  SELECT * FROM sc WHERE score IS NOT NULL AND fwd IS NOT NULL
       |), g AS (
       |  SELECT event_id, score, ((rk - 1) * 4) // n AS gain
       |  FROM (SELECT event_id, score,
       |               ROW_NUMBER() OVER (ORDER BY fwd, event_id) AS rk,
       |               COUNT(*) OVER () AS n
       |        FROM f)
       |), top AS (
       |  SELECT gain, r FROM (
       |    SELECT gain, ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS r
       |    FROM g) WHERE r <= $k
       |), ideal AS (
       |  SELECT gain, r FROM (
       |    SELECT gain, ROW_NUMBER() OVER (ORDER BY gain DESC, event_id) AS r
       |    FROM g) WHERE r <= $k
       |), d AS (
       |  SELECT SUM((power(2.0, gain) - 1.0) / log2(CAST(r AS DOUBLE) + 1.0))
       |    AS dcg FROM top
       |), i AS (
       |  SELECT SUM((power(2.0, gain) - 1.0) / log2(CAST(r AS DOUBLE) + 1.0))
       |    AS idcg FROM ideal
       |)
       |SELECT CAST($k AS BIGINT) AS k, ${r("dcg")} AS dcg,
       |       ${r("idcg")} AS idcg, ${r("dcg / idcg")} AS ndcg
       |FROM d, i""".stripMargin
  }

  /** Mirrors Core.featFisher (Market.withFisher, n=10): identical clamped
    * price-position tree (native rolling extrema), both EWMA recursions
    * replayed in ONE recursive CTE with two accumulators — the v-step tree
    * inlined into the fisher step exactly as the chained Ewma expressions
    * evaluate it. Seeded at rn = n per the Kama uniformity argument (x is
    * non-null there unless the first full frame is EXACTLY flat, which the
    * synthetic walk never is — validated at three SFs). */
  val featFisher: String = {
    val n = graft.features.Market.FisherWindow
    val a = graft.features.Market.FisherAlpha.toString
    val dcy = (1.0 - graft.features.Market.FisherAlpha).toString
    val f = frame(n)
    val nv = s"CASE WHEN k.x IS NULL THEN fe.v ELSE fe.v * $dcy + $a * k.x END"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, fk0 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, close, ROW_NUMBER() OVER ($W) AS rn,
       |         CASE WHEN COUNT(close) OVER ($f) = $n
       |                   AND MAX(close) OVER ($f) > MIN(close) OVER ($f)
       |              THEN (close - MIN(close) OVER ($f)) /
       |                   (MAX(close) OVER ($f) - MIN(close) OVER ($f))
       |         END AS pos
       |  FROM bars
       |), k AS MATERIALIZED (
       |  SELECT symbol, event_id, rn,
       |         CASE WHEN pos IS NOT NULL
       |              THEN GREATEST(LEAST(pos * 2.0 - 1.0, 0.999), -0.999)
       |         END AS x
       |  FROM fk0
       |), fe AS (
       |  SELECT symbol, rn, x AS v,
       |         ln((1.0 + x) / (1.0 - x)) AS fish
       |  FROM k WHERE rn = $n
       |  UNION ALL
       |  SELECT k.symbol, k.rn,
       |         $nv,
       |         fe.fish * 0.5 + 0.5 * ln((1.0 + ($nv)) / (1.0 - ($nv)))
       |  FROM fe JOIN k ON k.symbol = fe.symbol AND k.rn = fe.rn + 1
       |)
       |SELECT k.symbol, k.event_id,
       |       ${r("fe.fish")} AS fisher,
       |       ${r(s"LAG(fe.fish, 1) OVER (PARTITION BY k.symbol ORDER BY k.rn)")} AS fisher_signal
       |FROM k LEFT JOIN fe ON fe.symbol = k.symbol AND fe.rn = k.rn
       |ORDER BY k.event_id""".stripMargin
  }

  /** Mirrors Core.featKyleLambda (Market.withKyleLambda, n=20): identical
    * signed-flow/price-delta sums via the sequential cum−lag fold, same
    * variance gate and ×1e6 scaling. */
  val featKyleLambda: String = {
    val n = graft.features.Market.KyleWindow
    val varx = s"$n.0 * sxx - sx * sx"
    s"""$barsCte, ky0 AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS _dp,
       |         sign(close - LAG(close, 1) OVER ($W)) * volume AS _sv
       |  FROM bars
       |), ky1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("_sv")} AS _c_x,
       |         ${cumSum("_dp")} AS _c_y,
       |         ${cumSum("_sv * _dp")} AS _c_xy,
       |         COUNT(_sv * _dp) OVER ($Wrun) AS _c_xy_n,
       |         ${cumSum("_sv * _sv")} AS _c_xx
       |  FROM ky0
       |), ky2 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_x", n)} AS sx,
       |         ${cumRolling("_c_y", n)} AS sy,
       |         ${cumRolling("_c_xy", n)} AS sxy,
       |         ${cumRolling("_c_xx", n)} AS sxx,
       |         ${cumGate("_c_xy", n)} AS g
       |  FROM ky1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN g AND ($varx) > 0.0 THEN ($n.0 * sxy - sx * sy) / ($varx) * 1000000.0 END")} AS kyle_$n
       |FROM ky2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featSupertrend (Market.withSupertrend, n=14, m=3):
    * identical SMA-ATR bands (sequential cum−lag sums → bit-identical
    * doubles → every ratchet comparison branches the same way), then the
    * conditional band-ratchet + regime recursion replayed as a recursive
    * CTE seeded (ub, lb, +1) at the ATR warmup row (rn = n — tr is never
    * null, so the count gate opens there uniformly per symbol). The new
    * lower/upper band trees are inlined into the trend step exactly as the
    * window expression inlines them. */
  val featSupertrend: String = {
    val n = Params.SupertrendAtr
    val m = Params.SupertrendMult.toString
    val nflb = "CASE WHEN k.lb > st.flb OR k.prevc < st.flb THEN k.lb ELSE st.flb END"
    val nfub = "CASE WHEN k.ub < st.fub OR k.prevc > st.fub THEN k.ub ELSE st.fub END"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, sa1 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, high, low, close,
       |         LAG(close, 1) OVER ($W) AS prevc,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         COALESCE(
       |           GREATEST(high - low,
       |                    abs(high - LAG(close, 1) OVER ($W)),
       |                    abs(low - LAG(close, 1) OVER ($W))),
       |           high - low) AS tr
       |  FROM bars
       |), sa2 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, high, low, close, prevc, rn, tr,
       |         ${cumSum("tr")} AS _c_tr,
       |         COUNT(tr) OVER ($Wrun) AS _c_tr_n
       |  FROM sa1
       |), k AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, close, prevc,
       |         (high + low) / 2.0 + $m * atr AS ub,
       |         (high + low) / 2.0 - $m * atr AS lb
       |  FROM (
       |    SELECT *, CASE WHEN ${cumGate("_c_tr", n)}
       |                   THEN (${cumRolling("_c_tr", n)}) / $n END AS atr
       |    FROM sa2)
       |), st AS (
       |  SELECT symbol, rn, ub AS fub, lb AS flb, CAST(1.0 AS DOUBLE) AS trend
       |  FROM k WHERE rn = $n
       |  UNION ALL
       |  SELECT k.symbol, k.rn,
       |         $nfub,
       |         $nflb,
       |         CASE WHEN st.trend = 1.0
       |              THEN CASE WHEN k.close < ($nflb) THEN -1.0 ELSE 1.0 END
       |              ELSE CASE WHEN k.close > ($nfub) THEN 1.0 ELSE -1.0 END
       |         END
       |  FROM st JOIN k ON k.symbol = st.symbol AND k.rn = st.rn + 1
       |)
       |SELECT k.symbol, k.event_id,
       |       ${r("CASE WHEN st.trend = 1.0 THEN st.flb ELSE st.fub END")} AS supertrend,
       |       CAST(st.trend AS INT) AS st_trend
       |FROM k LEFT JOIN st ON st.symbol = k.symbol AND st.rn = k.rn
       |ORDER BY k.event_id""".stripMargin
  }

  /** Mirrors Core.featPivotPoints (Market.withPivotPoints): day-grain
    * MAX/MIN/arg_max aggregate (all order-insensitive / key-deterministic,
    * bit-portable natively), per-symbol day lag, identical level
    * arithmetic, date-keyed left join back onto the bars. */
  val featPivotPoints: String =
    s"""$barsCte, pday AS (
       |  SELECT symbol, CAST(datetime AS DATE) AS d,
       |         MAX(high) AS dh, MIN(low) AS dl, arg_max(close, event_id) AS dc
       |  FROM bars GROUP BY symbol, CAST(datetime AS DATE)
       |), pprev AS (
       |  SELECT symbol, d,
       |         LAG(dh, 1) OVER (PARTITION BY symbol ORDER BY d) AS ph,
       |         LAG(dl, 1) OVER (PARTITION BY symbol ORDER BY d) AS pl,
       |         LAG(dc, 1) OVER (PARTITION BY symbol ORDER BY d) AS pc
       |  FROM pday
       |), piv AS (
       |  SELECT symbol, d,
       |         (ph + pl + pc) / 3.0 AS pivot,
       |         (ph + pl + pc) / 3.0 * 2.0 - pl AS pivot_r1,
       |         (ph + pl + pc) / 3.0 * 2.0 - ph AS pivot_s1,
       |         (ph + pl + pc) / 3.0 + (ph - pl) AS pivot_r2,
       |         (ph + pl + pc) / 3.0 - (ph - pl) AS pivot_s2
       |  FROM pprev
       |)
       |SELECT b.symbol, b.event_id,
       |       ${r("p.pivot")} AS pivot, ${r("p.pivot_r1")} AS pivot_r1,
       |       ${r("p.pivot_s1")} AS pivot_s1, ${r("p.pivot_r2")} AS pivot_r2,
       |       ${r("p.pivot_s2")} AS pivot_s2
       |FROM bars b LEFT JOIN piv p ON p.symbol = b.symbol AND p.d = CAST(b.datetime AS DATE)
       |ORDER BY b.event_id""".stripMargin

  /** Mirrors Core.featDonchian (Market.withDonchian, n=20): rolling
    * MIN/MAX extrema (order-insensitive, bit-portable natively) with the
    * full-frame gate; position gated on a non-degenerate channel. */
  val featDonchian: String = {
    val n = graft.features.Market.DonchianWindow
    val f = frame(n)
    s"""$barsCte, d1 AS (
       |  SELECT symbol, event_id, close,
       |         MAX(high) OVER ($f) AS hh, MIN(low) OVER ($f) AS ll,
       |         COUNT(close) OVER ($f) AS cnt
       |  FROM bars
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN cnt = $n THEN hh END")} AS donchian_high,
       |       ${r(s"CASE WHEN cnt = $n THEN ll END")} AS donchian_low,
       |       ${r(s"CASE WHEN cnt = $n THEN (hh + ll) / 2 END")} AS donchian_mid,
       |       ${r(s"CASE WHEN cnt = $n AND hh > ll THEN (close - ll) / (hh - ll) END")} AS donchian_pos
       |FROM d1 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featIchimoku (Market.withIchimoku, 9/26/52): rolling
    * MIN/MAX midpoints with full-frame gates; the senkou spans are the
    * 26-bar LAG of the combined lines (causal reading, no lookahead). */
  val featIchimoku: String = {
    import graft.features.{Market => M}
    def mid(n: Int, tag: String) =
      s"CASE WHEN COUNT(close) OVER (${frame(n)}) = $n THEN " +
        s"(MAX(high) OVER (${frame(n)}) + MIN(low) OVER (${frame(n)})) / 2 END AS $tag"
    s"""$barsCte, i1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${mid(M.IchimokuTenkan, "tenkan")},
       |         ${mid(M.IchimokuKijun, "kijun")},
       |         ${mid(M.IchimokuSenkouB, "spanb_raw")}
       |  FROM bars
       |), i2 AS (
       |  SELECT symbol, event_id, tenkan, kijun,
       |         LAG((tenkan + kijun) / 2, ${M.IchimokuShift}) OVER ($W) AS senkou_a,
       |         LAG(spanb_raw, ${M.IchimokuShift}) OVER ($W) AS senkou_b
       |  FROM i1
       |)
       |SELECT symbol, event_id,
       |       ${r("tenkan")} AS ichimoku_tenkan,
       |       ${r("kijun")} AS ichimoku_kijun,
       |       ${r("senkou_a")} AS ichimoku_senkou_a,
       |       ${r("senkou_b")} AS ichimoku_senkou_b
       |FROM i2 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featCci (Market.withCci, n=20): the frame-ordered list
    * replays Spark's sequential `aggregate` fold (list_sum == the 0.0-seeded
    * left fold, same argument as cumSum); mean deviation is folded from the
    * same array with the frame's own mean, in identical op order. */
  val featCci: String = {
    val n = graft.features.Market.CciWindow
    val f = frame(n)
    s"""$barsCte, c1 AS (
       |  SELECT symbol, event_id, datetime, (high + low + close) / 3 AS tp
       |  FROM bars
       |), c2 AS (
       |  SELECT symbol, event_id, tp,
       |         CASE WHEN COUNT(tp) OVER ($f) = $n
       |              THEN list(tp) OVER ($f) END AS arr
       |  FROM c1
       |), c3 AS (
       |  SELECT symbol, event_id, tp, arr, list_sum(arr) / $n AS m FROM c2
       |), c4 AS (
       |  SELECT symbol, event_id, tp, m,
       |         list_sum(list_transform(arr, x -> abs(x - m))) / $n AS md
       |  FROM c3
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN md > 0.0 THEN (tp - m) / (0.015 * md) END")} AS cci
       |FROM c4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featKeltner (Market.withKeltner): recursive-CTE replay of
    * the adjust=true EMA(tp, 20) (MACD's recurrence: num·d + x, den·d + 1),
    * ATR(10) via the cum−lag identity, bands mid ± 2·atr in identical op
    * order, position gated on atr > 0. */
  val featKeltner: String = {
    val sp = graft.features.Market.KeltnerWindow
    val an = graft.features.Market.KeltnerAtrWindow
    val mu = graft.features.Market.KeltnerMult
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, k1 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, close,
       |         (high + low + close) / 3 AS tp,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         COALESCE(GREATEST(high - low,
       |                           abs(high - LAG(close, 1) OVER ($W)),
       |                           abs(low - LAG(close, 1) OVER ($W))),
       |                  high - low) AS tr
       |  FROM bars
       |), k2 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, close, rn,
       |         ${cumSum("tr")} AS _c_tr,
       |         COUNT(tr) OVER ($Wrun) AS _c_tr_n
       |  FROM k1
       |), ema AS (
       |  SELECT symbol, rn, tp AS nm, CAST(1.0 AS DOUBLE) AS dn
       |  FROM k1 WHERE rn = 1
       |  UNION ALL
       |  SELECT k1.symbol, k1.rn, ema.nm * ${d(sp)} + k1.tp, ema.dn * ${d(sp)} + 1.0
       |  FROM ema JOIN k1 ON k1.symbol = ema.symbol AND k1.rn = ema.rn + 1
       |), k3 AS (
       |  SELECT symbol, event_id, close, rn,
       |         CASE WHEN ${cumGate("_c_tr", an)}
       |              THEN (${cumRolling("_c_tr", an)}) / $an END AS atr
       |  FROM k2
       |), k4 AS (
       |  SELECT k3.symbol, k3.event_id, k3.close,
       |         ema.nm / ema.dn AS mid,
       |         ema.nm / ema.dn + $mu * k3.atr AS up,
       |         ema.nm / ema.dn - $mu * k3.atr AS lo,
       |         k3.atr
       |  FROM k3 JOIN ema ON ema.symbol = k3.symbol AND ema.rn = k3.rn
       |)
       |SELECT symbol, event_id,
       |       ${r("mid")} AS keltner_mid,
       |       ${r("up")} AS keltner_high,
       |       ${r("lo")} AS keltner_low,
       |       ${r("CASE WHEN atr > 0.0 THEN (close - lo) / (up - lo) END")} AS keltner_pos
       |FROM k4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featAdx (Market.withAdx, n=14): one recursive pass for
    * the three Wilder smoothers (adjust=false: y·(1−α) + α·x, seeded at
    * row 2 where directional movement first exists), a second for ADX over
    * the derived DX series with null-skip state (an IS NULL == not yet
    * seeded), replaying graft.expr.Ewma's exact update order. */
  val featAdx: String = {
    val n = graft.features.Market.AdxWindow
    val aw = (1.0 / n).toString
    val dw = (1.0 - 1.0 / n).toString
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, high, low, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         LAG(high, 1) OVER ($W) AS ph,
       |         LAG(low, 1) OVER ($W) AS pl,
       |         LAG(close, 1) OVER ($W) AS pc
       |  FROM bars
       |), m AS MATERIALIZED (
       |  SELECT symbol, event_id, rn,
       |         CASE WHEN (high - ph) > (pl - low) AND (high - ph) > 0 THEN high - ph
       |              WHEN ph IS NOT NULL THEN 0.0 END AS pdm,
       |         CASE WHEN (pl - low) > (high - ph) AND (pl - low) > 0 THEN pl - low
       |              WHEN pl IS NOT NULL THEN 0.0 END AS mdm,
       |         CASE WHEN pc IS NOT NULL
       |              THEN GREATEST(high - low, abs(high - pc), abs(low - pc)) END AS trw
       |  FROM b2
       |), st AS (
       |  SELECT symbol, rn, pdm AS sp, mdm AS sm, trw AS str FROM m WHERE rn = 2
       |  UNION ALL
       |  SELECT m.symbol, m.rn,
       |         st.sp * $dw + $aw * m.pdm,
       |         st.sm * $dw + $aw * m.mdm,
       |         st.str * $dw + $aw * m.trw
       |  FROM st JOIN m ON m.symbol = st.symbol AND m.rn = st.rn + 1
       |), dx2 AS MATERIALIZED (
       |  SELECT m.symbol, m.event_id, m.rn,
       |         CASE WHEN st.str > 0.0 THEN 100.0 * st.sp / st.str END AS pdi,
       |         CASE WHEN st.str > 0.0 THEN 100.0 * st.sm / st.str END AS mdi
       |  FROM m LEFT JOIN st ON st.symbol = m.symbol AND st.rn = m.rn
       |), dx3 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, pdi, mdi,
       |         CASE WHEN pdi + mdi > 0.0
       |              THEN 100.0 * abs(pdi - mdi) / (pdi + mdi) END AS dx
       |  FROM dx2
       |), ax AS (
       |  SELECT symbol, rn, dx AS an FROM dx3 WHERE rn = 2
       |  UNION ALL
       |  SELECT d.symbol, d.rn,
       |         CASE WHEN ax.an IS NULL THEN d.dx
       |              WHEN d.dx IS NULL THEN ax.an
       |              ELSE ax.an * $dw + $aw * d.dx END
       |  FROM ax JOIN dx3 d ON d.symbol = ax.symbol AND d.rn = ax.rn + 1
       |)
       |SELECT d.symbol, d.event_id,
       |       ${r("d.pdi")} AS plus_di, ${r("d.mdi")} AS minus_di,
       |       ${r("ax.an")} AS adx
       |FROM dx3 d LEFT JOIN ax ON ax.symbol = d.symbol AND ax.rn = d.rn
       |ORDER BY d.event_id""".stripMargin
  }

  /** Mirrors Core.featObv: sign(Δclose)·volume running sum (first row
    * coalesces to 0; signed integer-valued terms sum exactly). */
  val featObv: String =
    s"""$barsCte, o1 AS (
       |  SELECT symbol, event_id, datetime,
       |         COALESCE(sign(close - LAG(close, 1) OVER ($W)), 0.0) * volume AS _d
       |  FROM bars
       |)
       |SELECT symbol, event_id, ${r(s"COALESCE(list_sum(list(_d) OVER ($Wrun)), 0.0)")} AS obv
       |FROM o1 ORDER BY event_id""".stripMargin

  /** Mirrors Core.featMfi (n=14): positive/negative typical-price flows,
    * sequential cum−lag rolling sums, gated RSI-form ratio. */
  val featMfi: String = {
    val n = graft.features.Market.MfiWindow
    s"""$barsCte, m1 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN (high + low + close) / 3.0 - LAG((high + low + close) / 3.0, 1) OVER ($W) > 0
       |              THEN (high + low + close) / 3.0 * volume ELSE 0.0 END AS _pflow,
       |         CASE WHEN (high + low + close) / 3.0 - LAG((high + low + close) / 3.0, 1) OVER ($W) < 0
       |              THEN (high + low + close) / 3.0 * volume ELSE 0.0 END AS _nflow
       |  FROM bars
       |), m2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("_pflow")} AS _c_pf,
       |         COUNT(_pflow) OVER ($Wrun) AS _c_pf_n,
       |         ${cumSum("_nflow")} AS _c_nf
       |  FROM m1
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN ${cumGate("_c_pf", n)} THEN 100.0 - 100.0 / (1.0 + (${cumRolling("_c_pf", n)}) / (${cumRolling("_c_nf", n)})) END")} AS mfi_$n
       |FROM m2 ORDER BY event_id""".stripMargin
  }

  val featDrawdown: String =
    s"""$barsCte, d1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         MAX(close) OVER ($Wrun) AS peak
       |  FROM bars
       |), d2 AS (
       |  SELECT symbol, event_id, datetime, close, peak,
       |         (close - peak) / peak AS drawdown
       |  FROM d1
       |)
       |SELECT symbol, event_id, ${r("peak")} AS peak,
       |       ${r("drawdown")} AS drawdown,
       |       ${r(s"MIN(drawdown) OVER ($Wrun)")} AS max_drawdown
       |FROM d2 ORDER BY event_id""".stripMargin

  val featTemporal: String = {
    def enc(field: String, name: String, modulo: Int): Seq[String] = Seq(
      s"${r(s"sin(CAST(EXTRACT($field FROM ts) AS DOUBLE) * 2 * $pi / $modulo)")} AS ${name}_sin",
      s"${r(s"cos(CAST(EXTRACT($field FROM ts) AS DOUBLE) * 2 * $pi / $modulo)")} AS ${name}_cos")
    val encs = (enc("hour", "hour", 24) ++ enc("isodow", "day_of_week", 7) ++
      enc("month", "month", 12)).mkString(",\n       ")
    s"""SELECT event_id,
       |       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       |       CAST(EXTRACT(minute FROM ts) AS BIGINT) AS minute,
       |       CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS day_of_week,
       |       CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
       |       CAST(EXTRACT(month FROM ts) AS BIGINT) AS month,
       |       $encs
       |FROM events ORDER BY event_id""".stripMargin
  }

  val featBollinger: String = {
    val n = Params.BbPeriod
    val k = Params.BbStd
    s"""$barsCte, b1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_bc,
       |         COUNT(close) OVER ($Wrun) AS _c_bc_n,
       |         ${cumSum("close * close")} AS _c_bc2
       |  FROM bars
       |), b1b AS (
       |  SELECT symbol, event_id, close,
       |         ${cumRolling("_c_bc", n)} AS s1,
       |         ${cumRolling("_c_bc2", n)} AS s2,
       |         ${cumGate("_c_bc", n)} AS g
       |  FROM b1
       |), b2 AS (
       |  SELECT symbol, event_id, close,
       |         CASE WHEN g THEN s1 / $n END AS mid,
       |         CASE WHEN g THEN sqrt(greatest((s2 - s1 * s1 / $n) / ${n - 1}, 0.0)) END AS sd
       |  FROM b1b
       |)
       |SELECT symbol, event_id,
       |       ${r("mid")} AS bb_middle,
       |       ${r(s"mid + sd * $k")} AS bb_upper,
       |       ${r(s"mid - sd * $k")} AS bb_lower,
       |       ${r(s"((mid + sd * $k) - (mid - sd * $k)) / mid")} AS bb_width
       |FROM b2 ORDER BY event_id""".stripMargin
  }

  /** EWMA oracles: DuckDB recursive CTEs replaying the EXACT recurrence the
    * Catalyst Ewma expression evaluates (same seeding, same per-step
    * arithmetic tree) — the only formulation that is bit-identical to a
    * stateful recurrence. Alpha/decay literals are emitted via Double.toString
    * (shortest round-trip repr) so both engines parse the same doubles. */
  private def a(span: Int): String = (2.0 / (span + 1)).toString
  private def d(span: Int): String = (1.0 - 2.0 / (span + 1)).toString

  val featRsi: String = {
    val p = Params.RsiPeriod
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), g AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2,
       |         CAST(delta > 0 AS DOUBLE) * delta AS gain,
       |         CAST(delta < 0 AS DOUBLE) * (-delta) AS loss
       |  FROM b2 WHERE delta IS NOT NULL
       |), ew AS (
       |  SELECT symbol, rn2, gain AS ag, loss AS al FROM g WHERE rn2 = 1
       |  UNION ALL
       |  SELECT g.symbol, g.rn2,
       |         ew.ag * ${d(p)} + ${a(p)} * g.gain,
       |         ew.al * ${d(p)} + ${a(p)} * g.loss
       |  FROM ew JOIN g ON g.symbol = ew.symbol AND g.rn2 = ew.rn2 + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("100 - (100 / (1 + ew.ag / (ew.al + 1e-10)))")} AS rsi
       |FROM b2
       |LEFT JOIN g ON g.symbol = b2.symbol AND g.event_id = b2.event_id
       |LEFT JOIN ew ON ew.symbol = g.symbol AND ew.rn2 = g.rn2
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Core.barsCandles (Market.withCandles): the same comparison
    * predicates and 0.1/2.0 shadow-body multipliers — all-integer flags,
    * null lags coalesce to 0 on both engines. */
  val barsCandles: String = {
    val body = "abs(close - open)"
    val upper = "high - greatest(open, close)"
    val lower = "least(open, close) - low"
    val po = s"LAG(open, 1) OVER ($W)"
    val pc = s"LAG(close, 1) OVER ($W)"
    s"""$barsCte, c1 AS (
       |  SELECT symbol, event_id, open, high, low, close,
       |         $po AS po, $pc AS pc
       |  FROM bars
       |)
       |SELECT symbol, event_id,
       |       COALESCE(CAST(high > low AND $body <= 0.1 * (high - low) AS INT), 0) AS candle_doji,
       |       COALESCE(CAST($lower >= 2.0 * $body AND $upper <= $body AS INT), 0) AS candle_hammer,
       |       COALESCE(CAST(pc < po AND close > open AND open <= pc AND close >= po AS INT), 0) AS candle_engulf_bull,
       |       COALESCE(CAST(pc > po AND close < open AND open >= pc AND close <= po AS INT), 0) AS candle_engulf_bear
       |FROM c1 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featStochRsi (Market.withStochRsi, range 14, %K SMA 3):
    * the featRsi recursion verbatim, then native rolling MIN/MAX
    * (order-insensitive) and the cum−lag 3-bar SMA with the identical
    * count gate — no sliding-frame float sum on either engine. */
  val featStochRsi: String = {
    val p = Params.RsiPeriod
    val n = graft.features.Market.StochRsiWindow
    val Wr = "PARTITION BY symbol ORDER BY rn"
    val fr = s"$Wr ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
    val run = s"$Wr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), g AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2,
       |         CAST(delta > 0 AS DOUBLE) * delta AS gain,
       |         CAST(delta < 0 AS DOUBLE) * (-delta) AS loss
       |  FROM b2 WHERE delta IS NOT NULL
       |), ew AS (
       |  SELECT symbol, rn2, gain AS ag, loss AS al FROM g WHERE rn2 = 1
       |  UNION ALL
       |  SELECT g.symbol, g.rn2,
       |         ew.ag * ${d(p)} + ${a(p)} * g.gain,
       |         ew.al * ${d(p)} + ${a(p)} * g.loss
       |  FROM ew JOIN g ON g.symbol = ew.symbol AND g.rn2 = ew.rn2 + 1
       |), rs AS MATERIALIZED (
       |  SELECT b2.symbol, b2.event_id, b2.rn,
       |         100 - (100 / (1 + ew.ag / (ew.al + 1e-10))) AS rsi
       |  FROM b2
       |  LEFT JOIN g ON g.symbol = b2.symbol AND g.event_id = b2.event_id
       |  LEFT JOIN ew ON ew.symbol = g.symbol AND ew.rn2 = g.rn2
       |), st AS (
       |  SELECT symbol, event_id, rn,
       |         CASE WHEN COUNT(rsi) OVER ($fr) = $n
       |                   AND MAX(rsi) OVER ($fr) > MIN(rsi) OVER ($fr)
       |              THEN (rsi - MIN(rsi) OVER ($fr))
       |                     / (MAX(rsi) OVER ($fr) - MIN(rsi) OVER ($fr)) * 100.0
       |         END AS stochrsi
       |  FROM rs
       |), cm AS (
       |  SELECT symbol, event_id, rn, stochrsi,
       |         COALESCE(list_sum(list(stochrsi) OVER ($run)), 0.0) AS c,
       |         COUNT(stochrsi) OVER ($run) AS cn
       |  FROM st
       |)
       |SELECT symbol, event_id, ${r("stochrsi")} AS stochrsi,
       |       ${r(s"CASE WHEN cn - COALESCE(LAG(cn, 3) OVER ($Wr), 0) = 3 " +
      s"THEN (c - COALESCE(LAG(c, 3) OVER ($Wr), 0.0)) / 3.0 END")} AS stochrsi_k
       |FROM cm ORDER BY event_id""".stripMargin
  }

  val featMacd: String = {
    val f = Params.MacdFast
    val sl = Params.MacdSlow
    val sg = Params.MacdSignal
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), emas AS (
       |  SELECT symbol, rn, close AS nf, CAST(1.0 AS DOUBLE) AS df, close AS ns, CAST(1.0 AS DOUBLE) AS ds
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         emas.nf * ${d(f)} + b2.close,  emas.df * ${d(f)} + 1.0,
       |         emas.ns * ${d(sl)} + b2.close, emas.ds * ${d(sl)} + 1.0
       |  FROM emas JOIN b2 ON b2.symbol = emas.symbol AND b2.rn = emas.rn + 1
       |), m AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df - ns / ds AS macd FROM emas
       |), sig AS (
       |  SELECT symbol, rn, macd, macd AS sn, CAST(1.0 AS DOUBLE) AS sd FROM m WHERE rn = 1
       |  UNION ALL
       |  SELECT m.symbol, m.rn, m.macd,
       |         sig.sn * ${d(sg)} + m.macd, sig.sd * ${d(sg)} + 1.0
       |  FROM sig JOIN m ON m.symbol = sig.symbol AND m.rn = sig.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("sig.macd")} AS macd,
       |       ${r("sig.sn / sig.sd")} AS macd_signal,
       |       ${r("sig.macd - sig.sn / sig.sd")} AS macd_histogram
       |FROM b2 JOIN sig ON sig.symbol = b2.symbol AND sig.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Analytics.windowHolt / expr.Holt: recursive-CTE replay of the
    * exact level/trend recurrence — l' = α·x + (1-α)·(l+b) inlined into
    * b' = β·(l'-l) + (1-β)·b, the same tree the Catalyst expression
    * evaluates (so every double matches); seed l₁=x₁, b₁=0. */
  val windowHolt: String = {
    val al = Params.HoltAlpha.toString
    val be = Params.HoltBeta.toString
    val dal = (1.0 - Params.HoltAlpha).toString
    val dbe = (1.0 - Params.HoltBeta).toString
    val nl = s"$al * b2.close + $dal * (h.l + h.b)"
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn FROM bars
       |), h AS (
       |  SELECT symbol, rn, close AS l, CAST(0.0 AS DOUBLE) AS b
       |  FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         $nl,
       |         $be * (($nl) - h.l) + $dbe * h.b
       |  FROM h JOIN b2 ON b2.symbol = h.symbol AND b2.rn = h.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id,
       |       ${r("h.l")} AS holt_level,
       |       ${r("h.b")} AS holt_trend,
       |       ${r("h.l + h.b")} AS holt_forecast
       |FROM b2 JOIN h ON h.symbol = b2.symbol AND h.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Mirrors Analytics.windowKama / expr.Kama: identical efficiency-ratio
    * arithmetic (cum−lag rolling volatility, 0-on-flat guard, α = (er·C₁ +
    * C₂)² with the SAME precomputed double constants), then the
    * data-dependent recursion v' = v + α·(close − v) replayed as a
    * recursive CTE seeded at the first complete-window row (rn = n+1 —
    * α is non-null exactly from there, uniformly per symbol). */
  val windowKama: String = {
    val n = Params.KamaWindow
    val c1 = (2.0 / (Params.KamaFast + 1.0) - 2.0 / (Params.KamaSlow + 1.0)).toString
    val c2 = (2.0 / (Params.KamaSlow + 1.0)).toString
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, close, ROW_NUMBER() OVER ($W) AS rn,
       |         ABS(close - LAG(close, 1) OVER ($W)) AS absd,
       |         ABS(close - LAG(close, $n) OVER ($W)) AS change
       |  FROM bars
       |), k1 AS MATERIALIZED (
       |  SELECT symbol, event_id, datetime, rn, close, change,
       |         ${cumSum("absd")} AS cum,
       |         COUNT(absd) OVER (${frame(n)}) AS cnt
       |  FROM b2
       |), k2 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, close, change, cnt,
       |         cum - COALESCE(LAG(cum, $n) OVER ($W), 0.0) AS vol
       |  FROM k1
       |), k3 AS MATERIALIZED (
       |  SELECT symbol, event_id, rn, close, er,
       |         (er * $c1 + $c2) * (er * $c1 + $c2) AS alpha
       |  FROM (
       |    SELECT *, CASE WHEN cnt = $n THEN
       |             CASE WHEN vol > 0 THEN change / vol ELSE 0.0 END END AS er
       |    FROM k2)
       |), kr AS (
       |  SELECT symbol, rn, close AS v FROM k3 WHERE rn = ${n + 1}
       |  UNION ALL
       |  SELECT k.symbol, k.rn, kr.v + k.alpha * (k.close - kr.v)
       |  FROM kr JOIN k3 k ON k.symbol = kr.symbol AND k.rn = kr.rn + 1
       |)
       |SELECT k3.symbol, k3.event_id,
       |       ${r("k3.er")} AS er,
       |       ${r("k3.alpha")} AS kama_alpha,
       |       ${r("kr.v")} AS kama
       |FROM k3 LEFT JOIN kr ON kr.symbol = k3.symbol AND kr.rn = k3.rn
       |ORDER BY k3.event_id""".stripMargin
  }

  /** Mirrors Analytics.windowEwmVol: both adjust=false recurrences (mean
    * of x, mean of x²) replayed in one recursive CTE with two
    * accumulators — the same per-step `m·d + a·x` tree as the Ewma
    * expression, so every double matches. */
  val windowEwmVol: String = {
    val span = 20
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, b2 AS MATERIALIZED (
       |  SELECT symbol, event_id, close, ROW_NUMBER() OVER ($W) AS rn
       |  FROM bars
       |), ew AS (
       |  SELECT symbol, rn, close AS m1, close * close AS m2 FROM b2 WHERE rn = 1
       |  UNION ALL
       |  SELECT b2.symbol, b2.rn,
       |         ew.m1 * ${d(span)} + ${a(span)} * b2.close,
       |         ew.m2 * ${d(span)} + ${a(span)} * (b2.close * b2.close)
       |  FROM ew JOIN b2 ON b2.symbol = ew.symbol AND b2.rn = ew.rn + 1
       |)
       |SELECT b2.symbol, b2.event_id, ${r("ew.m1")} AS ewm_mean,
       |       ${r("sqrt(GREATEST(ew.m2 - ew.m1 * ew.m1, 0.0))")} AS ewm_std
       |FROM b2 JOIN ew ON ew.symbol = b2.symbol AND ew.rn = b2.rn
       |ORDER BY b2.event_id""".stripMargin
  }

  /** Self-contained RSI+MACD CTE chain for mlMatrix (names prefixed t* to
    * avoid clashing with the f* feature chain). Produces `tech(symbol,
    * event_id, rsi, macd, macd_signal, macd_histogram)`. */
  private[oracle] val techCtes: String = {
    val p = Params.RsiPeriod
    val f = Params.MacdFast
    val sl = Params.MacdSlow
    val sg = Params.MacdSignal
    s""", tb AS MATERIALIZED (
       |  SELECT symbol, event_id, close,
       |         ROW_NUMBER() OVER ($W) AS rn,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), tg AS MATERIALIZED (
       |  SELECT symbol, event_id, rn - 1 AS rn2,
       |         CAST(delta > 0 AS DOUBLE) * delta AS gain,
       |         CAST(delta < 0 AS DOUBLE) * (-delta) AS loss
       |  FROM tb WHERE delta IS NOT NULL
       |), tew AS (
       |  SELECT symbol, rn2, gain AS ag, loss AS al FROM tg WHERE rn2 = 1
       |  UNION ALL
       |  SELECT tg.symbol, tg.rn2,
       |         tew.ag * ${d(p)} + ${a(p)} * tg.gain,
       |         tew.al * ${d(p)} + ${a(p)} * tg.loss
       |  FROM tew JOIN tg ON tg.symbol = tew.symbol AND tg.rn2 = tew.rn2 + 1
       |), temas AS (
       |  SELECT symbol, rn, close AS nf, CAST(1.0 AS DOUBLE) AS df, close AS ns, CAST(1.0 AS DOUBLE) AS ds
       |  FROM tb WHERE rn = 1
       |  UNION ALL
       |  SELECT tb.symbol, tb.rn,
       |         temas.nf * ${d(f)} + tb.close,  temas.df * ${d(f)} + 1.0,
       |         temas.ns * ${d(sl)} + tb.close, temas.ds * ${d(sl)} + 1.0
       |  FROM temas JOIN tb ON tb.symbol = temas.symbol AND tb.rn = temas.rn + 1
       |), tmm AS MATERIALIZED (
       |  SELECT symbol, rn, nf / df - ns / ds AS macd FROM temas
       |), tsig AS (
       |  SELECT symbol, rn, macd, macd AS sn, CAST(1.0 AS DOUBLE) AS sd FROM tmm WHERE rn = 1
       |  UNION ALL
       |  SELECT tmm.symbol, tmm.rn, tmm.macd,
       |         tsig.sn * ${d(sg)} + tmm.macd, tsig.sd * ${d(sg)} + 1.0
       |  FROM tsig JOIN tmm ON tmm.symbol = tsig.symbol AND tmm.rn = tsig.rn + 1
       |), tech AS MATERIALIZED (
       |  SELECT tb.symbol, tb.event_id,
       |         100 - (100 / (1 + tew.ag / (tew.al + 1e-10))) AS rsi,
       |         tsig.macd AS macd,
       |         tsig.sn / tsig.sd AS macd_signal,
       |         tsig.macd - tsig.sn / tsig.sd AS macd_histogram
       |  FROM tb
       |  LEFT JOIN tg ON tg.symbol = tb.symbol AND tg.event_id = tb.event_id
       |  LEFT JOIN tew ON tew.symbol = tg.symbol AND tew.rn2 = tg.rn2
       |  JOIN tsig ON tsig.symbol = tb.symbol AND tsig.rn = tb.rn
       |)""".stripMargin
  }

  /** Mirrors Analytics.graphPagerank (Graph.pageRank over the symmetrized
    * supplier↔part graph): every damped iteration replayed with a chained
    * CTE — teleport base embedded as the SAME Scala-computed double
    * literal, rank/outdeg and the damped sum in identical association
    * order. Grouped double sums are order-free only to ~1 ulp; 10
    * iterations keep the drift ~1e-14 relative, far inside the 6-decimal
    * floor rounding. */
  val graphPagerank: String = {
    val d = graft.analytics.Graph.PrDamping
    val t = 1.0 - graft.analytics.Graph.PrDamping
    val iters = graft.analytics.Graph.PrIters
    val rks = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT nodes.node,
         |         CAST($t AS DOUBLE) / nn.n + $d * COALESCE(c.s, 0.0) AS rank
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank / e.outdeg) AS s
         |    FROM ew e JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY 1
         |  ) c ON c.node = nodes.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH p0 AS (
       |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS a,
       |                  'p' || CAST(l_partkey AS VARCHAR) AS b
       |  FROM lineitem
       |), edges AS (
       |  SELECT a AS src, b AS dst FROM p0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM p0
       |), deg AS (
       |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
       |), ew AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.src = e.src
       |), nodes AS MATERIALIZED (
       |  SELECT DISTINCT src AS node FROM edges
       |), nn AS (
       |  SELECT COUNT(*) AS n FROM nodes
       |), r0 AS (
       |  SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn
       |),
       |$rks
       |SELECT node, ${r("rank")} AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** Mirrors Analytics.graphPagerankDirected (generalized Graph.pageRank
    * over the directed customer→part graph): nodes from src ∪ dst, and each
    * iteration's dangling mass D_{k−1} = Σ rank over the dst-only node set
    * replayed as its own CTE, folded in as d · (contrib + D/N) — the same
    * association order as the Spark round (which reduces D to a driver
    * scalar; both engines compute sum-then-divide, so the only cross-engine
    * surface is double-sum order, ~1e-13 relative over 10 rounds, far
    * inside the 6-decimal floor rounding). */
  val graphPagerankDirected: String = {
    val d = graft.analytics.Graph.PrDamping
    val t = 1.0 - graft.analytics.Graph.PrDamping
    val iters = graft.analytics.Graph.PrIters
    val tol = graft.analytics.Graph.PrDirectedTol
    // Budget replay with the same early-exit test the Spark run applies:
    // st$k is the stop flag BEFORE round k (L1 delta of round k−1 vs its
    // prev column ≤ tol; NULL prev on r0 → never stop before round 1).
    // A stopped round copies ranks forward unchanged — an exact no-op, so
    // the fixed budget lands bit-for-bit on the early-exited run's ranks
    // at any SF. The Spark side's margin guard keeps the stop decision out
    // of float-noise range of tol.
    val from = graft.analytics.Graph.PrDirectedTolFrom
    val rks = (1 to iters).map { k =>
      // rounds <= tolFrom never stop, BY RULE on both engines (the Spark
      // side skips those checks entirely — st$k tests round k−1's delta)
      val stTest =
        if (k <= from) "SELECT FALSE AS stop"
        else s"SELECT COALESCE(SUM(ABS(rank - prev)) <= CAST('$tol' AS DOUBLE), FALSE) AS stop\n         |  FROM r${k - 1}"
      s"""st$k AS (
         |  $stTest
         |), dm$k AS (
         |  SELECT COALESCE(SUM(r.rank), 0.0) AS m
         |  FROM r${k - 1} r JOIN dangling g ON g.node = r.node
         |), r$k AS MATERIALIZED (
         |  SELECT nodes.node,
         |         CASE WHEN st$k.stop THEN p.rank
         |              ELSE CAST($t AS DOUBLE) / nn.n
         |                + $d * (COALESCE(c.s, 0.0) + dm$k.m / nn.n) END AS rank,
         |         p.rank AS prev
         |  FROM nodes CROSS JOIN nn CROSS JOIN dm$k CROSS JOIN st$k
         |  JOIN r${k - 1} p ON p.node = nodes.node
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank / e.outdeg) AS s
         |    FROM ew e JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY 1
         |  ) c ON c.node = nodes.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |                  'p' || CAST(l.l_partkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), deg AS (
       |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
       |), ew AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.src = e.src
       |), nodes AS MATERIALIZED (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), dangling AS MATERIALIZED (
       |  SELECT node FROM nodes
       |  WHERE node NOT IN (SELECT src FROM edges)
       |), nn AS (
       |  SELECT COUNT(*) AS n FROM nodes
       |), r0 AS (
       |  SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank,
       |         CAST(NULL AS DOUBLE) AS prev
       |  FROM nodes CROSS JOIN nn
       |),
       |$rks
       |SELECT node, ${r("rank")} AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** Mirrors Analytics.graphPpr: the directed-PageRank replay with the
    * uniform teleport swapped for the seed-indicator vector tp (1/|S∩nodes|
    * on BUILDING customers, 0 elsewhere) — identical association order
    * `(1−d)·tp + d·(contrib + D·tp)` as the Spark round, so unreachable
    * nodes stay exactly 0.0 on both engines and the only float surface is
    * sum order under the 6-decimal floor rounding. */
  val graphPpr: String = {
    val d = graft.analytics.Graph.PrDamping
    val t = 1.0 - graft.analytics.Graph.PrDamping
    val iters = graft.analytics.Graph.PrIters
    val rks = (1 to iters).map { k =>
      s"""dm$k AS (
         |  SELECT COALESCE(SUM(r.rank), 0.0) AS m
         |  FROM r${k - 1} r JOIN dangling g ON g.node = r.node
         |), r$k AS MATERIALIZED (
         |  SELECT tp.node,
         |         CAST($t AS DOUBLE) * tp.tp
         |           + $d * (COALESCE(c.s, 0.0) + dm$k.m * tp.tp) AS rank
         |  FROM tp CROSS JOIN dm$k
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank / e.outdeg) AS s
         |    FROM ew e JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY 1
         |  ) c ON c.node = tp.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |                  'p' || CAST(l.l_partkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), deg AS (
       |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
       |), ew AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.src = e.src
       |), nodes AS MATERIALIZED (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), dangling AS MATERIALIZED (
       |  SELECT node FROM nodes
       |  WHERE node NOT IN (SELECT src FROM edges)
       |), seeds AS (
       |  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
       |  FROM customer WHERE c_mktsegment = 'BUILDING'
       |), sn AS (
       |  SELECT COUNT(*) AS n FROM seeds s JOIN nodes ON nodes.node = s.node
       |), tp AS MATERIALIZED (
       |  SELECT nodes.node,
       |         CASE WHEN s.node IS NOT NULL
       |              THEN CAST(1.0 AS DOUBLE) / sn.n ELSE 0.0 END AS tp
       |  FROM nodes CROSS JOIN sn LEFT JOIN seeds s ON s.node = nodes.node
       |), r0 AS (
       |  SELECT node, tp AS rank FROM tp
       |),
       |$rks
       |SELECT node, ${r("rank")} AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** Mirrors Analytics.dqQuarantine: same rule predicates in the same
    * order (list concat of per-rule literals), same null semantics (a null
    * field fails only its own null rule — CASE and Spark's when() both
    * treat a NULL predicate as no-match), raw column passthrough so the
    * only output surface is the parquet values themselves. */
  val dqQuarantine: String = {
    val types = graft.Params.EventTypes.map(t => s"'$t'").mkString(", ")
    val legs = Seq(
      "event_type_in_vocab" -> s"NOT event_type IN ($types)",
      "ts_not_null" -> "ts IS NULL",
      "value_below_cap" -> "value > 400.0",
      "value_not_null" -> "value IS NULL",
      "value_positive" -> "value <= 0.0")
    val arr = legs.map { case (n, c) =>
      s"(CASE WHEN $c THEN ['$n'] ELSE []::VARCHAR[] END)"
    }.mkString(" || ")
    s"""WITH q AS (
       |  SELECT event_id, user_id, event_type, value,
       |         $arr AS reasons
       |  FROM events
       |)
       |SELECT event_id, user_id, event_type, value,
       |       array_to_string(reasons, ',') AS reasons,
       |       CAST(len(reasons) AS BIGINT) AS n_failed
       |FROM q WHERE len(reasons) > 0 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.ordersBasket: per-order size/revenue then the size
    * histogram; r4 money rounding on both revenue columns. */
  val ordersBasket: String =
    s"""WITH per AS (
       |  SELECT l_orderkey, COUNT(*) AS basket_size,
       |         SUM(l_extendedprice) AS rev
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT basket_size, COUNT(*) AS n_orders,
       |       ${r4("SUM(rev)")} AS revenue,
       |       ${r4(s"(${r4("SUM(rev)")}) / COUNT(*)")} AS avg_order_value
       |FROM per GROUP BY basket_size ORDER BY basket_size""".stripMargin

  /** Mirrors Analytics.supplierHhi: identical share and Σ share² trees;
    * sum-order ulps vanish under the 6-decimal rounding of a ≤1 value. */
  val supplierHhi: String =
    s"""WITH rev AS (
       |  SELECT s.s_nationkey, s.s_suppkey, SUM(l.l_extendedprice) AS rev
       |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  GROUP BY 1, 2
       |), tot AS (
       |  SELECT s_nationkey, SUM(rev) AS tot, COUNT(*) AS n_suppliers
       |  FROM rev GROUP BY 1
       |)
       |SELECT rev.s_nationkey, tot.n_suppliers,
       |       ${r("SUM((rev.rev / tot.tot) * (rev.rev / tot.tot))")} AS hhi
       |FROM rev JOIN tot USING (s_nationkey)
       |GROUP BY rev.s_nationkey, tot.n_suppliers
       |ORDER BY rev.s_nationkey""".stripMargin

  /** Mirrors Analytics.aggWeightedMedian: identical (value, id) ordering,
    * integer cumulative weights (exact on both engines), the same doubled-
    * cum-weight threshold; raw parquet values out. */
  val aggWeightedMedian: String =
    s"""WITH li AS (
       |  SELECT l_returnflag, l_extendedprice,
       |         CAST(floor(l_quantity) AS BIGINT) AS qty,
       |         l_orderkey * 8 + l_linenumber AS id
       |  FROM lineitem
       |), c AS (
       |  SELECT l_returnflag, l_extendedprice, qty,
       |         SUM(qty) OVER (PARTITION BY l_returnflag
       |           ORDER BY l_extendedprice, id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
       |         SUM(qty) OVER (PARTITION BY l_returnflag) AS totw
       |  FROM li
       |)
       |SELECT l_returnflag, COUNT(*) AS n_rows,
       |       CAST(MAX(totw) AS BIGINT) AS total_qty,
       |       MIN(CASE WHEN cumw * 2 >= totw THEN l_extendedprice END)
       |         AS weighted_median_price
       |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mirrors Analytics.driftChi2: identical expected-count and
    * contribution expression trees over exact integer counts. */
  val driftChi2: String = {
    val eb = "CAST(n_base + n_cur AS DOUBLE) * CAST(tb AS DOUBLE) / CAST(tb + tc AS DOUBLE)"
    val ec = "CAST(n_base + n_cur AS DOUBLE) * CAST(tc AS DOUBLE) / CAST(tb + tc AS DOUBLE)"
    val contrib = s"(CAST(n_base AS DOUBLE) - $eb) * (CAST(n_base AS DOUBLE) - $eb) / ($eb) + " +
      s"(CAST(n_cur AS DOUBLE) - $ec) * (CAST(n_cur AS DOUBLE) - $ec) / ($ec)"
    s"""WITH c AS (
       |  SELECT event_type,
       |         COUNT(*) FILTER (WHERE event_id % 2 = 0) AS n_base,
       |         COUNT(*) FILTER (WHERE event_id % 2 <> 0) AS n_cur
       |  FROM events GROUP BY 1
       |), t AS (
       |  SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
       |         CAST(SUM(n_cur) AS BIGINT) AS tc
       |  FROM c
       |)
       |SELECT event_type, n_base, n_cur,
       |       ${r(eb)} AS exp_base, ${r(ec)} AS exp_cur,
       |       ${r(contrib)} AS chi2_contrib
       |FROM c CROSS JOIN t
       |ORDER BY event_type""".stripMargin
  }

  /** Mirrors Analytics.eventsTimeToConvert / Behavior.timeToConvert: same
    * join-side time gate (never-converted signups keep their unmatched
    * row), same integer hour floor; all-integer output. */
  val eventsTimeToConvert: String =
    """WITH s AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS s_us
      |  FROM events WHERE event_type = 'signup' GROUP BY 1
      |), p AS (
      |  SELECT user_id, epoch_us(ts) AS p_us
      |  FROM events WHERE event_type = 'purchase'
      |), f AS (
      |  SELECT s.user_id, s.s_us, MIN(p.p_us) AS first_p
      |  FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.p_us >= s.s_us
      |  GROUP BY 1, 2
      |), b AS (
      |  SELECT CASE WHEN first_p IS NOT NULL
      |              THEN CAST(floor((first_p - s_us) / 3600000000) AS BIGINT)
      |              ELSE -1 END AS latency_hours
      |  FROM f
      |)
      |SELECT latency_hours, COUNT(*) AS n_users
      |FROM b GROUP BY 1 ORDER BY latency_hours""".stripMargin

  /** Mirrors Analytics.sessionsConcurrency: the same sessionization, then
    * the sweep-line running count as a plain single-window integer SUM
    * (exact under any association — which is also why the Spark side's
    * bucketed-offset formulation is bit-equal to it), same
    * starts-before-ends tie order, same hourly max. */
  val sessionsConcurrency: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |), s AS (
      |  SELECT user_id, ts,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM o
      |), sess AS (
      |  SELECT user_id, session_idx,
      |         MIN(ts) AS session_start, MAX(ts) AS session_end
      |  FROM s GROUP BY 1, 2
      |), b AS (
      |  SELECT epoch_us(session_start) AS us, CAST(1 AS BIGINT) AS delta,
      |         user_id AS k, session_idx
      |  FROM sess
      |  UNION ALL
      |  SELECT epoch_us(session_end), CAST(-1 AS BIGINT), user_id, session_idx
      |  FROM sess
      |), sw AS (
      |  SELECT us,
      |         SUM(delta) OVER (ORDER BY us, delta DESC, k, session_idx
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrent
      |  FROM b
      |)
      |SELECT CAST(us // 3600000000 AS BIGINT) AS hour_bucket,
      |       COUNT(*) AS n_boundaries,
      |       CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
      |FROM sw GROUP BY 1 ORDER BY hour_bucket""".stripMargin

  /** Mirrors Analytics.userLtv / Behavior.userLtv: Monday-start date_trunc
    * weeks on both engines, exact-integer week ages (week-aligned day
    * diffs are multiples of 7, so the /7 is exact), and the cohort running
    * sum replayed as the age-ordered sequential list fold. */
  val userLtv: String = {
    val cum = "PARTITION BY cohort_week ORDER BY age_weeks " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"""WITH fw AS (
       |  SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
       |  FROM events GROUP BY 1
       |), cs AS (
       |  SELECT cohort_week, COUNT(*) AS cohort_users FROM fw GROUP BY 1
       |), rv AS (
       |  SELECT fw.cohort_week, CAST(date_trunc('week', e.ts) AS DATE) AS week,
       |         COUNT(DISTINCT e.user_id) AS active_buyers,
       |         SUM(e.value) AS revenue
       |  FROM events e JOIN fw USING (user_id)
       |  WHERE e.event_type = 'purchase'
       |  GROUP BY 1, 2
       |), ag AS (
       |  SELECT cohort_week,
       |         CAST(datediff('day', cohort_week, week) / 7 AS INT) AS age_weeks,
       |         active_buyers, revenue
       |  FROM rv
       |)
       |SELECT ag.cohort_week, ag.age_weeks, cs.cohort_users, ag.active_buyers,
       |       ${r("revenue")} AS revenue,
       |       ${r(s"list_sum(list(revenue) OVER ($cum)) / CAST(cohort_users AS DOUBLE)")} AS cum_ltv
       |FROM ag JOIN cs USING (cohort_week)
       |ORDER BY ag.cohort_week, ag.age_weeks""".stripMargin
  }

  /** Mirrors Analytics.eventsAttribution / Behavior.attribution: identical
    * integer-microsecond lookback gate, unique-event-id tie-breaks for the
    * first/last winners, and the same three credit models; only the linear
    * 1/n sums are float, absorbed by the 6-decimal floor rounding. */
  val eventsAttribution: String = {
    val winUs = 24L * 3600L * 1000000L
    s"""WITH conv AS (
       |  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us
       |  FROM events WHERE event_type = 'purchase'
       |), touch AS (
       |  SELECT user_id, event_id AS t_id, event_type AS channel,
       |         epoch_us(ts) AS t_us
       |  FROM events WHERE event_type IN ('click', 'view', 'signup')
       |), j AS (
       |  SELECT conv_id, channel, t_id, t_us
       |  FROM conv JOIN touch USING (user_id)
       |  WHERE t_us <= c_us AND t_us > c_us - $winUs
       |), sc AS (
       |  SELECT channel,
       |         COUNT(*) OVER (PARTITION BY conv_id) AS n,
       |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY t_us, t_id) AS rf,
       |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY t_us DESC, t_id DESC) AS rl
       |  FROM j
       |), m AS (
       |  SELECT 'first_touch' AS model, channel,
       |         CASE WHEN rf = 1 THEN 1.0 ELSE 0.0 END AS credit FROM sc
       |  UNION ALL
       |  SELECT 'last_touch', channel,
       |         CASE WHEN rl = 1 THEN 1.0 ELSE 0.0 END FROM sc
       |  UNION ALL
       |  SELECT 'linear', channel, 1.0 / CAST(n AS DOUBLE) FROM sc
       |)
       |SELECT model, channel, ${r("SUM(credit)")} AS credit,
       |       COUNT(*) FILTER (WHERE credit > 0.0) AS touches_credited
       |FROM m GROUP BY model, channel ORDER BY model, channel""".stripMargin
  }

  /** Mirrors Analytics.lakeZorder / Lake.zorderTiles: single-window
    * ROW_NUMBER stands in for the bucket-offset numbering (identical values
    * by construction), then the same integer rank-cell division, the same
    * generated Morton interleave terms, and the same integer tile cut —
    * all-long arithmetic end to end, so parity is exact by type. */
  val lakeZorder: String = {
    val bits = 16; val tiles = 32; val scale = 1L << bits
    val terms = (0 until bits).map(i =>
      s"(((cx >> $i) & 1) << ${2 * i}) + (((cy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH b AS (
       |  SELECT l_partkey AS x, l_suppkey AS y,
       |         l_orderkey * 8 + l_linenumber AS id
       |  FROM lineitem
       |), r AS (
       |  SELECT x, y, id,
       |         ROW_NUMBER() OVER (ORDER BY x, id) - 1 AS rx0,
       |         ROW_NUMBER() OVER (ORDER BY y, id) - 1 AS ry0,
       |         COUNT(*) OVER () AS n
       |  FROM b
       |), c AS (
       |  SELECT x, y, id, n,
       |         rx0 * $scale // n AS cx, ry0 * $scale // n AS cy
       |  FROM r
       |), z AS (
       |  SELECT x, y, id, n, $terms AS zval FROM c
       |), t AS (
       |  SELECT x, y,
       |         (ROW_NUMBER() OVER (ORDER BY zval, id) - 1) * $tiles // n AS tile
       |  FROM z
       |)
       |SELECT tile, COUNT(*) AS n_rows,
       |       MIN(x) AS x_min, MAX(x) AS x_max,
       |       MIN(y) AS y_min, MAX(y) AS y_max
       |FROM t GROUP BY tile ORDER BY tile""".stripMargin
  }

  /** Mirrors Analytics.dedupFuzzy: the same name-type collapse, first-token
    * blocking, and DuckDB's levenshtein (classic unit-cost edit distance,
    * same definition as Spark's). Integer output only — no float surface. */
  val dedupFuzzy: String =
    s"""WITH ty AS (
       |  SELECT p_name AS nm, COUNT(*) AS n,
       |         split_part(p_name, ' ', 1) AS tok
       |  FROM part GROUP BY 1
       |)
       |SELECT a.nm AS name_a, b.nm AS name_b,
       |       levenshtein(a.nm, b.nm) AS dist,
       |       CAST(a.n * b.n AS BIGINT) AS n_row_pairs
       |FROM ty a JOIN ty b ON b.tok = a.tok AND a.nm < b.nm
       |WHERE levenshtein(a.nm, b.nm) BETWEEN 1 AND 4
       |ORDER BY name_a, name_b""".stripMargin

  private def targetsCte: String =
    s"""$barsCte, t AS (
       |  SELECT symbol, event_id, (LEAD(close, ${Params.PredictionHorizon}) OVER ($W) - close) / close AS fwd
       |  FROM bars
       |)""".stripMargin

  val targetsClassification: String =
    s"""$targetsCte
       |SELECT symbol, event_id, CAST(fwd > 0 AS TINYINT) AS target
       |FROM t WHERE fwd IS NOT NULL ORDER BY event_id""".stripMargin

  val targetsRegression: String =
    s"""$targetsCte
       |SELECT symbol, event_id, ${r("fwd")} AS target
       |FROM t WHERE fwd IS NOT NULL ORDER BY event_id""".stripMargin

  val temporalSplit: String =
    s"""WITH s AS (
       |  SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn, COUNT(*) OVER () AS n
       |  FROM events
       |)
       |SELECT event_id,
       |       CASE WHEN rn <= CAST(FLOOR(${1.0 - Params.TestSize} * n) AS BIGINT) THEN 'train' ELSE 'test' END AS split
       |FROM s ORDER BY event_id""".stripMargin

  /** Mirrors Core.mlScaleTrain: train-only per-symbol stats (identical
    * sum-of-squares arithmetic as aggStats), z-score applied to all rows;
    * sd = 0 encodes as NULL, matching Spark's try_divide. */
  val mlScaleTrain: String =
    s"""$barsCte, sp AS (
       |  SELECT symbol, event_id, close,
       |         ROW_NUMBER() OVER (ORDER BY datetime, event_id) AS rn,
       |         COUNT(*) OVER () AS n
       |  FROM bars
       |), lab AS (
       |  SELECT symbol, event_id, close,
       |         CASE WHEN rn <= CAST(FLOOR(${1.0 - Params.TestSize} * n) AS BIGINT)
       |              THEN 'train' ELSE 'test' END AS split
       |  FROM sp
       |), st AS (
       |  SELECT symbol, COUNT(*) AS cnt, SUM(close) AS s1, SUM(close * close) AS s2
       |  FROM lab WHERE split = 'train' GROUP BY 1
       |), mu AS (
       |  SELECT symbol, s1 / cnt AS mu,
       |         sqrt(GREATEST((s2 - s1 * s1 / cnt) / (cnt - 1), 0.0)) AS sd
       |  FROM st
       |)
       |SELECT l.event_id, l.symbol, l.split,
       |       ${r("CASE WHEN mu.sd = 0 THEN NULL ELSE (l.close - mu.mu) / mu.sd END")} AS close_z
       |FROM lab l LEFT JOIN mu ON mu.symbol = l.symbol
       |ORDER BY l.event_id""".stripMargin

  /** Mirrors Core.targetEncode: LOO mean of the integer target per symbol
    * (integer window sums — order-insensitive), single-row group → NULL. */
  /** Mirrors Core.targetEncodeOof (k=5): md5-prefix fold assignment
    * (('0x'||hex)::BIGINT == Spark's conv for 8 hex chars), per-(symbol,
    * fold) integer sums, other-folds mean; NULL when the other folds are
    * empty (0/0 -> try_divide NULL == the CASE guard). */
  val targetEncodeOof: String = {
    val k = 5
    s"""$targetsCte, tt AS (
       |  SELECT symbol, event_id, CAST(fwd > 0 AS BIGINT) AS target,
       |         ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % $k AS fold
       |  FROM t WHERE fwd IS NOT NULL
       |), bf AS (
       |  SELECT symbol, fold, CAST(SUM(target) AS BIGINT) AS f_sum,
       |         COUNT(*) AS f_cnt
       |  FROM tt GROUP BY symbol, fold
       |), bs AS (
       |  SELECT symbol, CAST(SUM(f_sum) AS BIGINT) AS s_sum,
       |         CAST(SUM(f_cnt) AS BIGINT) AS s_cnt
       |  FROM bf GROUP BY symbol
       |)
       |SELECT tt.event_id, tt.symbol, tt.fold, tt.target,
       |       ${r("CASE WHEN bs.s_cnt - bf.f_cnt = 0 THEN NULL ELSE CAST(bs.s_sum - bf.f_sum AS DOUBLE) / CAST(bs.s_cnt - bf.f_cnt AS DOUBLE) END")} AS oof_target_enc
       |FROM tt
       |JOIN bf ON bf.symbol = tt.symbol AND bf.fold = tt.fold
       |JOIN bs ON bs.symbol = tt.symbol
       |ORDER BY tt.event_id""".stripMargin
  }

  /** Mirrors Analytics.userCadence: per-user count/span/gap stats over
    * integer-microsecond timestamps; mean gap via the telescoping
    * span/(n−1) identity on both sides. */
  /** Mirrors Analytics.eventsEntropy (Behavior.userTypeEntropy): identical
    * -p·log2(p) arithmetic; the per-user sum replays the event_type-sorted
    * sequential fold. */
  val eventsEntropy: String =
    s"""WITH c AS (
       |  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1
       |), h AS (
       |  SELECT user_id, event_type, n,
       |         -(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n) AS h
       |  FROM c JOIN t USING (user_id)
       |)
       |SELECT user_id, MAX(n) AS n_events, CAST(COUNT(*) AS BIGINT) AS n_types,
       |       ${r("list_sum(list(h ORDER BY event_type))")} AS type_entropy
       |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin

  val userCadence: String =
    s"""WITH g0 AS (
       |  SELECT user_id, ts,
       |         CAST(epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (
       |           PARTITION BY user_id ORDER BY ts, event_id)) AS DOUBLE)
       |         / 1000000.0 AS gap
       |  FROM events
       |), g1 AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |         CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE)
       |           / 1000000.0 AS span_s,
       |         MIN(gap) AS min_gap_s, MAX(gap) AS max_gap_s
       |  FROM g0 GROUP BY user_id
       |)
       |SELECT user_id, n_events, ${r("span_s")} AS span_s,
       |       ${r("CASE WHEN n_events > 1 THEN span_s / CAST(n_events - 1 AS DOUBLE) END")} AS mean_gap_s,
       |       ${r("min_gap_s")} AS min_gap_s, ${r("max_gap_s")} AS max_gap_s
       |FROM g1 ORDER BY user_id""".stripMargin

  val targetEncode: String =
    s"""$targetsCte, tt AS (
       |  SELECT symbol, event_id, CAST(fwd > 0 AS BIGINT) AS target
       |  FROM t WHERE fwd IS NOT NULL
       |), ww AS (
       |  SELECT symbol, event_id, target,
       |         CAST(SUM(target) OVER (PARTITION BY symbol) AS BIGINT) AS tsum,
       |         COUNT(*) OVER (PARTITION BY symbol) AS cnt
       |  FROM tt
       |)
       |SELECT event_id, symbol, target,
       |       ${r("CASE WHEN cnt = 1 THEN NULL ELSE CAST(tsum - target AS DOUBLE) / CAST(cnt - 1 AS DOUBLE) END")} AS loo_target_enc
       |FROM ww ORDER BY event_id""".stripMargin

  val barsResample: String =
    s"""$barsCte
       |SELECT symbol, date_trunc('hour', datetime) AS bar_start,
       |       ${r("arg_min(open, lpad(CAST(epoch_us(datetime) AS VARCHAR), 20, '0') || '_' || lpad(CAST(event_id AS VARCHAR), 12, '0'))")} AS open,
       |       ${r("MAX(high)")} AS high,
       |       ${r("MIN(low)")} AS low,
       |       ${r("arg_max(close, lpad(CAST(epoch_us(datetime) AS VARCHAR), 20, '0') || '_' || lpad(CAST(event_id AS VARCHAR), 12, '0'))")} AS close,
       |       SUM(volume) AS volume, COUNT(*) AS n_ticks
       |FROM bars GROUP BY 1, 2 ORDER BY symbol, bar_start""".stripMargin

  /** Checks Analytics.graphTriangles with an INDEPENDENT algorithm: the
    * id-ordered 3-way edge join (a<b<c) enumerates each triangle once, vs
    * Spark's degree-oriented compact-forward — agreement on the integer
    * per-node counts validates the algorithm, not just the translation. */
  val graphTriangles: String =
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), t AS (
       |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.pa = e1.pb
       |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
       |), n AS (
       |  SELECT a AS node FROM t
       |  UNION ALL SELECT b FROM t
       |  UNION ALL SELECT c FROM t
       |)
       |SELECT node, COUNT(*) AS n_triangles
       |FROM n GROUP BY 1 ORDER BY node""".stripMargin

  /** Mirrors Analytics.graphComponents with an INDEPENDENT algorithm:
    * recursive reachability (min reachable id per node) vs Spark's
    * alternating large-star/small-star — agreement on the integer labels
    * validates the component structure itself. The support-≥2 edge gate
    * keeps the reachability closure component-bounded. */
  val graphComponents: String =
    s"""WITH RECURSIVE p AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(DISTINCT a.l_orderkey) >= 2
       |), e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM p
       |  UNION ALL SELECT b AS src, a AS dst FROM p
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN e ON e.src = reach.r
       |), lab AS MATERIALIZED (
       |  SELECT id, MIN(r) AS component_id FROM reach GROUP BY id
       |)
       |SELECT lab.id AS node, lab.component_id, sz.component_size
       |FROM lab JOIN (
       |  SELECT component_id, COUNT(*) AS component_size
       |  FROM lab GROUP BY 1
       |) sz USING (component_id)
       |ORDER BY node""".stripMargin

  /** Mirrors Analytics.graphModularity: the same reachability component
    * labels as graphComponents, exact integer degree/intra-edge/m counts,
    * and Q assembled with the identical association order (intra/m minus
    * the squared half-degree share written as a self-product, not
    * power()). The only cross-engine float surface beyond single
    * divisions is the Q-total sum over the O(communities) rows. */
  val graphModularity: String =
    s"""WITH RECURSIVE p AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(DISTINCT a.l_orderkey) >= 2
       |), e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM p
       |  UNION ALL SELECT b AS src, a AS dst FROM p
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM e
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN e ON e.src = reach.r
       |), lab AS MATERIALIZED (
       |  SELECT id, MIN(r) AS component_id FROM reach GROUP BY id
       |), deg AS (
       |  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1
       |), nc AS (
       |  SELECT lab.component_id, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |         CAST(SUM(deg.d) AS BIGINT) AS degree_sum
       |  FROM lab JOIN deg USING (id) GROUP BY 1
       |), ie AS (
       |  SELECT la.component_id, CAST(COUNT(*) AS BIGINT) AS intra_edges
       |  FROM p
       |  JOIN lab la ON la.id = p.a
       |  JOIN lab lb ON lb.id = p.b
       |  WHERE la.component_id = lb.component_id
       |  GROUP BY 1
       |), mm AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p
       |), qq AS (
       |  SELECT nc.component_id, nc.n_nodes,
       |         COALESCE(ie.intra_edges, 0) AS intra_edges, nc.degree_sum,
       |         CAST(COALESCE(ie.intra_edges, 0) AS DOUBLE) / mm.m
       |           - (CAST(nc.degree_sum AS DOUBLE) / (2.0 * mm.m))
       |             * (CAST(nc.degree_sum AS DOUBLE) / (2.0 * mm.m)) AS q
       |  FROM nc LEFT JOIN ie USING (component_id) CROSS JOIN mm
       |)
       |SELECT component_id, n_nodes, intra_edges, degree_sum,
       |       ${r("q")} AS q_contrib, ${r("SUM(q) OVER ()")} AS q_total
       |FROM qq ORDER BY component_id""".stripMargin

  /** Mirrors Analytics.graphKcore with an INDEPENDENT h-index
    * formulation: Spark folds a sorted neighbor-value array per node; this
    * replay ranks neighbor values with a row_number window and takes
    * max(least(rank, value)). A FIXED 32-round budget replaces Spark's
    * early exit — the h-index iteration is monotone with exact no-op
    * rounds past the fixpoint (measured depth: 21 @ sf0.001, 10 @ sf0.01,
    * 5 @ sf0.1), so the two disciplines agree bit-for-bit. Every round is
    * MATERIALIZED: round k references round k−1 twice (value join + the
    * implicit scan), and DuckDB's plain-CTE inlining would go exponential
    * across 32 rounds. */
  val graphKcore: String = {
    val rounds = 32
    val chain = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT t.src AS id, CAST(max(least(t.rn, t.nc)) AS BIGINT) AS c
         |  FROM (SELECT e.src, c${i - 1}.c AS nc,
         |               row_number() OVER (PARTITION BY e.src
         |                 ORDER BY c${i - 1}.c DESC, e.dst) AS rn
         |        FROM e JOIN c${i - 1} ON c${i - 1}.id = e.dst) t
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(DISTINCT a.l_orderkey) >= 2
       |), e AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM p
       |  UNION ALL SELECT b AS src, a AS dst FROM p
       |), c0 AS MATERIALIZED (
       |  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1
       |),
       |$chain
       |SELECT id AS node, c AS coreness FROM c$rounds ORDER BY node""".stripMargin
  }

  /** Mirrors Analytics.graphLinkpred: the same wedge-at-center enumeration
    * (here a center self-join on the neighbor table with the identical
    * degree cap), the same left-anti edge removal and degree attach. The
    * top-100 cut is by the INTEGER key (cn DESC, u, v), so the selection
    * boundary carries no float sensitivity; aa's sum order is the only
    * cross-engine surface and the 6-decimal floor rounding absorbs it. */
  val graphLinkpred: String = {
    val cap = graft.analytics.Graph.LinkPredMaxCenterDegree
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |), nb AS MATERIALIZED (
       |  SELECT a AS w, b AS n FROM e
       |  UNION ALL SELECT b AS w, a AS n FROM e
       |), deg AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS d FROM nb GROUP BY 1
       |), wed AS (
       |  SELECT n1.n AS u, n2.n AS v, 1.0 / ln(CAST(d.d AS DOUBLE)) AS aw
       |  FROM nb n1
       |  JOIN nb n2 ON n2.w = n1.w AND n1.n < n2.n
       |  JOIN deg d ON d.w = n1.w
       |  WHERE d.d <= $cap
       |), sc AS (
       |  SELECT u, v, COUNT(*) AS cn, SUM(aw) AS aa
       |  FROM wed GROUP BY 1, 2
       |), ne AS (
       |  SELECT sc.u, sc.v, sc.cn, sc.aa
       |  FROM sc LEFT JOIN e ON e.a = sc.u AND e.b = sc.v
       |  WHERE e.a IS NULL
       |)
       |SELECT ne.u, ne.v, ne.cn,
       |       ${r("CAST(ne.cn AS DOUBLE) / CAST(du.d + dv.d - ne.cn AS DOUBLE)")} AS jaccard,
       |       ${r("ne.aa")} AS aa
       |FROM ne
       |JOIN deg du ON du.w = ne.u
       |JOIN deg dv ON dv.w = ne.v
       |ORDER BY ne.cn DESC, ne.u, ne.v
       |LIMIT 100""".stripMargin
  }

  /** Mirrors Analytics.graphHits: every half-step replayed as its own pair
    * of CTEs (raw grouped sum over the checkpointed edge list, then the L1
    * scalar divide), nodes = src ∪ dst kept alive by the LEFT JOIN so
    * zero-score nodes survive exactly like Spark's zero-row union. The
    * only cross-engine float surface is double-sum order, absorbed by the
    * 6-decimal floor rounding. */
  val graphHits: String = {
    val iters = graft.analytics.Graph.HitsIters
    val tol = graft.analytics.Graph.HitsTol
    // every per-round CTE is MATERIALIZED and the L1 scalar is a 1-row
    // CROSS JOIN (not a scalar subquery): each round references its
    // predecessor twice, and DuckDB inlines plain CTEs per reference —
    // un-materialized, the replay re-executes the whole chain 2^(2·iters)
    // times (measured: minutes of CPU at 8 rounds vs milliseconds here).
    // st$k replays the Spark run's early-exit test (hub L1 delta of the
    // previous round ≤ tol; hn0's NULL phub → never stop before round 1):
    // a stopped round copies hub AND auth forward unchanged — exact no-ops
    // — so the fixed budget lands on the early-exited run's scores at any
    // SF, margin-guarded on the Spark side.
    val from = graft.analytics.Graph.HitsTolFrom
    val steps = (1 to iters).map { k =>
      // rounds <= tolFrom never stop, BY RULE on both engines
      val stTest =
        if (k <= from) "SELECT FALSE AS stop"
        else s"SELECT COALESCE(SUM(ABS(hub - phub)) <= CAST('$tol' AS DOUBLE), FALSE) AS stop\n         |  FROM hn${k - 1}"
      s"""st$k AS (
         |  $stTest
         |), ar$k AS MATERIALIZED (
         |  SELECT nodes.node, COALESCE(c.s, 0.0) AS raw
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, SUM(h.hub) AS s
         |    FROM ed e JOIN hn${k - 1} h ON h.node = e.src GROUP BY 1
         |  ) c ON c.node = nodes.node
         |), an$k AS MATERIALIZED (
         |  SELECT ar$k.node,
         |         CASE WHEN st$k.stop THEN pa.auth ELSE raw / t.s END AS auth
         |  FROM ar$k CROSS JOIN (SELECT SUM(raw) AS s FROM ar$k) t
         |  CROSS JOIN st$k
         |  JOIN an${k - 1} pa ON pa.node = ar$k.node
         |), hr$k AS MATERIALIZED (
         |  SELECT nodes.node, COALESCE(c.s, 0.0) AS raw
         |  FROM nodes LEFT JOIN (
         |    SELECT e.src AS node, SUM(a.auth) AS s
         |    FROM ed e JOIN an$k a ON a.node = e.dst GROUP BY 1
         |  ) c ON c.node = nodes.node
         |), hn$k AS MATERIALIZED (
         |  SELECT hr$k.node,
         |         CASE WHEN st$k.stop THEN p.hub ELSE raw / t.s END AS hub,
         |         p.hub AS phub
         |  FROM hr$k CROSS JOIN (SELECT SUM(raw) AS s FROM hr$k) t
         |  CROSS JOIN st$k
         |  JOIN hn${k - 1} p ON p.node = hr$k.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS MATERIALIZED (
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |                  'p' || CAST(l.l_partkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), nodes AS MATERIALIZED (
       |  SELECT src AS node FROM ed UNION SELECT dst FROM ed
       |), hn0 AS (
       |  SELECT node, 1.0 / (SELECT COUNT(*) FROM nodes) AS hub,
       |         CAST(NULL AS DOUBLE) AS phub
       |  FROM nodes
       |), an0 AS (
       |  SELECT node, CAST(NULL AS DOUBLE) AS auth FROM nodes
       |),
       |$steps
       |SELECT nodes.node, ${r("h.hub")} AS hub, ${r("a.auth")} AS auth
       |FROM nodes
       |JOIN hn$iters h ON h.node = nodes.node
       |JOIN an$iters a ON a.node = nodes.node
       |ORDER BY nodes.node""".stripMargin
  }

  /** Mirrors Core.xsecRank / CrossSection.xsecRank: hourly arg_max close,
    * per-symbol bucket-lag return, then the per-bucket cross-section —
    * row_number/ntile on the unique (ret DESC, symbol) key and the
    * symbol-ordered list_sum fold (== Spark's sequential window Sum) for
    * the population mean/std behind the z-score. */
  val xsecRank: String = {
    val key = "lpad(CAST(epoch_us(datetime) AS VARCHAR), 20, '0') || '_' || lpad(CAST(event_id AS VARCHAR), 12, '0')"
    val cum = "PARTITION BY bucket ORDER BY symbol ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val full = "PARTITION BY bucket ORDER BY symbol ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    s"""$barsCte, h AS (
       |  SELECT symbol, date_trunc('hour', datetime) AS bucket,
       |         arg_max(close, $key) AS close
       |  FROM bars GROUP BY 1, 2
       |), rr AS (
       |  SELECT symbol, bucket,
       |         (close - LAG(close, 1) OVER (PARTITION BY symbol ORDER BY bucket))
       |           / LAG(close, 1) OVER (PARTITION BY symbol ORDER BY bucket) AS ret
       |  FROM h
       |), r2 AS (
       |  SELECT * FROM rr WHERE ret IS NOT NULL
       |), c AS (
       |  SELECT symbol, bucket, ret,
       |         COUNT(*) OVER (PARTITION BY bucket) AS xsec_n,
       |         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ret DESC, symbol) AS xsec_rank,
       |         NTILE(5) OVER (PARTITION BY bucket ORDER BY ret DESC, symbol) AS xsec_quintile,
       |         COALESCE(list_sum(list(ret) OVER ($cum)), 0.0) AS _cs,
       |         COALESCE(list_sum(list(ret * ret) OVER ($cum)), 0.0) AS _cq
       |  FROM r2
       |), d AS (
       |  SELECT symbol, bucket, ret, xsec_n, xsec_rank, xsec_quintile,
       |         LAST_VALUE(_cs) OVER ($full) AS _s,
       |         LAST_VALUE(_cq) OVER ($full) AS _q
       |  FROM c
       |), f AS (
       |  SELECT symbol, bucket, ret, xsec_n, xsec_rank, xsec_quintile,
       |         _s / CAST(xsec_n AS DOUBLE) AS mean,
       |         _q / CAST(xsec_n AS DOUBLE)
       |           - (_s / CAST(xsec_n AS DOUBLE)) * (_s / CAST(xsec_n AS DOUBLE)) AS var
       |  FROM d
       |)
       |SELECT symbol, bucket, ${r("ret")} AS ret, xsec_n, xsec_rank, xsec_quintile,
       |       ${r("CASE WHEN xsec_n > 1 THEN CAST(xsec_rank - 1 AS DOUBLE) / CAST(xsec_n - 1 AS DOUBLE) END")} AS xsec_pct,
       |       ${r("CASE WHEN var > 0.0 THEN (ret - mean) / sqrt(var) END")} AS xsec_z
       |FROM f ORDER BY bucket, symbol""".stripMargin
  }

  /** Mirrors Analytics.windowBeta: per-symbol lag return, market return as
    * the symbol-sorted sequential fold (list_sum over ORDER BY symbol ==
    * Spark's aggregate over array_sort'ed structs), then the standard
    * cum−lag rolling-sum replay for the beta numerator/denominator. */
  val windowBeta: String = {
    val n = 20
    val nD = s"$n.0"
    s"""$barsCte, rr0 AS (
       |  SELECT symbol, event_id, datetime,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS ret
       |  FROM bars
       |), rr AS (
       |  SELECT * FROM rr0 WHERE ret IS NOT NULL
       |), mkt AS (
       |  SELECT datetime,
       |         list_sum(list(ret ORDER BY symbol)) / COUNT(*) AS mret
       |  FROM rr GROUP BY datetime
       |), j AS (
       |  SELECT rr.symbol, rr.event_id, rr.datetime, rr.ret, mkt.mret
       |  FROM rr JOIN mkt ON rr.datetime = mkt.datetime
       |), c AS (
       |  SELECT symbol, event_id, datetime, mret,
       |         ${cumSum("ret")} AS _c_x,
       |         COUNT(ret) OVER ($Wrun) AS _c_x_n,
       |         ${cumSum("mret")} AS _c_m,
       |         ${cumSum("ret * mret")} AS _c_xm,
       |         ${cumSum("mret * mret")} AS _c_mm
       |  FROM j
       |), rolled AS (
       |  SELECT symbol, event_id, datetime, mret,
       |         ${cumRolling("_c_x", n)} AS sx,
       |         ${cumRolling("_c_m", n)} AS sm,
       |         ${cumRolling("_c_xm", n)} AS sxm,
       |         ${cumRolling("_c_mm", n)} AS smm,
       |         ${cumGate("_c_x", n)} AS g
       |  FROM c
       |), f AS (
       |  SELECT symbol, event_id, mret,
       |         $nD * smm - sm * sm AS varm,
       |         $nD * sxm - sx * sm AS cov, g
       |  FROM rolled
       |)
       |SELECT symbol, event_id, ${r("mret")} AS mret,
       |       ${r("CASE WHEN g AND varm > 0.0 THEN cov / varm END")} AS beta_$n
       |FROM f ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.classBalance: same md5 ordering (both engines emit the
    * same hex), same per-class rank <= minority-count quota. */
  val classBalance: String =
    s"""$targetsCte, tt AS (
       |  SELECT symbol, event_id, CAST(fwd > 0 AS BIGINT) AS target
       |  FROM t WHERE fwd IS NOT NULL
       |), c AS (
       |  SELECT target, COUNT(*) AS cnt FROM tt GROUP BY 1
       |), m AS (
       |  SELECT MIN(cnt) AS min_cnt FROM c
       |), rn AS (
       |  SELECT symbol, event_id, target,
       |         ROW_NUMBER() OVER (PARTITION BY target
       |           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
       |  FROM tt
       |)
       |SELECT event_id, symbol, target
       |FROM rn, m WHERE rn <= min_cnt ORDER BY event_id""".stripMargin

  /** Mirrors Core.mlCalibration: identical LOO score (targetEncode's
    * window arithmetic), identical decile binning (floor·10 capped at 9),
    * integer positive counts + double score sums per bin. */
  val mlCalibration: String =
    s"""$targetsCte, tt AS (
       |  SELECT symbol, CAST(fwd > 0 AS BIGINT) AS target
       |  FROM t WHERE fwd IS NOT NULL
       |), ww AS (
       |  SELECT target,
       |         CASE WHEN cnt = 1 THEN NULL
       |              ELSE CAST(tsum - target AS DOUBLE) / CAST(cnt - 1 AS DOUBLE) END AS score
       |  FROM (
       |    SELECT target,
       |           CAST(SUM(target) OVER (PARTITION BY symbol) AS BIGINT) AS tsum,
       |           COUNT(*) OVER (PARTITION BY symbol) AS cnt
       |    FROM tt
       |  )
       |), b AS (
       |  SELECT LEAST(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
       |         COUNT(*) AS n, SUM(score) AS ss, CAST(SUM(target) AS BIGINT) AS st
       |  FROM ww WHERE score IS NOT NULL GROUP BY 1
       |)
       |SELECT bin, n, ${r("ss / n")} AS avg_score,
       |       ${r("CAST(st AS DOUBLE) / n")} AS frac_pos,
       |       ${r("abs(ss / n - CAST(st AS DOUBLE) / n)")} AS calib_gap
       |FROM b ORDER BY bin""".stripMargin

  /** Mirrors Core.mlKs: same LOO-scored frame as mlCalibration, integer
    * class counts cumulated over the ordered distinct-score frame, KS row
    * selected on the ROUNDED statistic (both engines order by the identical
    * r6 expression, ties to the lowest threshold). */
  val mlKs: String =
    s"""$targetsCte, tt AS (
       |  SELECT symbol, CAST(fwd > 0 AS BIGINT) AS target
       |  FROM t WHERE fwd IS NOT NULL
       |), ww AS (
       |  SELECT target,
       |         CASE WHEN cnt = 1 THEN NULL
       |              ELSE CAST(tsum - target AS DOUBLE) / CAST(cnt - 1 AS DOUBLE) END AS score
       |  FROM (
       |    SELECT target,
       |           CAST(SUM(target) OVER (PARTITION BY symbol) AS BIGINT) AS tsum,
       |           COUNT(*) OVER (PARTITION BY symbol) AS cnt
       |    FROM tt
       |  )
       |), sc AS (
       |  SELECT score,
       |         CAST(COUNT(*) FILTER (WHERE target = 1) AS BIGINT) AS cp0,
       |         CAST(COUNT(*) FILTER (WHERE target = 0) AS BIGINT) AS cn0
       |  FROM ww WHERE score IS NOT NULL GROUP BY 1
       |), cum AS (
       |  SELECT score,
       |         CAST(SUM(cp0) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
       |         CAST(SUM(cn0) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
       |         CAST(SUM(cp0) OVER () AS BIGINT) AS tp,
       |         CAST(SUM(cn0) OVER () AS BIGINT) AS tn
       |  FROM sc
       |)
       |SELECT ${r("score")} AS threshold,
       |       ${r("abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE))")} AS ks_stat,
       |       ${r("CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)")} AS cdf_pos,
       |       ${r("CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE)")} AS cdf_neg,
       |       tp AS n_pos, tn AS n_neg
       |FROM cum
       |ORDER BY ${r("abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE))")} DESC,
       |         ${r("score")}
       |LIMIT 1""".stripMargin

  /** Mirrors Core.featureTargetCorr: same lag/lead feature frame, DuckDB's
    * corr over the same null-pair-skipping semantics as Spark's; one row
    * per feature via UNION ALL (Spark's stack). */
  val featureTargetCorr: String = {
    val feats = Seq(
      "ret_1" -> "(close - prev) / prev",
      "hl_range" -> "(high - low) / close",
      "volume" -> "volume",
      "close_px" -> "close")
    val sel = feats.map { case (n, e) => s"$e AS $n" }.mkString(",\n       |         ")
    val corrs = feats.map { case (n, _) => s"corr($n, target) AS $n" }
      .mkString(", ")
    val rows = feats.map { case (n, _) => s"SELECT '$n' AS feature, $n AS c FROM a" }
      .mkString("\n       |  UNION ALL ")
    s"""$barsCte, ff AS (
       |  SELECT close, high, low, volume,
       |         LAG(close, 1) OVER ($W) AS prev,
       |         (LEAD(close, ${Params.PredictionHorizon}) OVER ($W) - close) / close AS fwd
       |  FROM bars
       |), f AS (
       |  SELECT $sel,
       |         fwd AS target
       |  FROM ff WHERE fwd IS NOT NULL
       |), a AS (
       |  SELECT $corrs FROM f
       |), st AS (
       |  $rows
       |)
       |SELECT feature, ${r("c")} AS corr_target, ${r("abs(c)")} AS abs_corr
       |FROM st ORDER BY abs_corr DESC, feature""".stripMargin
  }

  /** Mirrors Core.barsGapfill: hourly resample (arg_max close = Spark's
    * max_by over the same zero-padded sort key) → per-symbol dense hour grid
    * → left join → forward fill via last_value IGNORE NULLS over the same
    * running frame. close values are copies, so no fp machinery is needed
    * beyond the output rounding. */
  val barsGapfill: String = {
    val ffill = "last_value(close IGNORE NULLS) OVER (PARTITION BY symbol " +
      "ORDER BY bar_start ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""$barsCte, hb AS (
       |  SELECT symbol, date_trunc('hour', datetime) AS bar_start,
       |         arg_max(close, lpad(CAST(epoch_us(datetime) AS VARCHAR), 20, '0') || '_' || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
       |         COUNT(*) AS n_ticks
       |  FROM bars GROUP BY 1, 2
       |), g AS (
       |  SELECT symbol, UNNEST(generate_series(min(bar_start), max(bar_start), INTERVAL 1 HOUR)) AS bar_start
       |  FROM hb GROUP BY symbol
       |), j AS (
       |  SELECT g.symbol, g.bar_start, hb.close,
       |         CAST(hb.close IS NULL AS INT) AS is_gap,
       |         COALESCE(hb.n_ticks, 0) AS n_ticks
       |  FROM g LEFT JOIN hb ON g.symbol = hb.symbol AND g.bar_start = hb.bar_start
       |)
       |SELECT symbol, bar_start, ${r(ffill)} AS close, is_gap, n_ticks
       |FROM j ORDER BY symbol, bar_start""".stripMargin
  }

  /** Mirrors Market.withRollingCorr (n=20) via the identical cum−lag sum
    * tree: five sequential-fold running sums, lag-20 differences, then the
    * n·Σ−Σ·Σ correlation/covariance arithmetic in the same association
    * order — bit-equal doubles end to end. */
  val windowCorr: String = {
    val n = graft.features.Market.CorrWindow
    val nD = s"$n.0"
    val n1D = s"${n - 1}.0"
    s"""$barsCte, c AS (
       |  SELECT symbol, event_id, datetime, close, volume,
       |         ${cumSum("close")} AS _c_x,
       |         COUNT(close) OVER ($Wrun) AS _c_x_n,
       |         ${cumSum("volume")} AS _c_y,
       |         ${cumSum("close * volume")} AS _c_xy,
       |         ${cumSum("close * close")} AS _c_xx,
       |         ${cumSum("volume * volume")} AS _c_yy
       |  FROM bars
       |), rr AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_x", n)} AS sx,
       |         ${cumRolling("_c_y", n)} AS sy,
       |         ${cumRolling("_c_xy", n)} AS sxy,
       |         ${cumRolling("_c_xx", n)} AS sxx,
       |         ${cumRolling("_c_yy", n)} AS syy,
       |         ${cumGate("_c_x", n)} AS g
       |  FROM c
       |), f AS (
       |  SELECT symbol, event_id,
       |         $nD * sxx - sx * sx AS varx,
       |         $nD * syy - sy * sy AS vary,
       |         $nD * sxy - sx * sy AS cov, g
       |  FROM rr
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN g AND varx > 0.0 AND vary > 0.0 THEN cov / (sqrt(varx) * sqrt(vary)) END")} AS roll_corr,
       |       ${r(s"CASE WHEN g THEN cov / $nD / $n1D END")} AS roll_cov
       |FROM f ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.windowOutliers (Market.withOutliers, n=20, k=3):
    * Bollinger-style cum−lag rolling mean/std, zscore gated on min_samples
    * AND std > 0, flag from the UNROUNDED zscore. */
  val windowOutliers: String = {
    val sd = "sqrt(greatest((s2 - s1 * s1 / 20) / 19, 0.0))"
    s"""$barsCte, c AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_oc,
       |         COUNT(close) OVER ($Wrun) AS _c_oc_n,
       |         ${cumSum("close * close")} AS _c_oc2
       |  FROM bars
       |), rr AS (
       |  SELECT symbol, event_id, close,
       |         ${cumRolling("_c_oc", 20)} AS s1,
       |         ${cumRolling("_c_oc2", 20)} AS s2,
       |         ${cumGate("_c_oc", 20)} AS g
       |  FROM c
       |), z AS (
       |  SELECT symbol, event_id,
       |         CASE WHEN g AND $sd > 0.0
       |           THEN (close - s1 / 20) / $sd END AS zscore
       |  FROM rr
       |)
       |SELECT symbol, event_id, ${r("zscore")} AS zscore,
       |       CAST(abs(zscore) > 3.0 AS INT) AS is_outlier
       |FROM z ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.aggMoments: two-pass central moments (mean join, then
    * Σd²/Σd³/Σd⁴), σ powers as explicit products — no libm pow. */
  val aggMoments: String =
    s"""$barsCte, g AS (
       |  SELECT symbol, SUM(close) AS s1, COUNT(*) AS n FROM bars GROUP BY symbol
       |), m AS (
       |  SELECT symbol, s1 / n AS mu, n FROM g
       |), d AS (
       |  SELECT b.symbol, n, (close - mu) AS d FROM bars b JOIN m USING (symbol)
       |), a AS (
       |  SELECT symbol, n,
       |         SUM(d * d) AS m2s, SUM(d * d * d) AS m3s,
       |         SUM(d * d * d * d) AS m4s
       |  FROM d GROUP BY symbol, n
       |)
       |SELECT symbol, n,
       |       ${r("m3s / n / (sqrt(m2s / n) * sqrt(m2s / n) * sqrt(m2s / n))")} AS close_skew,
       |       ${r("m4s / n / ((m2s / n) * (m2s / n)) - 3.0")} AS close_kurt
       |FROM a ORDER BY symbol""".stripMargin

  val unionSymbols: String =
    s"""$barsCte
       |SELECT event_id, symbol, ${r("close")} AS close, branch FROM (
       |  SELECT event_id, symbol, close, 'a' AS branch FROM bars WHERE CAST(symbol AS INT) % 2 = 0
       |  UNION ALL
       |  SELECT event_id, symbol, CAST(CAST(close AS REAL) AS DOUBLE) AS close, 'b' AS branch
       |  FROM bars WHERE CAST(symbol AS INT) % 2 = 1
       |) u ORDER BY event_id""".stripMargin

  val valueCounts: String =
    s"""$targetsCte
       |SELECT CAST(fwd > 0 AS TINYINT) AS target, COUNT(*) AS cnt
       |FROM t WHERE fwd IS NOT NULL GROUP BY 1 ORDER BY target""".stripMargin

  val aggStats: String =
    s"""$barsCte, g AS (
       |  SELECT symbol, COUNT(*) AS n, SUM(close) AS s1, SUM(close * close) AS s2,
       |         MIN(close) AS mn, MAX(close) AS mx
       |  FROM bars GROUP BY symbol
       |)
       |SELECT symbol, n, ${r("mn")} AS close_min, ${r("mx")} AS close_max,
       |       ${r("s1 / n")} AS close_avg,
       |       ${r("sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0))")} AS close_std
       |FROM g ORDER BY symbol""".stripMargin

  val topkEvents: String =
    s"""SELECT event_id, event_type, ${r("value")} AS value
       |FROM events ORDER BY value DESC, event_id LIMIT 100""".stripMargin

  val joinStar: String =
    s"""WITH j AS (
       |  SELECT n.n_name, l.l_extendedprice * (1 - l.l_discount) AS amt
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |)
       |SELECT n_name, ${r4("SUM(amt)")} AS revenue, COUNT(*) AS n_items
       |FROM j GROUP BY n_name ORDER BY n_name""".stripMargin

  val q1Pricing: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(SUM(l_quantity), 0) + 0.0 AS sum_qty,
      |       round(SUM(l_extendedprice), 0) + 0.0 AS sum_base,
      |       round(SUM(l_extendedprice * (1 - l_discount)), 0) + 0.0 AS sum_disc,
      |       COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Mirrors Analytics.q6Revenue (TPC-H Q6 shape on this data's ranges). */
  val q6Revenue: String =
    """SELECT round(SUM(l_extendedprice * l_discount), 0) + 0.0 AS revenue,
      |       COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Mirrors Analytics.q5LocalSupplier (TPC-H Q5, region ASIA, year
    * 2000): same join cycle, whole-dollar rounding. */
  val q5LocalSupplier: String =
    """SELECT n.n_name,
      |       round(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) + 0.0 AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |               AND s.s_nationkey = c.c_nationkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  /** Mirrors Analytics.q17SmallQuantity: the decorrelated per-part average
    * (exact — l_quantity is integer-valued, so the double sum is
    * order-free) probed back into the brand-scoped lineitem set; COUNT/SUM
    * per part, LEFT JOIN keeps zero-small parts. */
  val q17SmallQuantity: String =
    s"""WITH pq AS (
       |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'
       |), sc AS MATERIALIZED (
       |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
       |  FROM lineitem l JOIN pq ON pq.p_partkey = l.l_partkey
       |), thr AS MATERIALIZED (
       |  SELECT l_partkey, AVG(l_quantity) AS avg_qty FROM sc GROUP BY 1
       |), sm AS (
       |  SELECT s.l_partkey, CAST(COUNT(*) AS BIGINT) AS n_small,
       |         CAST(SUM(CAST(floor(s.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |  FROM sc s JOIN thr t ON t.l_partkey = s.l_partkey
       |  WHERE s.l_quantity < 0.2 * t.avg_qty
       |  GROUP BY 1
       |)
       |SELECT t.l_partkey AS p_partkey, ${r("t.avg_qty")} AS avg_qty,
       |       CAST(COALESCE(sm.n_small, 0) AS BIGINT) AS n_small,
       |       ${r("CAST(COALESCE(sm.cents, 0) AS DOUBLE) / 100.0")} AS small_revenue
       |FROM thr t LEFT JOIN sm ON sm.l_partkey = t.l_partkey
       |ORDER BY p_partkey""".stripMargin

  /** Mirrors Analytics.q20ExcessStock: one conditional aggregate per
    * (supplier, part) pair over the name-scoped lineitem, the exact
    * half-total threshold (integer-valued quantities), then the
    * per-supplier collapse joined to supplier/nation. */
  val q20ExcessStock: String =
    s"""WITH pq AS (
       |  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
       |), pairs AS (
       |  SELECT l.l_suppkey, l.l_partkey,
       |         SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
       |                   AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
       |                  THEN l.l_quantity ELSE 0.0 END) AS qty_year,
       |         SUM(l.l_quantity) AS qty_total
       |  FROM lineitem l JOIN pq ON pq.p_partkey = l.l_partkey
       |  GROUP BY 1, 2
       |), ex AS (
       |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
       |  FROM pairs WHERE qty_year > 0.5 * qty_total
       |  GROUP BY 1
       |)
       |SELECT s.s_suppkey, s.s_name, n.n_name, ex.n_excess_parts
       |FROM ex
       |JOIN supplier s ON s.s_suppkey = ex.l_suppkey
       |JOIN nation n ON n.n_nationkey = s.s_nationkey
       |ORDER BY s.s_suppkey""".stripMargin

  /** Mirrors Analytics.q2MinUnitCost: the per-(part, supplier) exact
    * integer rollup (cents / quantities), the one correctly-rounded
    * division, and the (cost, suppkey) window argmin. */
  val q2MinUnitCost: String =
    s"""WITH pq AS (
       |  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
       |), pairs AS (
       |  SELECT l.l_partkey, l.l_suppkey,
       |         CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       |         CAST(SUM(l.l_quantity) AS BIGINT) AS qty
       |  FROM lineitem l JOIN pq ON pq.p_partkey = l.l_partkey
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT l_partkey, l_suppkey,
       |         CAST(cents AS DOUBLE) / CAST(qty AS DOUBLE) AS unit_cost,
       |         COUNT(*) OVER (PARTITION BY l_partkey) AS n_suppliers,
       |         ROW_NUMBER() OVER (PARTITION BY l_partkey
       |                            ORDER BY CAST(cents AS DOUBLE) / CAST(qty AS DOUBLE), l_suppkey) AS rk
       |  FROM pairs
       |)
       |SELECT l_partkey AS p_partkey, l_suppkey AS best_suppkey,
       |       ${r("unit_cost / 100.0")} AS min_unit_price,
       |       CAST(n_suppliers AS BIGINT) AS n_suppliers
       |FROM scored WHERE rk = 1 ORDER BY p_partkey""".stripMargin

  /** Mirrors Analytics.q22WealthyIdle: exact integer-cents threshold by
    * cross-multiplication, distinct recent-actives anti-joined, per-nation
    * rollup. */
  val q22WealthyIdle: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey,
       |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
       |  FROM customer
       |), st AS (
       |  SELECT CAST(SUM(cents) AS BIGINT) AS tot,
       |         CAST(COUNT(*) AS BIGINT) AS npos
       |  FROM c WHERE cents > 0
       |), act AS (
       |  SELECT DISTINCT o_custkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
       |)
       |SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
       |       ${r("CAST(SUM(cents) AS DOUBLE) / 100.0")} AS total_acctbal
       |FROM c CROSS JOIN st
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |WHERE c.cents * st.npos > st.tot
       |  AND c.c_custkey NOT IN (SELECT o_custkey FROM act)
       |GROUP BY 1 ORDER BY n_name""".stripMargin

  /** Mirrors Analytics.q21SoleReturn: both correlated existence tests as
    * window counts over the per-(order, supplier) rollup. */
  val q21SoleReturn: String =
    s"""WITH pairs AS (
       |  SELECT l_orderkey, l_suppkey,
       |         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
       |  FROM lineitem GROUP BY 1, 2
       |), flagged AS (
       |  SELECT l_suppkey, has_ret,
       |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
       |         SUM(has_ret) OVER (PARTITION BY l_orderkey) AS n_ret_supp
       |  FROM pairs
       |), blamed AS (
       |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
       |  FROM flagged
       |  WHERE has_ret = 1 AND n_supp >= 2 AND n_ret_supp = 1
       |  GROUP BY 1
       |)
       |SELECT s.s_suppkey, s.s_name, n.n_name, b.numwait
       |FROM blamed b
       |JOIN supplier s ON s.s_suppkey = b.l_suppkey
       |JOIN nation n ON n.n_nationkey = s.s_nationkey
       |ORDER BY numwait DESC, s.s_suppkey""".stripMargin

  /** Mirrors Analytics.q4PriorityCount: the correlated EXISTS replayed
    * literally (DuckDB decorrelates it itself); 90-day lateness on
    * integer-microsecond timestamps. */
  val q4PriorityCount: String =
    s"""SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       |FROM orders o
       |WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
       |  AND EXISTS (SELECT 1 FROM lineitem l
       |              WHERE l.l_orderkey = o.o_orderkey
       |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirrors Analytics.q7VolumeShipping: two-nation bidirectional flows,
    * exact per-row integer cents, per (supp, cust, ship-year). */
  val q7VolumeShipping: String =
    s"""WITH f AS (
       |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       |         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       |         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
       |  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
       |  WHERE l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
       |    AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
       |    AND ns.n_name IN ('NATION_3', 'NATION_8')
       |    AND nc.n_name IN ('NATION_3', 'NATION_8')
       |    AND ns.n_name <> nc.n_name)
       |SELECT supp_nation, cust_nation, l_year, CAST(COUNT(*) AS BIGINT) AS n,
       |       ${r("CAST(SUM(cents) AS DOUBLE) / 100.0")} AS revenue
       |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Mirrors Analytics.q8MarketShare: NATION_3's share of STANDARD-part
    * revenue into ASIA, per order year — one division of two exact
    * integer-cent sums. */
  val q8MarketShare: String =
    s"""WITH f AS (
       |  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       |         ns.n_name AS supp_nation,
       |         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem l
       |  JOIN part p ON p.p_partkey = l.l_partkey
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
       |  JOIN region r ON r.r_regionkey = nc.n_regionkey
       |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
       |  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
       |    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
       |    AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00')
       |SELECT o_year,
       |       ${r("CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE) / CAST(SUM(cents) AS DOUBLE)")} AS mkt_share,
       |       ${r("CAST(SUM(cents) AS DOUBLE) / 100.0")} AS total_volume
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirrors Analytics.q9ProductProfit: exact integer-cent profit
    * (revenue cents − retail cents × integer quantity) per nation/year. */
  val q9ProductProfit: String =
    s"""WITH f AS (
       |  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       |         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
       |         - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
       |           * CAST(floor(l.l_quantity) AS BIGINT) AS profit_cents
       |  FROM lineitem l
       |  JOIN part p ON p.p_partkey = l.l_partkey
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  JOIN nation n ON n.n_nationkey = s.s_nationkey
       |  WHERE p.p_name LIKE '%bolt')
       |SELECT nation, o_year, CAST(COUNT(*) AS BIGINT) AS n,
       |       ${r("CAST(SUM(profit_cents) AS DOUBLE) / 100.0")} AS profit
       |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirrors Analytics.q10ReturnedItems: per-customer exact-cent return
    * revenue, top-20 on (cents DESC, custkey). */
  val q10ReturnedItems: String =
    s"""WITH rev AS (
       |  SELECT o.o_custkey,
       |         CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE l.l_returnflag = 'R'
       |    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
       |    AND o.o_orderdate < TIMESTAMP '2000-04-01 00:00:00'
       |  GROUP BY 1)
       |SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
       |       ${r("CAST(rev.cents AS DOUBLE) / 100.0")} AS revenue
       |FROM rev
       |JOIN customer c ON c.c_custkey = rev.o_custkey
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |ORDER BY rev.cents DESC, c.c_custkey LIMIT 20""".stripMargin

  /** Mirrors Analytics.q11ImportantParts: the 1.5×-average threshold as
    * an integer cross-multiplication against the 1-row global rollup. */
  val q11ImportantParts: String =
    s"""WITH v AS (
       |  SELECT l_partkey,
       |         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1
       |), t AS (
       |  SELECT CAST(SUM(cents) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nparts FROM v
       |)
       |SELECT v.l_partkey AS p_partkey,
       |       ${r("CAST(v.cents AS DOUBLE) / 100.0")} AS part_value
       |FROM v CROSS JOIN t
       |WHERE v.cents * t.nparts * 10 > 15 * t.tot
       |ORDER BY part_value DESC, p_partkey""".stripMargin

  /** Mirrors Analytics.q12ReturnPriority: urgent/high vs rest CASE counts
    * per return flag over year-2000 shipments. */
  val q12ReturnPriority: String =
    s"""SELECT l.l_returnflag,
       |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE l.l_returnflag IN ('A', 'R')
       |  AND l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
       |  AND l.l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirrors Analytics.q13CustomerDistribution: per-customer qualifying
    * order counts (zeros kept via LEFT JOIN) histogrammed. */
  val q13CustomerDistribution: String =
    s"""WITH cnt AS (
       |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY 1
       |)
       |SELECT CAST(COALESCE(cnt.n, 0) AS BIGINT) AS c_count,
       |       CAST(COUNT(*) AS BIGINT) AS custdist
       |FROM customer c LEFT JOIN cnt ON cnt.o_custkey = c.c_custkey
       |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Mirrors Analytics.q14PromoEffect: PROMO share of May-2000 revenue as
    * one division of exact integer-cent sums. */
  val q14PromoEffect: String =
    s"""WITH f AS (
       |  SELECT p.p_type,
       |         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  WHERE l.l_shipdate >= TIMESTAMP '2000-05-01 00:00:00'
       |    AND l.l_shipdate < TIMESTAMP '2000-06-01 00:00:00')
       |SELECT ${r("100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE) / CAST(SUM(cents) AS DOUBLE)")} AS promo_pct,
       |       ${r("CAST(SUM(cents) AS DOUBLE) / 100.0")} AS total_revenue,
       |       CAST(COUNT(*) AS BIGINT) AS n
       |FROM f""".stripMargin

  /** Mirrors Analytics.q15TopSupplier: exact-cent per-supplier revenue,
    * bit-safe equality against the 1-row max. */
  val q15TopSupplier: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
       |  GROUP BY 1
       |), mx AS (SELECT CAST(MAX(cents) AS BIGINT) AS mx FROM rev)
       |SELECT s.s_suppkey, s.s_name,
       |       ${r("CAST(rev.cents AS DOUBLE) / 100.0")} AS total_revenue
       |FROM rev CROSS JOIN mx
       |JOIN supplier s ON s.s_suppkey = rev.l_suppkey
       |WHERE rev.cents = mx.mx ORDER BY s.s_suppkey""".stripMargin

  /** Mirrors Analytics.q16PartVariety: distinct (bucket, supplier) pairs
    * through the lineitem bridge, arrears suppliers excluded. */
  val q16PartVariety: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
       |    AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
       |    AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
       |SELECT p_brand, p_type, p_size, CAST(COUNT(*) AS BIGINT) AS supplier_cnt
       |FROM pairs GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Mirrors Analytics.q18LargeOrders: HAVING on the exact integer-valued
    * quantity sum, top-100 on stored o_totalprice with orderkey
    * tie-break. */
  val q18LargeOrders: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
       |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300)
       |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       |       o.o_totalprice, big.sum_qty
       |FROM big
       |JOIN orders o ON o.o_orderkey = big.l_orderkey
       |JOIN customer c ON c.c_custkey = o.o_custkey
       |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin

  /** Mirrors Analytics.q19DiscountedRevenue: the three-branch disjunction
    * as a row-local predicate over the part-joined fact. */
  val q19DiscountedRevenue: String =
    s"""SELECT ${r("CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0")} AS revenue,
       |       CAST(COUNT(*) AS BIGINT) AS n
       |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
       |       AND l.l_quantity BETWEEN 1 AND 11)
       |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
       |       AND l.l_quantity BETWEEN 10 AND 20)
       |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
       |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  val q3Shipping: String =
    s"""SELECT l.l_orderkey, o.o_orderdate,
      |       ${r4("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  val joinAsof: String =
    """WITH u AS (
      |  SELECT user_id AS k, ts AS t, event_id AS tie, 1 AS is_left,
      |         event_id, CAST(NULL AS BIGINT) AS r_event_id
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 0, CAST(NULL AS BIGINT), event_id
      |  FROM events WHERE event_type = 'error'
      |), m AS (
      |  SELECT is_left, event_id, k AS user_id,
      |         LAST_VALUE(r_event_id IGNORE NULLS) OVER (
      |           PARTITION BY k ORDER BY t, is_left, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_id
      |  FROM u
      |)
      |SELECT event_id, user_id, last_error_id FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.joinAsofNearest (Relational.nearestJoin): the
    * union+window construction in both directions — backward pass orders
    * right-before-left at equal timestamps, forward pass the opposite —
    * then the identical integer-µs distance compare (equidistant →
    * backward). */
  val joinAsofNearest: String = {
    val wb = "PARTITION BY k ORDER BY t, is_left, tie " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val wf = "PARTITION BY k ORDER BY t, is_left DESC, tie " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    s"""WITH u AS (
       |  SELECT user_id AS k, ts AS t, event_id AS tie, 1 AS is_left,
       |         event_id, CAST(NULL AS BIGINT) AS r_event_id,
       |         CAST(NULL AS TIMESTAMP) AS r_t
       |  FROM events WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id, ts, event_id, 0, CAST(NULL AS BIGINT), event_id, ts
       |  FROM events WHERE event_type = 'error'
       |), m AS (
       |  SELECT is_left, event_id, k AS user_id, t,
       |         LAST_VALUE(r_t IGNORE NULLS) OVER ($wb) AS b_t,
       |         LAST_VALUE(r_event_id IGNORE NULLS) OVER ($wb) AS b_id,
       |         FIRST_VALUE(r_t IGNORE NULLS) OVER ($wf) AS f_t,
       |         FIRST_VALUE(r_event_id IGNORE NULLS) OVER ($wf) AS f_id
       |  FROM u
       |), sel AS (
       |  SELECT event_id, user_id,
       |         epoch_us(t) - epoch_us(b_t) AS db,
       |         epoch_us(f_t) - epoch_us(t) AS df,
       |         b_id, f_id,
       |         f_t IS NULL OR (b_t IS NOT NULL AND
       |           epoch_us(t) - epoch_us(b_t) <= epoch_us(f_t) - epoch_us(t))
       |           AS use_b
       |  FROM m WHERE is_left = 1
       |)
       |SELECT event_id, user_id,
       |       CASE WHEN use_b THEN -db ELSE df END AS nearest_dt_us,
       |       CASE WHEN use_b THEN b_id ELSE f_id END AS nearest_error_id
       |FROM sel ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.userBurstiness: integer-second gaps (`//` ↔ `div`),
    * exact long power sums, identical variance/CV/B trees. */
  val userBurstiness: String = {
    val pw = "PARTITION BY user_id ORDER BY ts, event_id"
    s"""WITH g0 AS (
       |  SELECT user_id,
       |         epoch_us(ts) - epoch_us(LAG(ts, 1) OVER ($pw)) AS gap_us
       |  FROM events
       |), g AS (
       |  SELECT user_id, gap_us // 1000000 AS gp FROM g0 WHERE gap_us IS NOT NULL
       |), a AS (
       |  SELECT user_id, COUNT(*) AS n_gaps,
       |         CAST(SUM(gp) AS BIGINT) AS s1,
       |         CAST(SUM(gp * gp) AS BIGINT) AS s2
       |  FROM g GROUP BY 1
       |), m AS (
       |  SELECT user_id, n_gaps,
       |         CAST(s1 AS DOUBLE) / n_gaps AS mn,
       |         sqrt(CASE WHEN n_gaps > 1
       |                   THEN GREATEST((CAST(s2 AS DOUBLE)
       |                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_gaps)
       |                     / (n_gaps - 1), 0.0) END) AS sd
       |  FROM a
       |)
       |SELECT user_id, n_gaps, ${r("mn")} AS mean_gap_s, ${r("sd")} AS std_gap_s,
       |       ${r("CASE WHEN mn > 0.0 THEN sd / mn END")} AS cv,
       |       ${r("CASE WHEN sd + mn > 0.0 THEN (sd - mn) / (sd + mn) END")} AS burstiness
       |FROM m ORDER BY user_id""".stripMargin
  }

  /** Mirrors Analytics.eventsPaths / Behavior.topPaths: identical lead
    * windows, '>'-joined, completeness gate on the furthest lead, same
    * (n DESC, path) tie-broken top-20. Integer counts over a 125-path
    * space — nothing fp-sensitive. */
  val eventsPaths: String = {
    val pw = "PARTITION BY user_id ORDER BY ts, event_id"
    s"""WITH p AS (
       |  SELECT event_type || '>' || LEAD(event_type, 1) OVER ($pw)
       |           || '>' || LEAD(event_type, 2) OVER ($pw) AS path,
       |         LEAD(event_type, 2) OVER ($pw) IS NOT NULL AS complete
       |  FROM events
       |)
       |SELECT path, COUNT(*) AS n FROM p WHERE complete
       |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin
  }

  /** Mirrors Analytics.windowCusum / expr.Cusum: recursive-CTE replay of
    * S_t = GREATEST(0, S_{t-1} + (x − k)) per symbol in identical
    * association order (0.0-seeded, lower side on −x); alarms compare the
    * UNROUNDED statistic against h, exactly as the Spark side does. */
  val windowCusum: String = {
    val k = Params.CusumDrift
    val h = Params.CusumThreshold
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, rr0 AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS ret
       |  FROM bars
       |), x1 AS MATERIALIZED (
       |  SELECT symbol, event_id, ret, ROW_NUMBER() OVER ($W) AS rn
       |  FROM rr0 WHERE ret IS NOT NULL
       |), e AS (
       |  SELECT symbol, rn,
       |         GREATEST(0.0, 0.0 + (ret - $k)) AS su,
       |         GREATEST(0.0, 0.0 + (-ret - $k)) AS sd
       |  FROM x1 WHERE rn = 1
       |  UNION ALL
       |  SELECT x1.symbol, x1.rn,
       |         GREATEST(0.0, e.su + (x1.ret - $k)),
       |         GREATEST(0.0, e.sd + (-x1.ret - $k))
       |  FROM e JOIN x1 ON x1.symbol = e.symbol AND x1.rn = e.rn + 1
       |)
       |SELECT x1.symbol, x1.event_id,
       |       ${r("su")} AS cusum_up, ${r("sd")} AS cusum_down,
       |       su > $h AS alarm_up, sd > $h AS alarm_down
       |FROM x1 JOIN e ON e.symbol = x1.symbol AND e.rn = x1.rn
       |ORDER BY x1.event_id""".stripMargin
  }

  /** Mirrors Analytics.joinAsofTol: the joinAsof replay plus the matched
    * timestamp riding the same window, gated at 1 hour in exact integer
    * microseconds (null last-t -> null predicate -> nulled match, same as
    * Spark's `when`). */
  val joinAsofTol: String =
    """WITH u AS (
      |  SELECT user_id AS k, ts AS t, event_id AS tie, 1 AS is_left,
      |         CAST(NULL AS TIMESTAMP) AS r_t,
      |         event_id, CAST(NULL AS BIGINT) AS r_event_id
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 0, ts, CAST(NULL AS BIGINT), event_id
      |  FROM events WHERE event_type = 'error'
      |), m AS (
      |  SELECT is_left, event_id, k AS user_id, t,
      |         LAST_VALUE(r_event_id IGNORE NULLS) OVER (
      |           PARTITION BY k ORDER BY t, is_left, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS le,
      |         LAST_VALUE(r_t IGNORE NULLS) OVER (
      |           PARTITION BY k ORDER BY t, is_left, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
      |  FROM u
      |)
      |SELECT event_id, user_id,
      |       CASE WHEN epoch_us(t) - epoch_us(lt) <= 3600000000 THEN le END AS last_error_id
      |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.userPareto: the same (n_ev desc, user_id) ranking
    * and exact integer running sum; the cut indices CEIL(p·n) compute
    * from the same count with the same single multiply, so both engines
    * pick identical rows. */
  val userPareto: String =
    s"""WITH t AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev
       |  FROM events GROUP BY 1
       |), rk AS (
       |  SELECT n_ev,
       |         ROW_NUMBER() OVER (ORDER BY n_ev DESC, user_id) AS rn,
       |         CAST(SUM(n_ev) OVER (ORDER BY n_ev DESC, user_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_ev
       |  FROM t
       |), n AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       |         CAST(SUM(n_ev) AS BIGINT) AS total_ev
       |  FROM t
       |), cuts AS (
       |  SELECT p.pct, CAST(CEIL(p.pct * n.n_users) AS BIGINT) AS n_top_users,
       |         n.total_ev
       |  FROM (VALUES (0.01), (0.05), (0.10), (0.25), (0.50)) p(pct)
       |  CROSS JOIN n
       |)
       |SELECT c.pct, c.n_top_users, rk.cum_ev AS events_covered, c.total_ev,
       |       ${r("CAST(rk.cum_ev AS DOUBLE) / c.total_ev")} AS share
       |FROM cuts c JOIN rk ON rk.rn = c.n_top_users
       |ORDER BY c.pct""".stripMargin

  /** Mirrors Analytics.ordersBacklog: the same open-span derivation
    * (orderdate .. last ship + 1), day-grain delta collapse, and exact
    * integer running sum (associativity-safe, native windowed SUM). */
  val ordersBacklog: String =
    s"""WITH closes AS (
       |  SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS close_date
       |  FROM lineitem GROUP BY 1
       |), spans AS (
       |  SELECT CAST(o.o_orderdate AS DATE) AS o_orderdate, c.close_date
       |  FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
       |), deltas AS (
       |  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
       |    SELECT o_orderdate AS day, 1 AS d FROM spans
       |    UNION ALL
       |    SELECT close_date + 1 AS day, -1 AS d FROM spans)
       |  GROUP BY 1
       |)
       |SELECT CAST(day AS TIMESTAMP) AS day, delta,
       |       CAST(SUM(delta) OVER (ORDER BY day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |         AS backlog
       |FROM deltas ORDER BY day""".stripMargin

  /** Mirrors Analytics.eventsUserOverlap: the same distinct (type, user)
    * projection, ordered-pair self-join, and exact integer counts; one
    * Jaccard division at the end. */
  val eventsUserOverlap: String =
    s"""WITH tu AS (
       |  SELECT DISTINCT event_type, user_id FROM events
       |), totals AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
       |  FROM tu GROUP BY 1
       |), pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |         CAST(COUNT(*) AS BIGINT) AS overlap
       |  FROM tu a JOIN tu b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT p.type_a, p.type_b,
       |       ta.n_users AS users_a, tb.n_users AS users_b, p.overlap,
       |       ${r("CAST(p.overlap AS DOUBLE) / (ta.n_users + tb.n_users - p.overlap)")} AS jaccard
       |FROM pairs p
       |JOIN totals ta ON ta.event_type = p.type_a
       |JOIN totals tb ON tb.event_type = p.type_b
       |ORDER BY p.type_a, p.type_b""".stripMargin

  /** Mirrors Analytics.eventsStationarity / TimeWindows.hourlyStationarity:
    * the six integer power sums are exact on both engines; ρ, α, SSR and
    * the t-stat assemble in the identical expression order. */
  val eventsStationarity: String = {
    val rho = "(n * sxd - s1 * sd) / (n * s2 - s1 * s1)"
    val alpha = s"(sd - ($rho) * s1) / n"
    val ssr = s"sdd + n * ($alpha) * ($alpha) + ($rho) * ($rho) * s2 " +
      s"- 2.0 * ($alpha) * sd - 2.0 * ($rho) * sxd " +
      s"+ 2.0 * ($alpha) * ($rho) * s1"
    s"""WITH h AS (
       |  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), d AS (
       |  SELECT x, y - x AS dy FROM (
       |    SELECT y, LAG(y, 1) OVER (ORDER BY hr) AS x FROM h)
       |  WHERE x IS NOT NULL
       |), agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
       |         CAST(COUNT(*) AS DOUBLE) AS n,
       |         CAST(SUM(x) AS DOUBLE) AS s1,
       |         CAST(SUM(x * x) AS DOUBLE) AS s2,
       |         CAST(SUM(dy) AS DOUBLE) AS sd,
       |         CAST(SUM(dy * dy) AS DOUBLE) AS sdd,
       |         CAST(SUM(x * dy) AS DOUBLE) AS sxd
       |  FROM d
       |)
       |SELECT n_obs, ${r(rho)} AS rho, ${r(alpha)} AS alpha,
       |       ${r(s"($rho) / sqrt((($ssr) / (n - 2.0)) * n / (n * s2 - s1 * s1))")} AS df_t
       |FROM agg""".stripMargin
  }

  /** Mirrors Analytics.eventsForecastEval / TimeWindows.hourlyForecastEval:
    * identical integer |error| and squared-error sums over the same
    * lag-1 / lag-24 differences; each metric is the same one-or-two float
    * ops on exact longs. */
  val eventsForecastEval: String =
    s"""WITH h AS (
       |  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), d AS (
       |  SELECT y,
       |         y - LAG(y, 1) OVER (ORDER BY hr) AS d1,
       |         y - LAG(y, 24) OVER (ORDER BY hr) AS ds
       |  FROM h
       |), agg AS (
       |  SELECT CAST(COUNT(d1) AS BIGINT) AS n1,
       |         CAST(SUM(abs(d1)) AS BIGINT) AS sa1,
       |         CAST(SUM(d1 * d1) AS BIGINT) AS sq1,
       |         CAST(COUNT(ds) AS BIGINT) AS ns,
       |         CAST(SUM(abs(ds)) AS BIGINT) AS sas,
       |         CAST(SUM(ds * ds) AS BIGINT) AS sqs
       |  FROM d
       |)
       |SELECT n1 AS n_pairs_naive, ns AS n_pairs_seasonal,
       |       ${r("CAST(sa1 AS DOUBLE) / n1")} AS mae_naive,
       |       ${r("sqrt(CAST(sq1 AS DOUBLE) / n1)")} AS rmse_naive,
       |       ${r("CAST(sas AS DOUBLE) / ns")} AS mae_seasonal,
       |       ${r("sqrt(CAST(sqs AS DOUBLE) / ns)")} AS rmse_seasonal,
       |       ${r("(CAST(sas AS DOUBLE) / ns) / (CAST(sa1 AS DOUBLE) / n1)")} AS mase_seasonal
       |FROM agg""".stripMargin

  /** Mirrors Analytics.eventsAcf / TimeWindows.hourlyAcf: the same hourly
    * collapse, the same lag-pair self-join, and the SAME exact-integer
    * power sums — the per-lag ACF assembles the identical float
    * expression from identical longs, so parity is bit-exact up to those
    * last few scalar ops. */
  val eventsAcf: String = {
    val maxLag = 24
    s"""WITH h AS (
       |  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), n1 AS (
       |  SELECT y, ROW_NUMBER() OVER (ORDER BY hr) AS rn FROM h
       |), ex AS (
       |  SELECT n1.rn + l.lag AS rn2, n1.y AS y1, CAST(l.lag AS BIGINT) AS lag
       |  FROM n1 CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS lag) l
       |), per AS (
       |  SELECT ex.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |         CAST(SUM(ex.y1 * n2.y) AS BIGINT) AS sxy,
       |         CAST(SUM(ex.y1) AS BIGINT) AS s_head,
       |         CAST(SUM(n2.y) AS BIGINT) AS s_tail
       |  FROM ex JOIN n1 n2 ON n2.rn = ex.rn2
       |  GROUP BY 1
       |), tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
       |         CAST(SUM(y * y) AS BIGINT) AS ss
       |  FROM n1
       |)
       |SELECT lag, n_pairs,
       |       ${r("(CAST(sxy AS DOUBLE) - (CAST(s AS DOUBLE) / n) * CAST(s_head + s_tail AS DOUBLE) + CAST(n_pairs AS DOUBLE) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / (CAST(ss AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))")} AS acf
       |FROM per CROSS JOIN tot ORDER BY lag""".stripMargin
  }

  /** Mirrors Analytics.seasonalityDecompose / TimeWindows.decomposeHourly:
    * the identical 2×24 centered MA as exact integers (T48, D48 = longs on
    * both engines), the per-hod seasonal index as one division of an exact
    * integer sum, and the residual assembled in the same association
    * order — zero float-accumulation surface, so parity is bit-exact by
    * construction. */
  val seasonalityDecompose: String =
    s"""WITH h AS (
       |  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), t AS (
       |  SELECT hr, CAST(hour(hr) AS BIGINT) AS hod, y,
       |         LAG(y, 12) OVER (ORDER BY hr)
       |           + 2 * SUM(y) OVER (ORDER BY hr
       |               ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
       |           + LEAD(y, 12) OVER (ORDER BY hr) AS t48
       |  FROM h
       |), d AS (
       |  SELECT hr, hod, y, t48, 48 * y - t48 AS d48 FROM t
       |), seas AS (
       |  SELECT hod, CAST(SUM(d48) AS DOUBLE) / (48.0 * COUNT(*)) AS seasonal
       |  FROM d WHERE d48 IS NOT NULL GROUP BY 1
       |)
       |SELECT d.hr, d.hod, d.y,
       |       ${r("CAST(t48 AS DOUBLE) / 48.0")} AS trend,
       |       ${r("seasonal")} AS seasonal,
       |       ${r("CAST(y AS DOUBLE) - CAST(t48 AS DOUBLE) / 48.0 - seasonal")} AS resid
       |FROM d LEFT JOIN seas USING (hod) ORDER BY hr""".stripMargin

  val windowTumbling: String =
    s"""SELECT date_trunc('hour', ts) AS w_start, event_type, COUNT(*) AS n,
       |       ${r("SUM(value)")} AS value_sum
       |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  val windowSliding: String =
    s"""WITH e AS (
       |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS w_start,
       |         event_type, value
       |  FROM events, (SELECT UNNEST(range(4)) AS k) k
       |)
       |SELECT w_start, event_type, COUNT(*) AS n, ${r("SUM(value)")} AS value_sum
       |FROM e GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  val sessionize: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |), s AS (
      |  SELECT user_id, ts,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM o
      |)
      |SELECT user_id, session_idx, COUNT(*) AS n_events,
      |       MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin

  val mlMatrix: String = {
    // Same formula blocks as featMomentum / featVolatility / featBollinger /
    // featTemporal (cum-lag form), assembled into one frame, any-null rows
    // dropped (reference src/ml/training.py:50-52), plus the target.
    val bbN = Params.BbPeriod
    val lags = P.map(p => s"LAG(close, $p) OVER ($W) AS lag_$p").mkString(",\n         ")
    val cums = Seq(
      s"${cumSum("close")} AS _c_close",
      s"COUNT(close) OVER ($Wrun) AS _c_close_n",
      s"${cumSum("close * close")} AS _c_bc2").mkString(",\n         ")
    val rollings = (P.flatMap(p => Seq(
      s"${cumRolling("_c_close", p)} AS s_$p",
      s"${cumGate("_c_close", p)} AS g_$p")) ++ Seq(
      s"${cumRolling("_c_close", bbN)} AS bs1",
      s"${cumRolling("_c_bc2", bbN)} AS bs2",
      s"${cumGate("_c_close", bbN)} AS bg")).mkString(",\n         ")
    val momCols = P.flatMap(p => Seq(
      s"(close - lag_$p) / (lag_$p + $eps) AS return_$p",
      s"close - lag_$p AS momentum_$p",
      s"(close - lag_$p) / (lag_$p + $eps) * 100 AS roc_$p",
      s"sma_$p",
      s"(close - sma_$p) / (sma_$p + $eps) * 100 AS distance_sma_$p")).mkString(",\n         ")
    val volCols = V.flatMap(n => Seq(
      s"CASE WHEN rg_$n THEN sqrt(greatest((rq_$n - rs_$n * rs_$n / $n) / ${n - 1}, 0.0)) END AS volatility_$n",
      s"CASE WHEN rg_$n THEN rq_$n END AS realized_vol_$n",
      s"CASE WHEN hg_$n THEN hs_$n / $n END AS hl_range_$n")).mkString(",\n         ")
    val tempCols =
      s"""CAST(EXTRACT(hour FROM datetime) AS BIGINT) AS hour,
         |         CAST(EXTRACT(minute FROM datetime) AS BIGINT) AS minute,
         |         CAST(EXTRACT(isodow FROM datetime) AS BIGINT) AS day_of_week,
         |         CAST(EXTRACT(day FROM datetime) AS BIGINT) AS day,
         |         CAST(EXTRACT(month FROM datetime) AS BIGINT) AS month,
         |         sin(CAST(EXTRACT(hour FROM datetime) AS DOUBLE) * 2 * $pi / 24) AS hour_sin,
         |         cos(CAST(EXTRACT(hour FROM datetime) AS DOUBLE) * 2 * $pi / 24) AS hour_cos,
         |         sin(CAST(EXTRACT(isodow FROM datetime) AS DOUBLE) * 2 * $pi / 7) AS day_of_week_sin,
         |         cos(CAST(EXTRACT(isodow FROM datetime) AS DOUBLE) * 2 * $pi / 7) AS day_of_week_cos,
         |         sin(CAST(EXTRACT(month FROM datetime) AS DOUBLE) * 2 * $pi / 12) AS month_sin,
         |         cos(CAST(EXTRACT(month FROM datetime) AS DOUBLE) * 2 * $pi / 12) AS month_cos""".stripMargin
    val feats = graft.queries.Core.MlMatrixFeatures
    val ints = Set("hour", "minute", "day_of_week", "day", "month")
    val outCols = feats.map(n => if (ints(n)) n else s"${r(n)} AS $n").mkString(",\n       ")
    val notNull = feats.map(n => s"$n IS NOT NULL").mkString(" AND ")
    s"""${barsCte.replaceFirst("WITH ", "WITH RECURSIVE ")}$techCtes, f0 AS (
       |  SELECT symbol, event_id, datetime, close, high, low,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS returns,
       |         (high - low) / close AS hl_ratio,
       |         LEAD(close, ${Params.PredictionHorizon}) OVER ($W) AS next_close,
       |         $lags
       |  FROM bars
       |), f1 AS (
       |  SELECT *,
       |         $cums,
       |         $volCums
       |  FROM f0
       |), f1b AS (
       |  SELECT *,
       |         $rollings,
       |         ${volRollings(V)}
       |  FROM f1
       |), f2 AS (
       |  SELECT *,
       |         ${P.map(p => s"CASE WHEN g_$p THEN s_$p / $p END AS sma_$p").mkString(",\n         ")},
       |         CASE WHEN bg THEN bs1 / $bbN END AS bb_mid,
       |         CASE WHEN bg THEN sqrt(greatest((bs2 - bs1 * bs1 / $bbN) / ${bbN - 1}, 0.0)) END AS bb_sd
       |  FROM f1b
       |), f3 AS (
       |  SELECT symbol, event_id, returns,
       |         (next_close - close) / close AS fwd,
       |         $momCols,
       |         $volCols,
       |         bb_mid AS bb_middle,
       |         bb_mid + bb_sd * ${Params.BbStd} AS bb_upper,
       |         bb_mid - bb_sd * ${Params.BbStd} AS bb_lower,
       |         ((bb_mid + bb_sd * ${Params.BbStd}) - (bb_mid - bb_sd * ${Params.BbStd})) / bb_mid AS bb_width,
       |         $tempCols
       |  FROM f2
       |)
       |SELECT f3.event_id AS event_id,
       |       $outCols,
       |       CAST(fwd > 0 AS TINYINT) AS target
       |FROM f3 JOIN tech ON tech.event_id = f3.event_id
       |WHERE fwd IS NOT NULL AND $notNull ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.featImportanceCorr: the full mlMatrix as a MATERIALIZED
    * CTE (inlining it once per feature would replay the 4-window pipeline
    * 49×), the same floor-form integerization (exact: matrix features are
    * r6-rounded), exact DECIMAL power sums, and the identical double-
    * domain corr formula — bit-equal by the events_stationarity recipe. */
  val featImportanceCorr: String = {
    val feats = graft.queries.Core.MlMatrixFeatures
    val unpivot = feats.map(f =>
      s"""SELECT '$f' AS feature,
         |         CAST(floor(CAST($f AS DOUBLE) * 1000000.0 + 0.5) AS DECIMAL(19,0)) AS kx,
         |         CAST(target AS DECIMAL(19,0)) AS ky FROM m""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    val corr =
      "CASE WHEN (nd * sxx - sx * sx) <= 0.0 OR (nd * syy - sy * sy) <= 0.0 " +
        "THEN 0.0 ELSE abs((nd * sxy - sx * sy) / " +
        "(sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))) END"
    s"""WITH m AS MATERIALIZED (
       |  SELECT * FROM (
       |$mlMatrix
       |  ) q
       |), u AS MATERIALIZED (
       |  $unpivot
       |), s AS (
       |  SELECT feature, CAST(COUNT(*) AS DOUBLE) AS nd,
       |         CAST(SUM(kx) AS DOUBLE) AS sx, CAST(SUM(ky) AS DOUBLE) AS sy,
       |         CAST(SUM(kx * kx) AS DOUBLE) AS sxx,
       |         CAST(SUM(ky * ky) AS DOUBLE) AS syy,
       |         CAST(SUM(kx * ky) AS DOUBLE) AS sxy
       |  FROM u GROUP BY 1
       |)
       |SELECT feature, ${r(corr)} AS abs_corr
       |FROM s ORDER BY abs_corr DESC, feature LIMIT 20""".stripMargin
  }

  /** Mirrors Core.mlFeatureBins: same mlMatrix frame (MATERIALIZED), same
    * quantile_cont thresholds (bit-equal to Spark percentile — the
    * agg_quantiles precedent), same CASE bin edges, exact-integer
    * sum/count target rate. */
  val mlFeatureBins: String = {
    val feats = graft.queries.Core.FeatureBinCols
    val unpivot = feats.map(f =>
      s"SELECT '$f' AS feature, CAST($f AS DOUBLE) AS x, " +
        s"CAST(target AS BIGINT) AS y FROM m")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH m AS MATERIALIZED (
       |  SELECT * FROM (
       |$mlMatrix
       |  ) q
       |), u AS MATERIALIZED (
       |  $unpivot
       |), t AS (
       |  SELECT feature, quantile_cont(x, 0.25) AS p25,
       |         quantile_cont(x, 0.5) AS p50, quantile_cont(x, 0.75) AS p75
       |  FROM u GROUP BY 1
       |), b AS (
       |  SELECT u.feature, u.y,
       |         CASE WHEN u.x <= t.p25 THEN 1
       |              WHEN u.x <= t.p50 THEN 2
       |              WHEN u.x <= t.p75 THEN 3
       |              ELSE 4 END AS bin
       |  FROM u JOIN t USING (feature)
       |)
       |SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(SUM(y) AS BIGINT) AS n_pos,
       |       ${r("CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS target_rate
       |FROM b GROUP BY 1, 2 ORDER BY feature, bin""".stripMargin
  }

  val windowRank: String =
    s"""$barsCte
       |SELECT symbol, event_id, volume,
       |       RANK() OVER (PARTITION BY symbol ORDER BY volume) AS rnk,
       |       DENSE_RANK() OVER (PARTITION BY symbol ORDER BY volume) AS drnk,
       |       ${r("PERCENT_RANK() OVER (PARTITION BY symbol ORDER BY volume)")} AS prnk,
       |       ${r("CUME_DIST() OVER (PARTITION BY symbol ORDER BY volume)")} AS cdist,
       |       ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY volume, event_id) AS rn,
       |       NTILE(4) OVER (PARTITION BY symbol ORDER BY volume, event_id) AS tile
       |FROM bars ORDER BY event_id""".stripMargin

  val aggRollup: String =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       |       COALESCE(l_linestatus, '(all)') AS linestatus,
       |       COUNT(*) AS n,
       |       SUM(l_quantity) AS sum_qty,
       |       round(SUM(l_extendedprice), 0) + 0.0 AS sum_price,
       |       ${r("AVG(l_discount)")} AS avg_disc
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  val aggQuantiles: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |       ${r("MIN(value)")} AS v_min,
       |       ${r("quantile_cont(value, 0.25)")} AS v_p25,
       |       ${r("quantile_cont(value, 0.5)")} AS v_p50,
       |       ${r("quantile_cont(value, 0.75)")} AS v_p75,
       |       ${r("MAX(value)")} AS v_max
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val sampleBernoulli: String =
    s"""SELECT event_id, event_type, ${r("value")} AS value
       |FROM events
       |WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) < '2'
       |ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.sampleWeighted / Sampling.weightedByHash: the same
    * 48-bit md5 uniform (('0x'||hex)::BIGINT == Spark's conv(hex,16,10)),
    * the same ln(u)/w key, top-100 with the doc_id tie-break. 2^48 divides
    * exactly, so u is bit-identical; ln() is the one shared fp surface. */
  val sampleWeighted: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, n_chars,
       |         ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT::DOUBLE + 0.5)
       |              / 281474976710656.0)
       |           / CAST(n_chars AS DOUBLE) AS wk
       |  FROM documents
       |  WHERE CAST(n_chars AS DOUBLE) > 0.0  -- A-ES positive-weight contract
       |), s AS (
       |  SELECT doc_id, source, n_chars FROM t
       |  ORDER BY wk DESC, doc_id LIMIT 100
       |)
       |SELECT doc_id, source, n_chars FROM s ORDER BY doc_id""".stripMargin

  val windowFirstLast: String =
    s"""$barsCte
       |SELECT symbol, event_id,
       |       ${r(s"FIRST_VALUE(close) OVER ($Wrun)")} AS first_close,
       |       ${r(s"LAST_VALUE(close) OVER ($Wrun)")} AS running_close,
       |       ${r(s"NTH_VALUE(close, 3) OVER ($Wrun)")} AS third_close,
       |       ${r(s"FIRST_VALUE(close) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)")} AS anchor_close,
       |       ${r(s"(close / FIRST_VALUE(close) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) - 1) * 100")} AS pct_from_anchor
       |FROM bars ORDER BY event_id""".stripMargin

  val aggCorr: String =
    s"""$barsCte
       |SELECT symbol, ${r("corr(open, close)")} AS corr_oc,
       |       ${r("covar_samp(open, close)")} AS covar_oc,
       |       ${r("stddev_samp(close)")} AS sd_close
       |FROM bars GROUP BY symbol ORDER BY symbol""".stripMargin

  /** Mirrors Analytics.aggBootstrap / Sampling.poissonBootstrap: the same
    * md5(key:rep) 48-bit uniform, the same inverse-CDF sum over the
    * IDENTICAL injected breakpoint literals (Sampling.PoissonCdf — one
    * Scala computation feeds both engines, so the >= comparisons branch
    * identically), the same nearest-rank order statistics over the 100
    * sorted replica means. Replica means are float sums (merge-order
    * ulps); round(6) lands after the order-statistic selection. */
  val aggBootstrap: String = {
    val b = 100
    val lo = math.ceil(0.025 * b).toInt
    val hi = math.ceil(0.975 * b).toInt
    val draws = graft.analytics.Sampling.PoissonCdf
      .map(c => s"CASE WHEN u >= $c THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |         AVG(value) AS mean
       |  FROM events GROUP BY 1
       |), rep AS (
       |  SELECT e.event_type, e.value, r.rep,
       |         (('0x' || substring(
       |             md5(CAST(e.event_id AS VARCHAR) || ':' ||
       |                 CAST((r.rep + 1) // 2 AS VARCHAR)),
       |             CASE WHEN r.rep % 2 = 1 THEN 1 ELSE 13 END,
       |             12))::BIGINT::DOUBLE + 0.5)
       |           / 281474976710656.0 AS u
       |  FROM events e
       |  CROSS JOIN (SELECT unnest(range(1, ${b + 1})) AS rep) r
       |), wtd AS (
       |  SELECT event_type, rep, value, ($draws) AS w FROM rep
       |), m AS (
       |  -- all-zero-weight replica reports the point mean (Spark mirror:
       |  -- Sampling.poissonBootstrap's sw = 0 branch)
       |  SELECT w.event_type, w.rep,
       |         CASE WHEN SUM(w.w) = 0 THEN MIN(b0.mean)
       |              ELSE SUM(w.w * w.value) / CAST(SUM(w.w) AS DOUBLE) END AS m
       |  FROM wtd w JOIN base b0 USING (event_type) GROUP BY 1, 2
       |), ci AS (
       |  SELECT event_type, list(m ORDER BY m) AS ms FROM m GROUP BY 1
       |)
       |SELECT b2.event_type, b2.n_rows, ${r("b2.mean")} AS mean,
       |       ${r(s"ci.ms[$lo]")} AS ci_lo, ${r(s"ci.ms[$hi]")} AS ci_hi
       |FROM base b2 JOIN ci ON b2.event_type = ci.event_type
       |ORDER BY 1""".stripMargin
  }

  val aggHistogram: String =
    s"""SELECT event_type, CAST(floor(value / 100.0) AS BIGINT) AS bin,
       |       COUNT(*) AS n, ${r("MIN(value)")} AS v_lo, ${r("MAX(value)")} AS v_hi
       |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  /** Mirrors Analytics.topkPerUser(k=3): per-user rank by (value desc,
    * event_id) — fully tie-broken, deterministic. */
  val topkPerUser: String =
    s"""WITH rk AS (
       |  SELECT user_id, event_id, event_type, value,
       |         ROW_NUMBER() OVER (PARTITION BY user_id
       |           ORDER BY value DESC, event_id) AS rnk
       |  FROM events
       |)
       |SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id, event_type,
       |       ${r("value")} AS value
       |FROM rk WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin

  /** Mirrors Analytics.driftPsi: identical binning, rate and (p−q)·ln(p/q)
    * arithmetic; the ≤~20-term per-type sum lands inside the 1e-6 rounding
    * box under any association order. */
  val driftPsi: String =
    s"""WITH b AS (
       |  SELECT event_type, (event_id % 2 = 0) AS is_base,
       |         CAST(floor(value / 100.0) AS BIGINT) AS bin
       |  FROM events
       |), c AS (
       |  SELECT event_type, is_base, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3
       |), t AS (
       |  SELECT event_type, is_base, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1, 2
       |), r0 AS (
       |  SELECT c.event_type, c.is_base, c.bin, CAST(c.n AS DOUBLE) / t.total AS rate
       |  FROM c JOIN t USING (event_type, is_base)
       |), pp AS (SELECT event_type, bin, rate AS p FROM r0 WHERE is_base),
       |qq AS (SELECT event_type, bin, rate AS q FROM r0 WHERE NOT is_base),
       |j AS (
       |  SELECT COALESCE(pp.event_type, qq.event_type) AS event_type, pp.p, qq.q
       |  FROM pp FULL OUTER JOIN qq
       |    ON pp.event_type = qq.event_type AND pp.bin = qq.bin
       |)
       |SELECT event_type,
       |       ${r("SUM(CASE WHEN p IS NOT NULL AND q IS NOT NULL THEN (p - q) * ln(p / q) END)")} AS psi,
       |       COUNT(CASE WHEN p IS NOT NULL AND q IS NOT NULL THEN 1 END) AS n_bins_common,
       |       COUNT(CASE WHEN p IS NULL OR q IS NULL THEN 1 END) AS n_bins_one_sided
       |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.driftKs: identical binned rates; the running sums
    * are window-ordered by bin (fixed accumulation order both engines). */
  val driftKs: String =
    s"""WITH b AS (
       |  SELECT event_type, (event_id % 2 = 0) AS is_base,
       |         CAST(floor(value / 100.0) AS BIGINT) AS bin
       |  FROM events
       |), c AS (
       |  SELECT event_type, is_base, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3
       |), t AS (
       |  SELECT event_type, is_base, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1, 2
       |), r0 AS (
       |  SELECT c.event_type, c.is_base, c.bin, CAST(c.n AS DOUBLE) / t.total AS rate
       |  FROM c JOIN t USING (event_type, is_base)
       |), m AS (
       |  SELECT event_type, bin,
       |         SUM(CASE WHEN is_base THEN rate ELSE 0.0 END) AS p,
       |         SUM(CASE WHEN NOT is_base THEN rate ELSE 0.0 END) AS q
       |  FROM r0 GROUP BY 1, 2
       |), g AS (
       |  SELECT event_type,
       |         abs(SUM(p) OVER (PARTITION BY event_type ORDER BY bin
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - SUM(q) OVER (PARTITION BY event_type ORDER BY bin
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS gap
       |  FROM m
       |)
       |SELECT event_type, ${r("MAX(gap)")} AS ks, COUNT(*) AS n_bins
       |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.driftWasserstein: the driftKs bin machinery plus
    * the lead-gap segment factor and the MAX read of the nondecreasing
    * running segment sum. */
  val driftWasserstein: String = {
    val wrun = "PARTITION BY event_type ORDER BY bin " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    s"""WITH b AS (
       |  SELECT event_type, (event_id % 2 = 0) AS is_base,
       |         CAST(floor(value / 100.0) AS BIGINT) AS bin
       |  FROM events
       |), c AS (
       |  SELECT event_type, is_base, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3
       |), t AS (
       |  SELECT event_type, is_base, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1, 2
       |), r0 AS (
       |  SELECT c.event_type, c.is_base, c.bin, CAST(c.n AS DOUBLE) / t.total AS rate
       |  FROM c JOIN t USING (event_type, is_base)
       |), m AS (
       |  SELECT event_type, bin,
       |         SUM(CASE WHEN is_base THEN rate ELSE 0.0 END) AS p,
       |         SUM(CASE WHEN NOT is_base THEN rate ELSE 0.0 END) AS q
       |  FROM r0 GROUP BY 1, 2
       |), g AS (
       |  SELECT event_type, bin,
       |         abs(SUM(p) OVER ($wrun) - SUM(q) OVER ($wrun)) *
       |           CAST(LEAD(bin, 1) OVER (PARTITION BY event_type ORDER BY bin) - bin AS DOUBLE) AS seg
       |  FROM m
       |), cw AS (
       |  SELECT event_type, bin, SUM(seg) OVER ($wrun) AS cw FROM g
       |)
       |SELECT event_type, ${r("COALESCE(MAX(cw), 0.0) * 100.0")} AS w1,
       |       COUNT(*) AS n_bins
       |FROM cw GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  /** Mirrors Analytics.retentionSurvival: identical integer duration/
    * at-risk arithmetic, the CondProd product-limit recursion replayed as
    * a recursive CTE over the per-duration rows (seed = 1·f₁ = f₁, an
    * exact IEEE identity). */
  val retentionSurvival: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events
      |), u AS (
      |  SELECT user_id, MIN(us) AS first_us, MAX(us) AS last_us FROM ev GROUP BY 1
      |), o AS (
      |  SELECT MAX(us) AS obs_us FROM ev
      |), lab AS (
      |  SELECT (last_us - first_us) // 86400000000 AS duration_days,
      |         CASE WHEN last_us < obs_us - 604800000000 THEN 1 ELSE 0 END AS churned
      |  FROM u CROSS JOIN o
      |), d AS (
      |  SELECT duration_days, COUNT(*) AS n_ending,
      |         CAST(SUM(churned) AS BIGINT) AS n_churned
      |  FROM lab GROUP BY 1
      |), rk AS MATERIALIZED (
      |  SELECT duration_days, n_churned,
      |         CAST(SUM(n_ending) OVER ()
      |           - COALESCE(SUM(n_ending) OVER (ORDER BY duration_days
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS n_at_risk,
      |         ROW_NUMBER() OVER (ORDER BY duration_days) AS rn
      |  FROM d
      |), km AS (
      |  SELECT rn, duration_days, n_churned, n_at_risk,
      |         1.0 - CAST(n_churned AS DOUBLE) / n_at_risk AS v
      |  FROM rk WHERE rn = 1
      |  UNION ALL
      |  SELECT rk.rn, rk.duration_days, rk.n_churned, rk.n_at_risk,
      |         km.v * (1.0 - CAST(rk.n_churned AS DOUBLE) / rk.n_at_risk)
      |  FROM km JOIN rk ON rk.rn = km.rn + 1
      |)
      |SELECT duration_days, n_at_risk, n_churned,
      |       CASE WHEN abs(v) > 9000000000.0 THEN v
      |            ELSE floor(v * 1000000 + 0.5) / 1000000 END AS km_survival
      |FROM km ORDER BY duration_days""".stripMargin

  /** Mirrors Analytics.windowSkew (n=20): the four power sums via the
    * sequential cum−lag fold, the identical raw-sums central-moment trees
    * (3.0*m*(s2/n) association preserved), same variance gate. */
  val windowSkew: String = {
    val n = 20
    val nd = s"$n.0"
    s"""$barsCte, ks1 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ${cumSum("close")} AS _c_1,
       |         COUNT(close) OVER ($Wrun) AS _c_1_n,
       |         ${cumSum("close * close")} AS _c_2,
       |         ${cumSum("close * close * close")} AS _c_3,
       |         ${cumSum("close * close * close * close")} AS _c_4
       |  FROM bars
       |), ks2 AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_1", n)} AS s1,
       |         ${cumRolling("_c_2", n)} AS s2,
       |         ${cumRolling("_c_3", n)} AS s3,
       |         ${cumRolling("_c_4", n)} AS s4,
       |         ${cumGate("_c_1", n)} AS g
       |  FROM ks1
       |), ks3 AS (
       |  SELECT symbol, event_id, s1, s2, s3, s4, g, s1 / $nd AS m
       |  FROM ks2
       |), ks4 AS (
       |  SELECT symbol, event_id, g,
       |         s2 / $nd - m * m AS m2,
       |         s3 / $nd - 3.0 * m * (s2 / $nd) + 2.0 * (m * m * m) AS m3,
       |         s4 / $nd - 4.0 * m * (s3 / $nd) +
       |           6.0 * (m * m) * (s2 / $nd) - 3.0 * (m * m * m * m) AS m4
       |  FROM ks3
       |)
       |SELECT symbol, event_id,
       |       ${r(s"CASE WHEN g AND m2 > 0.0 THEN m3 / sqrt(m2 * m2 * m2) END")} AS skew_$n,
       |       ${r(s"CASE WHEN g AND m2 > 0.0 THEN m4 / (m2 * m2) - 3.0 END")} AS kurt_$n
       |FROM ks4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.windowHurst (n=32): in-window prefix sums as
    * differences of the sequential global cumsum (same O(n·w) formulation),
    * window std from the cum−lag power sums, order-insensitive
    * list_max/min over the deviation profile, ln(n) emitted from the same
    * Scala literal. */
  val windowHurst: String = {
    val n = 32
    val lnn = math.log(n.toDouble).toString
    s"""$barsCte, hu1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("close")} AS _c,
       |         COUNT(close) OVER ($Wrun) AS _c_n,
       |         ${cumSum("close * close")} AS _c2
       |  FROM bars
       |), hu2 AS (
       |  SELECT symbol, event_id,
       |         list(_c) OVER (${frame(n)}) AS cs,
       |         COALESCE(LAG(_c, $n) OVER ($W), 0.0) AS base,
       |         (${cumRolling("_c", n)}) / $n AS m,
       |         (${cumRolling("_c2", n)}) / $n AS m2,
       |         ${cumGate("_c", n)} AS g
       |  FROM hu1
       |), hu3 AS (
       |  SELECT symbol, event_id, g, m,
       |         list_transform(range(1, ${n + 1}),
       |           k -> (cs[k] - base) - k * m) AS zs,
       |         sqrt(GREATEST(m2 - m * m, 0.0)) AS sd
       |  FROM hu2
       |)
       |SELECT symbol, event_id,
       |       ${r(s"""CASE WHEN g AND sd > 0.0
       |              AND (list_max(zs) - list_min(zs)) > 0.0
       |              THEN ln((list_max(zs) - list_min(zs)) / sd) / $lnn END""")} AS hurst_$n
       |FROM hu3 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.eventsMi: exact joint/marginal counts, identical
    * pointwise-MI tree, the per-type total replayed as a sequential
    * list_sum over the bin-ordered terms (== Spark's running-sum-at-last-
    * bin via max_by). */
  val eventsMi: String =
    s"""WITH b AS (
       |  SELECT event_type, CAST(floor(value / 100.0) AS BIGINT) AS bin
       |  FROM events
       |), j AS (
       |  SELECT event_type, bin, COUNT(*) AS n_tb FROM b GROUP BY 1, 2
       |), tt AS (
       |  SELECT event_type, CAST(SUM(n_tb) AS BIGINT) AS n_t FROM j GROUP BY 1
       |), bb AS (
       |  SELECT bin, CAST(SUM(n_tb) AS BIGINT) AS n_b FROM j GROUP BY 1
       |), ntot AS (
       |  SELECT CAST(SUM(n_tb) AS BIGINT) AS nn FROM j
       |), cells AS (
       |  SELECT j.event_type, j.bin, n_t,
       |         CAST(n_tb AS DOUBLE) / nn AS ptb,
       |         CAST(n_t AS DOUBLE) / nn AS pt,
       |         CAST(n_b AS DOUBLE) / nn AS pb
       |  FROM j JOIN tt USING (event_type) JOIN bb USING (bin) CROSS JOIN ntot
       |), terms AS (
       |  SELECT event_type, bin, n_t, ptb * ln(ptb / (pt * pb)) AS term
       |  FROM cells
       |)
       |SELECT event_type, MAX(n_t) AS n_events, COUNT(*) AS n_bins,
       |       ${r("COALESCE(list_sum(list(term ORDER BY bin)), 0.0)")} AS mi_contrib
       |FROM terms GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.driftJs: identical binned rates and per-bin JS
    * terms; the total replays Spark's bin-ordered running-sum fold with a
    * sequential list_sum over the bin-ordered term list. */
  val driftJs: String =
    s"""WITH b AS (
       |  SELECT event_type, (event_id % 2 = 0) AS is_base,
       |         CAST(floor(value / 100.0) AS BIGINT) AS bin
       |  FROM events
       |), c AS (
       |  SELECT event_type, is_base, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3
       |), t AS (
       |  SELECT event_type, is_base, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1, 2
       |), r0 AS (
       |  SELECT c.event_type, c.is_base, c.bin, CAST(c.n AS DOUBLE) / t.total AS rate
       |  FROM c JOIN t USING (event_type, is_base)
       |), m AS (
       |  SELECT event_type, bin,
       |         SUM(CASE WHEN is_base THEN rate ELSE 0.0 END) AS p,
       |         SUM(CASE WHEN NOT is_base THEN rate ELSE 0.0 END) AS q
       |  FROM r0 GROUP BY 1, 2
       |), g AS (
       |  SELECT event_type, bin, p > 0.0 AND q > 0.0 AS bth,
       |         (CASE WHEN p > 0.0 THEN p * ln(p / ((p + q) / 2.0)) * 0.5 ELSE 0.0 END) +
       |         (CASE WHEN q > 0.0 THEN q * ln(q / ((p + q) / 2.0)) * 0.5 ELSE 0.0 END) AS tm
       |  FROM m
       |)
       |SELECT event_type,
       |       ${r("COALESCE(list_sum(list(tm ORDER BY bin)), 0.0)")} AS js,
       |       COUNT(*) AS n_bins,
       |       COUNT(CASE WHEN NOT bth THEN 1 END) AS n_bins_one_sided
       |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.abtestZtest: exact distinct-user counting per arm
    * and per (goal, arm), identical pooled-variance tree, z gated on
    * se > 0 on both sides. */
  val abtestZtest: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, (user_id % 2 = 0) AS arm_a FROM events
       |), u AS (
       |  SELECT DISTINCT user_id, arm_a FROM ev
       |), tot AS (
       |  SELECT COUNT(CASE WHEN arm_a THEN 1 END) AS n_a,
       |         COUNT(CASE WHEN NOT arm_a THEN 1 END) AS n_b
       |  FROM u
       |), conv AS (
       |  SELECT event_type, arm_a, COUNT(DISTINCT user_id) AS x
       |  FROM ev GROUP BY 1, 2
       |), aa AS (SELECT event_type, x AS x_a FROM conv WHERE arm_a),
       |bb AS (SELECT event_type, x AS x_b FROM conv WHERE NOT arm_a),
       |j AS (
       |  SELECT COALESCE(aa.event_type, bb.event_type) AS event_type,
       |         COALESCE(x_a, 0) AS x_a, COALESCE(x_b, 0) AS x_b
       |  FROM aa FULL OUTER JOIN bb ON aa.event_type = bb.event_type
       |), k AS (
       |  SELECT j.*, tot.n_a, tot.n_b,
       |         CAST(x_a AS DOUBLE) / n_a AS pa,
       |         CAST(x_b AS DOUBLE) / n_b AS pb,
       |         CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS ppool
       |  FROM j CROSS JOIN tot
       |), zz AS (
       |  SELECT *, sqrt(ppool * (1.0 - ppool) * (1.0 / n_a + 1.0 / n_b)) AS se
       |  FROM k
       |)
       |SELECT event_type, x_a, n_a, x_b, n_b,
       |       ${r("pa")} AS rate_a, ${r("pb")} AS rate_b,
       |       ${r("CASE WHEN se > 0.0 THEN (pa - pb) / se END")} AS z,
       |       CAST(abs(CASE WHEN se > 0.0 THEN (pa - pb) / se END) > 1.96 AS INT) AS significant
       |FROM zz ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.userChurn: pure integer µs arithmetic (epoch_us ==
    * Spark's unix_micros under the shared UTC wall-clock convention), the
    * span-relative churn compare exact on both engines. */
  val userChurn: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
       |), peru AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |         COUNT(DISTINCT event_type) AS n_types,
       |         MIN(us) AS first_us, MAX(us) AS last_us
       |  FROM ev GROUP BY 1
       |), sp AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev)
       |SELECT user_id, n_events, n_types,
       |       last_us - first_us AS tenure_us,
       |       hi - last_us AS recency_us,
       |       CAST((hi - last_us) * 4 > (hi - lo) AS INT) AS churned
       |FROM peru CROSS JOIN sp ORDER BY user_id""".stripMargin

  val aggDistinct: String =
    """SELECT event_type, COUNT(*) AS n,
      |       COUNT(DISTINCT user_id) AS n_users,
      |       COUNT(DISTINCT (user_id, event_id % 2)) AS n_user_parities
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val setOps: String =
    """SELECT user_id, 'both' AS op FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT user_id, 'click_only' AS op FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY op, user_id""".stripMargin

  val jsonFields: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
      |FROM events ORDER BY event_id""".stripMargin

  val unpivotEvents: String = {
    val types = graft.Params.EventTypes
    val branches = types.map(t =>
      s"SELECT user_id, '$t' AS event_type, SUM(value) AS value_sum FROM events WHERE event_type = '$t' GROUP BY user_id")
      .mkString("\n  UNION ALL\n  ")
    s"""SELECT user_id, event_type, ${r("value_sum")} AS value_sum FROM (
       |  $branches
       |) ORDER BY user_id, event_type""".stripMargin
  }

  val cvFolds: String = {
    val k = 4
    val folds = (1 to k).map { f =>
      s"""SELECT CAST($f AS BIGINT) AS fold, event_id,
         |       CASE WHEN rn <= $f * n // ${k + 1} THEN 'train' ELSE 'validate' END AS role
         |FROM s WHERE rn <= ${f + 1} * n // ${k + 1}""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |  SELECT event_id, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
       |         COUNT(*) OVER () AS n
       |  FROM events
       |)
       |$folds
       |ORDER BY fold, event_id""".stripMargin
  }

  val joinAnti: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  val joinSemi: String =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  val joinOuter: String =
    s"""WITH li AS (
      |  SELECT l_orderkey, COUNT(*) AS n_items,
      |         SUM(l_extendedprice * (1 - l_discount)) AS rev
      |  FROM lineitem GROUP BY l_orderkey
      |)
      |SELECT o.o_orderkey, COALESCE(li.n_items, 0) AS n_items,
      |       ${r4("COALESCE(li.rev, 0.0)")} AS revenue
      |FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
      |ORDER BY o.o_orderkey""".stripMargin

  val joinRange: String =
    s"""SELECT o.o_orderpriority, COUNT(*) AS n_fast_lines,
       |       ${r("AVG(l.l_discount)")} AS avg_disc
       |FROM lineitem l JOIN orders o
       |  ON l.l_orderkey = o.o_orderkey
       | AND l.l_shipdate >= o.o_orderdate
       | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
       |GROUP BY o.o_orderpriority
       |ORDER BY o.o_orderpriority""".stripMargin

  val pivotEvents: String = {
    val types = graft.Params.EventTypes
    val cols = types.map(t =>
      s"${r(s"SUM(value) FILTER (WHERE event_type = '$t')")} AS v_$t")
      .mkString(",\n       ")
    s"""SELECT user_id,
       |       $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  val sampleStratified: String =
    s"""WITH ranked AS (
       |  SELECT event_type, event_id,
       |         ROW_NUMBER() OVER (PARTITION BY event_type
       |           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS strat_rn
       |  FROM events
       |)
       |SELECT event_type, strat_rn, event_id FROM ranked
       |WHERE strat_rn <= 100 ORDER BY event_type, strat_rn""".stripMargin

  val aggCube: String =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       |       COALESCE(l_linestatus, '(all)') AS linestatus,
       |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |       COUNT(*) AS n,
       |       SUM(l_quantity) AS sum_qty,
       |       ${r("AVG(l_discount)")} AS avg_disc
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, returnflag, linestatus""".stripMargin

  val joinFull: String =
    """WITH c AS (
      |  SELECT user_id, COUNT(*) AS n_clicks FROM events
      |  WHERE event_type = 'click' GROUP BY user_id
      |), p AS (
      |  SELECT user_id, COUNT(*) AS n_purchases FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id
      |)
      |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |       COALESCE(n_clicks, 0) AS n_clicks,
      |       COALESCE(n_purchases, 0) AS n_purchases
      |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
      |ORDER BY user_id""".stripMargin

  val funnelEvents: String =
    """WITH r0 AS (
      |  SELECT user_id, MIN(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), r1 AS (
      |  SELECT e.user_id AS user_id, MIN(e.ts) AS t
      |  FROM events e JOIN r0 ON e.user_id = r0.user_id AND e.ts > r0.t
      |  WHERE e.event_type = 'click' GROUP BY 1
      |), r2 AS (
      |  SELECT e.user_id AS user_id, MIN(e.ts) AS t
      |  FROM events e JOIN r1 ON e.user_id = r1.user_id AND e.ts > r1.t
      |  WHERE e.event_type = 'purchase' GROUP BY 1
      |)
      |SELECT * FROM (
      |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM r0
      |  UNION ALL
      |  SELECT CAST(1 AS BIGINT), 'click', COUNT(*) FROM r1
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'purchase', COUNT(*) FROM r2
      |) ORDER BY stage_idx""".stripMargin

  /** Mirrors Analytics.assocPairs (Behavior.assocPairs): distinct user×type
    * self-join replays the array-side pair generation (set semantics are
    * identical); support/lift in the same op order over exact counts. */
  val assocPairs: String = {
    val sup = "CAST(n_ab AS DOUBLE) / n_users"
    s"""WITH ut AS (
       |  SELECT DISTINCT user_id, event_type FROM events
       |), u AS (
       |  SELECT COUNT(DISTINCT user_id) AS n_users FROM events
       |), t AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1
       |), p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |         CAST(COUNT(*) AS BIGINT) AS n_ab
       |  FROM ut a JOIN ut b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT type_a, type_b, n_ab,
       |       ${r(sup)} AS support,
       |       ${r(s"($sup) / ((CAST(ta.n_t AS DOUBLE) / n_users) * (CAST(tb.n_t AS DOUBLE) / n_users))")} AS lift
       |FROM p
       |JOIN t ta ON ta.event_type = type_a
       |JOIN t tb ON tb.event_type = type_b
       |CROSS JOIN u
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** Mirrors Analytics.eventsMarkov (Behavior.transitionMatrix): lag over
    * the per-user (ts, event_id) order, pair counts, row-normalized p. */
  val eventsMarkov: String =
    s"""WITH seq AS (
       |  SELECT event_type AS next_type,
       |         LAG(event_type, 1) OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id) AS prev_type
       |  FROM events
       |), c AS (
       |  SELECT prev_type, next_type, COUNT(*) AS n
       |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT prev_type, next_type, n,
       |       ${r("CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)")} AS p
       |FROM c ORDER BY prev_type, next_type""".stripMargin

  val retentionCohorts: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events GROUP BY user_id
      |), a AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
      |)
      |SELECT f.cohort_week,
      |       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT) AS week_offset,
      |       COUNT(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Mirrors Analytics.windowWinsorize: exact windowed p05/p95 over the
    * 21-bar frame (quantile_cont == the Spark side's two-product
    * interpolation), clamp + clipped flag from the unrounded band. */
  val windowWinsorize: String = {
    val f = frame(21)
    s"""$barsCte, m AS (
       |  SELECT symbol, event_id, close,
       |         quantile_cont(close, 0.05) OVER ($f) AS p05,
       |         quantile_cont(close, 0.95) OVER ($f) AS p95
       |  FROM bars
       |)
       |SELECT symbol, event_id,
       |       ${r("LEAST(GREATEST(close, p05), p95)")} AS w_close,
       |       ${r("p05")} AS p05_close, ${r("p95")} AS p95_close,
       |       CAST(close < p05 OR close > p95 AS INT) AS clipped
       |FROM m ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.aggMode: per-user modal event type with the
    * (count desc, type asc) deterministic tie-break. */
  val aggMode: String =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY user_id, event_type
      |), rk AS (
      |  SELECT user_id, event_type, cnt,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |           ORDER BY cnt DESC, event_type) AS rn
      |  FROM c
      |)
      |SELECT user_id, event_type AS mode_event_type, cnt
      |FROM rk WHERE rn = 1 ORDER BY user_id""".stripMargin

  val windowMedian: String = {
    val f = frame(21)
    s"""$barsCte, m AS (
       |  SELECT symbol, event_id,
       |         quantile_cont(close, 0.5) OVER ($f) AS med,
       |         quantile_cont(close, 0.25) OVER ($f) AS p25,
       |         quantile_cont(close, 0.75) OVER ($f) AS p75
       |  FROM bars
       |)
       |SELECT symbol, event_id, ${r("med")} AS med_close,
       |       ${r("p25")} AS p25_close, ${r("p75")} AS p75_close,
       |       ${r("p75 - p25")} AS iqr_close
       |FROM m ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.windowAutocorr: lag returns + the standard cum−lag
    * rolling-sum replay over the (ret, ret_prev) pair. */
  /** Mirrors Analytics.windowTrend (n=20): ROW_NUMBER position, three
    * cum−lag rolling sums, constant Σt/Σt², identical op order
    * throughout. */
  val windowTrend: String = {
    val n = 20
    val nD = s"$n.0"
    val st = (n * (n - 1) / 2.0).toString
    val stt = (n * (n - 1) * (2 * n - 1) / 6.0).toString
    s"""$barsCte, t0 AS (
       |  SELECT symbol, event_id, datetime, close,
       |         CAST(ROW_NUMBER() OVER ($W) AS DOUBLE) AS j
       |  FROM bars
       |), t1 AS (
       |  SELECT symbol, event_id, datetime, close, j,
       |         ${cumSum("close")} AS _c_y,
       |         COUNT(close) OVER ($Wrun) AS _c_y_n,
       |         ${cumSum("j * close")} AS _c_jy,
       |         ${cumSum("close * close")} AS _c_y2
       |  FROM t0
       |), t2 AS (
       |  SELECT symbol, event_id, j,
       |         ${cumRolling("_c_y", n)} AS sy,
       |         ${cumRolling("_c_jy", n)} AS sjy,
       |         ${cumRolling("_c_y2", n)} AS syy,
       |         ${cumGate("_c_y", n)} AS g
       |  FROM t1
       |), t3 AS (
       |  SELECT symbol, event_id, sy, syy, g,
       |         sjy - (j - ${(n - 1).toDouble}) * sy AS sty
       |  FROM t2
       |), t4 AS (
       |  SELECT symbol, event_id, sy, g,
       |         $nD * sty - $st * sy AS num,
       |         $nD * $stt - $st * $st AS dent,
       |         $nD * syy - sy * sy AS vary
       |  FROM t3
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g THEN num / dent END")} AS trend_slope,
       |       ${r("CASE WHEN g THEN (sy - (num / dent) * " + st + ") / " + nD + " END")} AS trend_intercept,
       |       ${r("CASE WHEN g AND vary > 0.0 THEN (num * num) / (dent * vary) END")} AS trend_r2
       |FROM t4 ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.seasonalityProfile: per (symbol, hour) grouped
    * sums over returns — plain SUM on both sides (see aggStats note). */
  val seasonalityProfile: String =
    s"""$barsCte, r0 AS (
       |  SELECT symbol, event_id,
       |         CAST(hour(datetime) AS BIGINT) AS hod, volume,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS ret
       |  FROM bars
       |), r1 AS (
       |  SELECT * FROM r0 WHERE ret IS NOT NULL
       |), g AS (
       |  SELECT symbol, hod, COUNT(*) AS n_bars,
       |         SUM(ret) AS sr, SUM(abs(ret)) AS sar, SUM(volume) AS sv
       |  FROM r1 GROUP BY symbol, hod
       |)
       |SELECT symbol, hod, n_bars,
       |       ${r("sr / n_bars")} AS avg_ret,
       |       ${r("sar / n_bars")} AS avg_abs_ret,
       |       ${r("sv / n_bars")} AS avg_volume
       |FROM g ORDER BY symbol, hod""".stripMargin

  val windowAutocorr: String = {
    val n = 20
    val nD = s"$n.0"
    s"""$barsCte, rr0 AS (
       |  SELECT symbol, event_id, datetime,
       |         (close - LAG(close, 1) OVER ($W)) / LAG(close, 1) OVER ($W) AS ret
       |  FROM bars
       |), pp0 AS (
       |  SELECT symbol, event_id, datetime, ret,
       |         LAG(ret, 1) OVER ($W) AS ret_prev
       |  FROM rr0
       |), pp AS (
       |  SELECT * FROM pp0 WHERE ret IS NOT NULL AND ret_prev IS NOT NULL
       |), c AS (
       |  SELECT symbol, event_id, datetime,
       |         ${cumSum("ret")} AS _c_x,
       |         COUNT(ret) OVER ($Wrun) AS _c_x_n,
       |         ${cumSum("ret_prev")} AS _c_y,
       |         ${cumSum("ret * ret_prev")} AS _c_xy,
       |         ${cumSum("ret * ret")} AS _c_xx,
       |         ${cumSum("ret_prev * ret_prev")} AS _c_yy
       |  FROM pp
       |), rolled AS (
       |  SELECT symbol, event_id,
       |         ${cumRolling("_c_x", n)} AS sx,
       |         ${cumRolling("_c_y", n)} AS sy,
       |         ${cumRolling("_c_xy", n)} AS sxy,
       |         ${cumRolling("_c_xx", n)} AS sxx,
       |         ${cumRolling("_c_yy", n)} AS syy,
       |         ${cumGate("_c_x", n)} AS g
       |  FROM c
       |), f AS (
       |  SELECT symbol, event_id,
       |         $nD * sxx - sx * sx AS varx,
       |         $nD * syy - sy * sy AS vary,
       |         $nD * sxy - sx * sy AS cov, g
       |  FROM rolled
       |)
       |SELECT symbol, event_id,
       |       ${r("CASE WHEN g AND varx > 0.0 AND vary > 0.0 THEN cov / (sqrt(varx) * sqrt(vary)) END")} AS autocorr_1
       |FROM f ORDER BY event_id""".stripMargin
  }

  /** Mirrors Core.barsAdjust: integer suffix-sum of split exponents +
    * pow(2, k) — exact powers of two in both engines. */
  val barsAdjust: String =
    s"""$barsCte, sp AS (
       |  SELECT symbol, event_id, datetime, close,
       |         CASE WHEN event_id % 997 = 0 THEN 1 ELSE 0 END AS split_exp
       |  FROM bars
       |), k AS (
       |  SELECT symbol, event_id, close, split_exp,
       |         COALESCE(SUM(split_exp) OVER (PARTITION BY symbol
       |           ORDER BY datetime, event_id
       |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS k
       |  FROM sp
       |)
       |SELECT symbol, event_id, split_exp = 1 AS is_split,
       |       CAST(k AS BIGINT) AS n_future_splits,
       |       ${r("close")} AS close,
       |       ${r("close / power(2.0, CAST(k AS DOUBLE))")} AS adj_close
       |FROM k ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.aggGini: identical fixed-point encoding, exact
    * integer sums, identical final double tree. */
  val aggGini: String =
    s"""WITH t AS (
       |  SELECT event_type, event_id,
       |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v_i
       |  FROM events WHERE value IS NOT NULL
       |), rr AS (
       |  SELECT event_type, v_i,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v_i, event_id) AS i
       |  FROM t
       |), a AS (
       |  SELECT event_type, COUNT(*) AS n,
       |         CAST(SUM(v_i) AS BIGINT) AS s0,
       |         CAST(SUM(i * v_i) AS BIGINT) AS s1
       |  FROM rr GROUP BY 1
       |)
       |SELECT event_type, n, ${r("CAST(s0 AS DOUBLE) / 10000.0")} AS total_value,
       |       ${r("CASE WHEN s0 <> 0 THEN (2.0 * CAST(s1 AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(s0 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE)) END")} AS gini
       |FROM a ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.userRfm: integer sort keys (micros / count /
    * fixed-point monetary) make every rank bit-portable; quintiles are the
    * same integer (rank−1)·5 // n + 1, never ntile(). */
  val userRfm: String =
    s"""WITH p AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, value
       |  FROM events WHERE event_type = 'purchase'
       |), u AS (
       |  SELECT user_id, MAX(ts_us) AS last_us, COUNT(*) AS frequency,
       |         CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS m_i
       |  FROM p GROUP BY 1
       |), mx AS (
       |  SELECT MAX(last_us) AS corpus_max FROM u
       |), rr AS (
       |  SELECT u.*,
       |         ROW_NUMBER() OVER (ORDER BY last_us, user_id) AS r_rn,
       |         ROW_NUMBER() OVER (ORDER BY frequency, user_id) AS f_rn,
       |         ROW_NUMBER() OVER (ORDER BY m_i, user_id) AS m_rn,
       |         COUNT(*) OVER () AS n
       |  FROM u
       |), sc AS (
       |  SELECT user_id, last_us, frequency, m_i,
       |         (r_rn - 1) * 5 // n + 1 AS r_score,
       |         (f_rn - 1) * 5 // n + 1 AS f_score,
       |         (m_rn - 1) * 5 // n + 1 AS m_score
       |  FROM rr
       |)
       |SELECT user_id,
       |       ${r("CAST(corpus_max - last_us AS DOUBLE) / 86400000000.0")} AS recency_days,
       |       frequency,
       |       ${r("CAST(m_i AS DOUBLE) / 10000.0")} AS monetary,
       |       CAST(r_score AS BIGINT) AS r_score,
       |       CAST(f_score AS BIGINT) AS f_score,
       |       CAST(m_score AS BIGINT) AS m_score,
       |       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
       |FROM sc, mx ORDER BY user_id""".stripMargin

  /** Mirrors Analytics.dqChecks: identical conditional counts (ELSE 0, so
    * NULL comparisons fall through the same way) and the same
    * dup-surplus sum for the uniqueness rule. */
  /** Mirrors Analytics.dqKanon / Privacy.kAnonymityReport: the same QI
    * grouping (hour + floor(value/100) buckets), the same size bands and
    * worst-in-band l-diversity, the one share division over the band
    * totals. All-integer until that division. */
  val dqKanon: String =
    s"""WITH cl AS (
       |  SELECT event_type, hour(ts) AS h,
       |         CAST(floor(value / 100.0) AS BIGINT) AS vb,
       |         CAST(COUNT(*) AS BIGINT) AS class_size,
       |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_div
       |  FROM events GROUP BY 1, 2, 3
       |), b AS (
       |  SELECT CASE WHEN class_size = 1 THEN 'k=1'
       |              WHEN class_size <= 4 THEN 'k=2-4'
       |              WHEN class_size <= 9 THEN 'k=5-9'
       |              WHEN class_size <= 49 THEN 'k=10-49'
       |              ELSE 'k>=50' END AS k_band,
       |         class_size, l_div
       |  FROM cl
       |), agg AS (
       |  SELECT k_band, CAST(COUNT(*) AS BIGINT) AS n_classes,
       |         CAST(SUM(class_size) AS BIGINT) AS n_rows,
       |         MIN(l_div) AS min_l_diversity
       |  FROM b GROUP BY 1
       |)
       |SELECT k_band, n_classes, n_rows, min_l_diversity,
       |       ${r("CAST(n_rows AS DOUBLE) / SUM(n_rows) OVER ()")} AS row_share
       |FROM agg ORDER BY k_band""".stripMargin

  val dqChecks: String = {
    val vocab = Params.EventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH narrow AS (
       |  SELECT COUNT(*) AS n,
       |         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value,
       |         SUM(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS neg_value,
       |         SUM(CASE WHEN event_type NOT IN ($vocab) THEN 1 ELSE 0 END) AS bad_type,
       |         SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS null_ts
       |  FROM events
       |), dups AS (
       |  SELECT COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS dup_id
       |  FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id)
       |), st AS (
       |  SELECT 'event_id_unique' AS rule, dup_id AS v FROM dups
       |  UNION ALL SELECT 'event_type_in_vocab', bad_type FROM narrow
       |  UNION ALL SELECT 'ts_not_null', null_ts FROM narrow
       |  UNION ALL SELECT 'value_non_negative', neg_value FROM narrow
       |  UNION ALL SELECT 'value_not_null', null_value FROM narrow
       |)
       |SELECT rule, n AS n_checked, CAST(v AS BIGINT) AS n_violations,
       |       ${r("CAST(v AS DOUBLE) / n")} AS violation_rate,
       |       v = 0 AS passed
       |FROM st, narrow ORDER BY rule""".stripMargin
  }

  /** Mirrors Analytics.windowMad: frame median via quantile_cont (==
    * Spark's two-product interp, see windowMedian), MAD via the manual
    * two-product interpolation over the sorted abs-deviation list (the
    * deviations are against the row's own frame median, so no windowed
    * percentile can express it in either engine). */
  val windowMad: String = {
    val f = frame(21)
    val lo = "CAST(floor(h) AS BIGINT) + 1"
    val hi = "CAST(ceil(h) AS BIGINT) + 1"
    val zExpr = "0.6745 * (close - med) / mad"
    s"""$barsCte, m AS (
       |  SELECT symbol, event_id, close,
       |         list(close) OVER ($f) AS arr,
       |         quantile_cont(close, 0.5) OVER ($f) AS med
       |  FROM bars
       |), d AS (
       |  SELECT symbol, event_id, close, med,
       |         list_sort(list_transform(arr, x -> abs(x - med))) AS darr
       |  FROM m
       |), k AS (
       |  SELECT symbol, event_id, close, med, darr,
       |         CAST(len(darr) - 1 AS DOUBLE) * 0.5 AS h
       |  FROM d
       |), mm AS (
       |  SELECT symbol, event_id, close, med,
       |         CASE WHEN floor(h) = ceil(h) THEN darr[$lo]
       |              ELSE darr[$lo] * (ceil(h) - h) + darr[$hi] * (h - floor(h)) END AS mad
       |  FROM k
       |)
       |SELECT symbol, event_id, ${r("med")} AS med_close, ${r("mad")} AS mad_close,
       |       ${r(s"CASE WHEN mad > 0.0 THEN $zExpr END")} AS robust_z,
       |       CASE WHEN mad > 0.0 THEN abs($zExpr) > 3.5 END AS is_outlier
       |FROM mm ORDER BY event_id""".stripMargin
  }

  /** Mirrors Analytics.lakeUpsert: union base (v1) + changed (v2) + inserted
    * (v2, key + 1e9), keep the max-version row per key. Versions are unique
    * per key in the fixture, so ROW_NUMBER is deterministic. */
  /** Mirrors Analytics.lakeCompactPlan / Lake.compactionPlan: the same
    * hourly manifest, the same exact integer running sum and
    * (cum−1) div 2000 bin assignment — all-integer plus two timestamps,
    * no float surface anywhere. */
  val lakeCompactPlan: String =
    s"""WITH m AS (
       |  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1
       |), c AS (
       |  SELECT hr, n,
       |         CAST(SUM(n) OVER (ORDER BY hr
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS cum
       |  FROM m
       |)
       |SELECT (cum - 1) // 2000 AS bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       |       CAST(SUM(n) AS BIGINT) AS total_rows,
       |       MIN(hr) AS first_hr, MAX(hr) AS last_hr
       |FROM c GROUP BY 1 ORDER BY bin""".stripMargin

  val lakeUpsert: String =
    s"""WITH base AS (
       |  SELECT event_id, user_id, value, CAST(1 AS BIGINT) AS version FROM events
       |), upd AS (
       |  SELECT event_id, user_id, value + 1000.0 AS value, CAST(2 AS BIGINT) AS version
       |  FROM events WHERE event_id % 10 = 0
       |  UNION ALL
       |  SELECT event_id + 1000000000, user_id, value, CAST(2 AS BIGINT)
       |  FROM events WHERE event_id % 29 = 0
       |), merged AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY version DESC) AS rn
       |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)
       |)
       |SELECT event_id, user_id, ${r("value")} AS value, version
       |FROM merged WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.snapshotDiff: full outer join on the key with
    * presence markers (value nullability must not read as absence), change
    * test IS DISTINCT FROM (null-safe, = Spark's !(a <=> b)). */
  val snapshotDiff: String =
    s"""WITH olds AS (
       |  SELECT event_id, value, TRUE AS in_old FROM events
       |), news AS (
       |  SELECT event_id,
       |         CASE WHEN event_id % 13 = 0 THEN value + 1.0 ELSE value END AS value,
       |         TRUE AS in_new
       |  FROM events WHERE event_id % 17 <> 0
       |  UNION ALL
       |  SELECT event_id + 1000000000, value, TRUE FROM events WHERE event_id % 29 = 0
       |), j AS (
       |  SELECT COALESCE(o.event_id, n.event_id) AS event_id,
       |         o.value AS old_value, n.value AS new_value, o.in_old, n.in_new
       |  FROM olds o FULL OUTER JOIN news n ON o.event_id = n.event_id
       |)
       |SELECT event_id,
       |       CASE WHEN in_old IS NULL THEN 'added'
       |            WHEN in_new IS NULL THEN 'removed'
       |            ELSE 'changed' END AS change,
       |       ${r("old_value")} AS old_value, ${r("new_value")} AS new_value
       |FROM j
       |WHERE in_old IS NULL OR in_new IS NULL OR (old_value IS DISTINCT FROM new_value)
       |ORDER BY event_id""".stripMargin

  /** Mirrors Analytics.scd2Asof: state at each (user, hour) probe via the
    * half-open interval join — equivalent to the Spark side's linear
    * union+window "latest change at or before t" (a zero-width interval is
    * never observable in either form). */
  val scd2Asof: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn0
      |  FROM events
      |), c AS (
      |  SELECT user_id, ts, event_id, event_type FROM o
      |  WHERE rn0 = 1 OR prev IS DISTINCT FROM event_type
      |), hist AS (
      |  SELECT user_id, event_type, ts AS valid_from,
      |         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      |  FROM c
      |), probes AS (
      |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS at_ts FROM events
      |)
      |SELECT p.user_id, p.at_ts, s.event_type AS state_type, s.version
      |FROM probes p LEFT JOIN hist s
      |  ON s.user_id = p.user_id AND s.valid_from <= p.at_ts
      |     AND (s.valid_to IS NULL OR p.at_ts < s.valid_to)
      |ORDER BY p.user_id, p.at_ts""".stripMargin

  /** Mirrors Analytics.scd2History: keep rows where event_type changes in
    * (ts, event_id) order, then validity intervals + per-user version. */
  val scd2History: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn0
      |  FROM events
      |), c AS (
      |  SELECT user_id, ts, event_id, event_type FROM o
      |  WHERE rn0 = 1 OR prev IS DISTINCT FROM event_type
      |)
      |SELECT user_id, event_type, ts AS valid_from,
      |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      |FROM c ORDER BY user_id, version""".stripMargin

  /** Mirrors Analytics.aggTrimmedMean: exact-rank 5% trim under the total
    * order (value, event_id), winsorized twin clamps tails to the inner
    * min/max; float sums meet only at the r6 boundary (agg_stats class). */
  val aggTrimmedMean: String =
    s"""WITH rk AS (
       |  SELECT event_type, event_id, value,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
       |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM events
       |), c AS (
       |  SELECT event_type, value, rk, n,
       |         CAST(floor(CAST(n AS DOUBLE) * 0.05) AS BIGINT) AS cut
       |  FROM rk
       |), st AS (
       |  SELECT event_type, n, cut, value, rk,
       |         CASE WHEN rk > cut AND rk <= n - cut THEN value END AS v_in
       |  FROM c
       |), st2 AS (
       |  SELECT event_type, n, cut, rk, value, v_in,
       |         MIN(v_in) OVER (PARTITION BY event_type) AS lo,
       |         MAX(v_in) OVER (PARTITION BY event_type) AS hi
       |  FROM st
       |)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       |       CAST(MAX(cut) AS BIGINT) AS n_cut_each,
       |       ${r("SUM(v_in) / COUNT(v_in)")} AS trimmed_mean,
       |       ${r("SUM(CASE WHEN rk > cut AND rk <= n - cut THEN value WHEN rk <= cut THEN lo ELSE hi END) / COUNT(*)")} AS winsorized_mean
       |FROM st2 GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.eventsDispersion: dense hourly grid via per-type
    * range(), exact BIGINT power sums, identical double formula chain
    * (var = (k·s2 − s1²)/(k·(k−1)), vmr = var/mean, chi2 = vmr·(k−1)). */
  /** Mirrors Analytics.aggQuantileSketch (Sketches.qsketch*): the same
    * µ-unit quantization, bin()-bitlength bucket mapping (integer shifts
    * are native here, exact double exponent-math on the Spark side),
    * per-type + merged `__all` counts, integer running sums, and the
    * ceil(q·N) crossing-bucket lower bound; exact order statistic by
    * (value, event_id) as the yardstick. */
  val aggQuantileSketch: String = {
    val tg = "(VALUES (0.5), (0.9), (0.99)) tg(q0)"
    s"""WITH q0 AS (
       |  SELECT event_type, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS u
       |  FROM events
       |), bk AS (
       |  SELECT event_type,
       |         CASE WHEN u < 64 THEN u
       |              ELSE 64 + (CAST(length(bin(u)) AS BIGINT) - 7) * 32
       |                   + ((u >> CAST(length(bin(u)) - 6 AS INT)) - 32) END AS bucket
       |  FROM q0
       |), c AS MATERIALIZED (
       |  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bk GROUP BY 1, 2
       |), call AS (
       |  SELECT event_type, bucket, cnt FROM c
       |  UNION ALL
       |  SELECT '__all' AS event_type, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM c GROUP BY bucket
       |), cm AS (
       |  SELECT event_type, bucket, cnt,
       |         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
       |         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM call
       |), hit AS (
       |  SELECT event_type, CAST(q0 AS DOUBLE) AS q, MIN(bucket) AS bucket, MAX(n) AS n_events
       |  FROM cm CROSS JOIN $tg
       |  WHERE cum >= GREATEST(CAST(1 AS BIGINT),
       |          CAST(ceil(CAST(q0 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
       |  GROUP BY 1, 2
       |), est AS (
       |  SELECT event_type, q, n_events,
       |         CASE WHEN bucket < 64 THEN bucket
       |              ELSE (((bucket - 64) % 32) + 32) << CAST((bucket - 64) // 32 + 1 AS INT)
       |         END AS lowu
       |  FROM hit
       |), rk AS (
       |  SELECT event_type, value,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM (SELECT event_type, event_id, value FROM q0
       |        UNION ALL
       |        SELECT '__all', event_id, value FROM q0)
       |), ex AS (
       |  SELECT event_type, CAST(q0 AS DOUBLE) AS q, value AS exact
       |  FROM rk CROSS JOIN $tg
       |  WHERE rn = GREATEST(CAST(1 AS BIGINT),
       |          CAST(ceil(CAST(q0 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))
       |)
       |SELECT est.event_type, est.q, est.n_events,
       |       ${r("CAST(lowu AS DOUBLE) / 1000000.0")} AS est,
       |       ${r("exact")} AS exact
       |FROM est JOIN ex ON ex.event_type = est.event_type AND ex.q = est.q
       |ORDER BY est.event_type, est.q""".stripMargin
  }

  /** Mirrors Analytics.eventsQuantileSliding: daily qsketch buckets,
    * 7-day range-join merge (SUM of counts), the ceil(0.5·N) crossing
    * bucket, exact windowed median yardstick. */
  val eventsQuantileSliding: String =
    s"""WITH q0 AS (
       |  SELECT CAST(ts AS DATE) AS day, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS u
       |  FROM events
       |), bk AS (
       |  SELECT day,
       |         CASE WHEN u < 64 THEN u
       |              ELSE 64 + (CAST(length(bin(u)) AS BIGINT) - 7) * 32
       |                   + ((u >> CAST(length(bin(u)) - 6 AS INT)) - 32) END AS bucket
       |  FROM q0
       |), daily AS MATERIALIZED (
       |  SELECT day, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bk GROUP BY 1, 2
       |), days AS (
       |  SELECT DISTINCT day AS d FROM daily
       |), m AS (
       |  SELECT dd.d, daily.bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM daily JOIN days dd
       |    ON daily.day >= dd.d - INTERVAL 6 DAY AND daily.day <= dd.d
       |  GROUP BY 1, 2
       |), cm AS (
       |  SELECT d, bucket,
       |         CAST(SUM(cnt) OVER (PARTITION BY d ORDER BY bucket) AS BIGINT) AS cum,
       |         CAST(SUM(cnt) OVER (PARTITION BY d) AS BIGINT) AS n
       |  FROM m
       |), hit AS (
       |  SELECT d, MIN(bucket) AS bucket, MAX(n) AS n_7d
       |  FROM cm
       |  WHERE cum >= GREATEST(CAST(1 AS BIGINT),
       |          CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT))
       |  GROUP BY 1
       |), est AS (
       |  SELECT d, n_7d,
       |         CASE WHEN bucket < 64 THEN bucket
       |              ELSE (((bucket - 64) % 32) + 32) << CAST((bucket - 64) // 32 + 1 AS INT)
       |         END AS lowu
       |  FROM hit
       |), rk AS (
       |  SELECT dd.d, value,
       |         ROW_NUMBER() OVER (PARTITION BY dd.d ORDER BY value, event_id) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY dd.d) AS BIGINT) AS n
       |  FROM q0 JOIN days dd ON q0.day >= dd.d - INTERVAL 6 DAY AND q0.day <= dd.d
       |), ex AS (
       |  SELECT d, value AS p50_exact
       |  FROM rk
       |  WHERE rn = GREATEST(CAST(1 AS BIGINT),
       |          CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT))
       |)
       |SELECT est.d AS day, est.n_7d,
       |       ${r("CAST(lowu AS DOUBLE) / 1000000.0")} AS p50_est_7d,
       |       ${r("p50_exact")} AS p50_exact_7d,
       |       ${r("(CAST(lowu AS DOUBLE) / 1000000.0 - p50_exact) / p50_exact")} AS rel_err
       |FROM est JOIN ex ON ex.d = est.d
       |ORDER BY day""".stripMargin

  val eventsDispersion: String =
    s"""WITH e0 AS (
       |  SELECT event_type,
       |         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hb
       |  FROM events
       |), c AS (
       |  SELECT event_type, hb, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM e0 GROUP BY 1, 2
       |), sp AS (
       |  SELECT event_type, MIN(hb) AS h0, MAX(hb) AS h1 FROM e0 GROUP BY 1
       |), grid AS (
       |  SELECT sp.event_type, u.hb
       |  FROM sp, UNNEST(range(sp.h0, sp.h1 + 1)) u(hb)
       |), dense AS (
       |  SELECT grid.event_type, grid.hb, COALESCE(c.n, 0) AS n
       |  FROM grid LEFT JOIN c
       |    ON c.event_type = grid.event_type AND c.hb = grid.hb
       |), agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
       |         CAST(SUM(n) AS BIGINT) AS s1,
       |         CAST(SUM(n * n) AS BIGINT) AS s2
       |  FROM dense GROUP BY 1
       |  HAVING COUNT(*) >= 2 AND SUM(n) > 0
       |)
       |SELECT event_type, k AS n_bins, s1 AS n_events,
       |       ${r("CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)")} AS mean_count,
       |       ${r("CAST(CAST(k AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,0)) - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0)) AS DOUBLE) / CAST(k * (k - 1) AS DOUBLE) / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))")} AS vmr,
       |       ${r("CAST(CAST(k AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,0)) - CAST(s1 AS DECIMAL(19,0)) * CAST(s1 AS DECIMAL(19,0)) AS DOUBLE) / CAST(k * (k - 1) AS DOUBLE) / (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) * CAST(k - 1 AS DOUBLE)")} AS chi2
       |FROM agg ORDER BY event_type""".stripMargin

  /** Mirrors Analytics.eventsBurst (expr.Burst2): the 2-state Viterbi cost
    * recursion replayed per user in a recursive CTE. The per-row cost
    * terms contain NO data-dependent libm call (the shared −ln λ is
    * dropped, argmin-invariant; ln s is the interpolated Scala literal),
    * so every double is an identical IEEE op in both engines; the min
    * re-basing per step is replayed verbatim (expressions duplicated
    * inline — same value, single recursion reference per term). Seed at
    * rn = 2 from the pre-observation costs (0, γ); rn = 1 rows emit NULLs
    * via the LEFT JOIN, matching the expression's not-started contract. */
  val eventsBurst: String = {
    val ga = Params.BurstGamma.toString
    val s0 = Params.BurstRateRatio.toString
    val ln0 = math.log(Params.BurstRateRatio).toString
    def t0(c0: String, c1: String) =
      s"LEAST($c0, $c1 + $ga) + g.lam * g.x"
    def t1(c0: String, c1: String) =
      s"LEAST($c1, $c0 + $ga) + ($s0 * g.lam * g.x - $ln0)"
    def step(c0: String, c1: String) = {
      val e0 = t0(c0, c1)
      val e1 = t1(c0, c1)
      s"""($e0) - LEAST(($e0), ($e1)) AS c0,
         |         ($e1) - LEAST(($e0), ($e1)) AS c1""".stripMargin
    }
    s"""WITH RECURSIVE e0 AS MATERIALIZED (
       |  SELECT user_id, event_id, epoch_us(ts) AS tus,
       |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events
       |), st AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       |         MAX(tus) - MIN(tus) AS span
       |  FROM e0 GROUP BY 1
       |  HAVING COUNT(*) >= 3 AND MAX(tus) - MIN(tus) > 0
       |), g AS MATERIALIZED (
       |  SELECT e0.user_id, e0.event_id, e0.rn,
       |         CAST(e0.tus - LAG(e0.tus) OVER (PARTITION BY e0.user_id ORDER BY e0.rn) AS DOUBLE) AS x,
       |         CAST(st.n - 1 AS DOUBLE) / CAST(st.span AS DOUBLE) AS lam
       |  FROM e0 JOIN st USING (user_id)
       |), r AS (
       |  SELECT g.user_id, g.rn,
       |         ${step("0.0", ga)}
       |  FROM g WHERE g.rn = 2
       |  UNION ALL
       |  SELECT g.user_id, g.rn,
       |         ${step("r.c0", "r.c1")}
       |  FROM r JOIN g ON g.user_id = r.user_id AND g.rn = r.rn + 1
       |)
       |SELECT g.user_id, g.event_id,
       |       CAST(CASE WHEN r.c1 < r.c0 THEN 1
       |                 WHEN r.c1 >= r.c0 THEN 0 END AS INT) AS burst,
       |       ${r("r.c0")} AS cost0, ${r("r.c1")} AS cost1
       |FROM g LEFT JOIN r ON r.user_id = g.user_id AND r.rn = g.rn
       |ORDER BY g.user_id, g.event_id""".stripMargin
  }

  // ---- sketches (analytics.Sketches): deterministic md5-keyed HLL / CMS ----

  /** The (bucket, rho) projection shared by both HLL oracles: 48-bit md5
    * prefix (== Spark conv(hex,16,10)), top 8 bits → bucket, rho = 41 −
    * bitlength of the low 40 bits (bin() is minimal-digits in both
    * engines — exact integer log2, no float). */
  private def hllBr(keyExpr: String, extraSel: String,
      extraName: String): String =
    s"""h AS (
       |  SELECT $extraSel,
       |         ('0x' || substring(md5(CAST($keyExpr AS VARCHAR)), 1, 12))::BIGINT AS h48
       |  FROM events
       |), br AS (
       |  SELECT $extraName, h48 >> 40 AS bucket,
       |         CASE WHEN h48 % 1099511627776 > 0
       |              THEN 41 - length(bin(h48 % 1099511627776)) ELSE 41 END AS rho
       |  FROM h
       |)""".stripMargin

  /** zint folds registers as exact BIGINTs (2^(41−rho) per present bucket,
    * 2^41 per empty one) so the single double division is order-free; the
    * small-range branch mirrors Sketches.hllEstimate verbatim. All m/α/2^w
    * constants are interpolated from graft.analytics.Sketches so raising
    * HllP regenerates a consistent oracle (Double.toString round-trips
    * bit-exactly, so the SQL literal equals the Spark-side lit()). */
  private def hllEstSql(grp: String, src: String = "regs",
      sfx: String = ""): String = {
    import graft.analytics.Sketches.{HllM, HllWBits, HllAlpha, HllSmallRange, TwoPowW1}
    s"""gz$sfx AS (
       |  SELECT $grp,
       |         CAST(SUM(CAST(1 AS BIGINT) << (${HllWBits + 1} - rho)) AS BIGINT) AS zp,
       |         CAST(COUNT(*) AS BIGINT) AS np
       |  FROM $src GROUP BY ALL
       |), ee$sfx AS (
       |  SELECT $grp, zp + ($HllM - np) * $TwoPowW1 AS zint, $HllM - np AS v
       |  FROM gz$sfx
       |), est$sfx AS (
       |  SELECT $grp,
       |         CASE WHEN (CAST('$HllAlpha' AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST($TwoPowW1 AS DOUBLE) / CAST(zint AS DOUBLE)) <= CAST($HllSmallRange AS DOUBLE) AND v > 0
       |              THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / CAST(v AS DOUBLE))
       |              ELSE CAST('$HllAlpha' AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST($TwoPowW1 AS DOUBLE) / CAST(zint AS DOUBLE) END AS hll_est
       |  FROM ee$sfx
       |)""".stripMargin
  }

  /** Mirrors Analytics.aggHll (Sketches.hllRegisters/hllEstimate). */
  val aggHll: String =
    s"""WITH ${hllBr("user_id", "event_type", "event_type")}, regs AS (
       |  SELECT event_type, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2
       |), ${hllEstSql("event_type")}, ex AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY 1
       |)
       |SELECT ex.event_type, ex.n_exact,
       |       ${r("hll_est")} AS hll_est,
       |       ${r("(hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)")} AS rel_err
       |FROM ex JOIN est USING (event_type)
       |ORDER BY event_type""".stripMargin

  /** Mirrors TextSim.corpusVocabOverlap: per-source word registers (raw
    * token stream — HLL is duplicate-insensitive), pair-wise union =
    * register max, inclusion–exclusion estimate, exact intersection from
    * distinct (source, word) pairs; pairs with no shared words zero-fill. */
  val corpusVocabOverlap: String =
    s"""WITH toks AS (
       |  SELECT source, UNNEST(string_split(text, ' ')) AS word
       |  FROM documents
       |), h AS (
       |  SELECT source,
       |         ('0x' || substring(md5(CAST(word AS VARCHAR)), 1, 12))::BIGINT AS h48
       |  FROM toks
       |), br AS (
       |  SELECT source, h48 >> 40 AS bucket,
       |         CASE WHEN h48 % 1099511627776 > 0
       |              THEN 41 - length(bin(h48 % 1099511627776)) ELSE 41 END AS rho
       |  FROM h
       |), regs AS (
       |  SELECT source, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2
       |), ${hllEstSql("source")}, ty AS (
       |  SELECT DISTINCT source FROM regs
       |), pairs AS (
       |  SELECT x.source AS src_a, y.source AS src_b
       |  FROM ty x JOIN ty y ON x.source < y.source
       |), mem AS (
       |  SELECT src_a, src_b, src_a AS source FROM pairs
       |  UNION ALL
       |  SELECT src_a, src_b, src_b AS source FROM pairs
       |), regsu AS (
       |  SELECT m.src_a, m.src_b, r.bucket, MAX(r.rho) AS rho
       |  FROM mem m JOIN regs r USING (source)
       |  GROUP BY 1, 2, 3
       |), ${hllEstSql("src_a, src_b", "regsu", "u")}, sw AS (
       |  SELECT DISTINCT source, word FROM toks
       |), ex AS (
       |  SELECT x.source AS src_a, y.source AS src_b,
       |         CAST(COUNT(*) AS BIGINT) AS n_exact_inter
       |  FROM sw x JOIN sw y
       |    ON x.word = y.word AND x.source < y.source
       |  GROUP BY 1, 2
       |)
       |SELECT p.src_a, p.src_b,
       |       COALESCE(ex.n_exact_inter, 0) AS n_exact_inter,
       |       ${r("ea.hll_est + eb.hll_est - eu.hll_est")} AS hll_inter_est,
       |       ${r("eu.hll_est")} AS hll_union_est
       |FROM pairs p
       |LEFT JOIN ex ON ex.src_a = p.src_a AND ex.src_b = p.src_b
       |JOIN est ea ON ea.source = p.src_a
       |JOIN est eb ON eb.source = p.src_b
       |JOIN estu eu ON eu.src_a = p.src_a AND eu.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin

  /** Mirrors Analytics.eventsHllSliding: daily registers re-maxed over the
    * trailing 7-day window (sketch-union = union-sketch), exact side from
    * per-day distinct (day, user) pairs. */
  val eventsHllSliding: String =
    s"""WITH ${hllBr("user_id", "CAST(ts AS DATE) AS day", "day")}, regs0 AS (
       |  SELECT day, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2
       |), days AS (
       |  SELECT DISTINCT day AS d FROM regs0
       |), regs AS (
       |  SELECT d.d AS day, r0.bucket, MAX(r0.rho) AS rho
       |  FROM days d JOIN regs0 r0 ON r0.day BETWEEN d.d - 6 AND d.d
       |  GROUP BY 1, 2
       |), ${hllEstSql("day")}, du AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
       |), ex AS (
       |  SELECT d.d AS day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_exact_7d
       |  FROM days d JOIN du ON du.day BETWEEN d.d - 6 AND d.d
       |  GROUP BY 1
       |)
       |SELECT ex.day, ex.n_exact_7d,
       |       ${r("hll_est")} AS hll_est_7d,
       |       ${r("(hll_est - CAST(n_exact_7d AS DOUBLE)) / CAST(n_exact_7d AS DOUBLE)")} AS rel_err
       |FROM ex JOIN est USING (day)
       |ORDER BY day""".stripMargin

  /** Mirrors Analytics.aggCmsTopk (Sketches.cmsSketch): 4×64 salted-md5
    * Count-Min counters, point-query = min over the 4 rows, top-k by
    * (estimate DESC, user_id) against exact counts. All-integer. */
  val aggCmsTopk: String =
    s"""WITH e4 AS (
       |  SELECT t.i,
       |         ('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 64 AS b
       |  FROM events CROSS JOIN range(0, 4) t(i)
       |), sketch AS (
       |  SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM e4 GROUP BY 1, 2
       |), users AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM events GROUP BY 1
       |), cand AS (
       |  SELECT u.user_id, u.n_exact, MIN(s.c) AS cms_est
       |  FROM users u CROSS JOIN range(0, 4) t(i)
       |  JOIN sketch s ON s.i = t.i
       |   AND s.b = ('0x' || substring(md5(CAST(t.i AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)), 1, 12))::BIGINT % 64
       |  GROUP BY 1, 2
       |)
       |SELECT user_id, n_exact, cms_est, cms_est - n_exact AS overcount
       |FROM cand ORDER BY cms_est DESC, user_id LIMIT 20""".stripMargin
}
