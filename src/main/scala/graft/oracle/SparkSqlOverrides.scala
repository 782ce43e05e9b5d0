package graft.oracle

import graft.Params
import graft.features.Market

/** Hand-written Spark-dialect SQL statements for queries whose DuckDB
  * oracle uses constructs Spark cannot run (recursive-CTE replays of
  * window recurrences, list slicing, in-aggregate ORDER BY). Each entry
  * must reproduce the registered DataFrame plan's rows EXACTLY —
  * SqlParitySpec value-proves every one on every test run.
  *
  * The recurrence families are expressed through the engine's own SQL
  * window functions (registered by GraftExtensions: `ewma_span`, `cusum`,
  * `holt`, `kama_rec`, `linear_rec`, `cond_prod`, `psar_*`,
  * `supertrend_*`, `zigzag`, `threshold_reset`, `renko`, `burst2`) — the
  * SAME Catalyst AggregateWindowFunctions the DataFrame plans run, so SQL
  * and DataFrame agree bit-for-bit, including float association order.
  * Rounding goes through the registered `r6`/`r4` functions (the identical
  * GuardedFloorRound expression). Exact float constants computed in Scala
  * (e.g. KAMA's 2/(fast+1)) are interpolated via Double.toString, whose
  * 17-significant-digit form round-trips to the same double in the parser.
  */
object SparkSqlOverrides {

  private val W = "PARTITION BY symbol ORDER BY datetime, event_id"
  private val eps = Params.Eps

  /** The shared events→bars adapter CTE, Spark dialect (same text the
    * covered bar statements run through SparkSql.dialect — reuse it so the
    * two surfaces can never drift). */
  private val bars: String = SparkSql.dialect(OracleSql.barsCte)

  private def feat(body: String): String = s"$bars, $body"

  // ---- W5/W10: RSI — gain/loss EWMAs (adjust=false, span=RsiPeriod) ----
  private val featRsi: String = feat(
    s"""d AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), g AS (
       |  SELECT symbol, event_id, datetime,
       |         CAST(delta > 0 AS DOUBLE) * delta AS gain,
       |         CAST(delta < 0 AS DOUBLE) * (-delta) AS loss
       |  FROM d
       |), e AS (
       |  SELECT symbol, event_id,
       |         ewma_span(gain, ${Params.RsiPeriod}, false) OVER ($W) AS ag,
       |         ewma_span(loss, ${Params.RsiPeriod}, false) OVER ($W) AS al
       |  FROM g
       |)
       |SELECT symbol, event_id,
       |       r6(100 - 100 / (1 + ag / (al + $eps))) AS rsi
       |FROM e ORDER BY event_id""".stripMargin)

  // ---- W6/W11: MACD — fast/slow EMAs (adjust=true) + second-pass signal ----
  private val featMacd: String = feat(
    s"""m AS (
       |  SELECT symbol, event_id, datetime,
       |         ewma_span(close, ${Params.MacdFast}, true) OVER ($W)
       |           - ewma_span(close, ${Params.MacdSlow}, true) OVER ($W) AS macd
       |  FROM bars
       |), s AS (
       |  SELECT symbol, event_id, macd,
       |         ewma_span(macd, ${Params.MacdSignal}, true) OVER ($W) AS sig
       |  FROM m
       |)
       |SELECT symbol, event_id, r6(macd) AS macd, r6(sig) AS macd_signal,
       |       r6(macd - sig) AS macd_histogram
       |FROM s ORDER BY event_id""".stripMargin)

  // ---- Two-sided CUSUM change-point stats ----
  private val windowCusum: String = feat(
    s"""rets AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS ret
       |  FROM bars
       |), f AS (
       |  SELECT * FROM rets WHERE ret IS NOT NULL
       |), c AS (
       |  SELECT symbol, event_id,
       |         cusum(ret, ${Params.CusumDrift}) OVER ($W) AS su,
       |         cusum(-ret, ${Params.CusumDrift}) OVER ($W) AS sd
       |  FROM f
       |)
       |SELECT symbol, event_id, r6(su) AS cusum_up, r6(sd) AS cusum_down,
       |       su > ${Params.CusumThreshold} AS alarm_up,
       |       sd > ${Params.CusumThreshold} AS alarm_down
       |FROM c ORDER BY event_id""".stripMargin)

  // ---- Holt double-exponential smoothing ----
  private val windowHolt: String = feat(
    s"""h AS (
       |  SELECT symbol, event_id,
       |         holt(close, ${Params.HoltAlpha}, ${Params.HoltBeta}) OVER ($W) AS hh
       |  FROM bars
       |)
       |SELECT symbol, event_id, r6(hh.level) AS holt_level,
       |       r6(hh.trend) AS holt_trend,
       |       r6(hh.level + hh.trend) AS holt_forecast
       |FROM h ORDER BY event_id""".stripMargin)

  // ---- KAMA: efficiency ratio → per-row alpha → data-dependent recursion ----
  private val windowKama: String = {
    val n = Params.KamaWindow
    val fastSC = 2.0 / (Params.KamaFast + 1.0)
    val slowSC = 2.0 / (Params.KamaSlow + 1.0)
    feat(
      s"""a AS (
         |  SELECT symbol, event_id, datetime, close,
         |         abs(close - LAG(close, 1) OVER ($W)) AS absd
         |  FROM bars
         |), b AS (
         |  SELECT symbol, event_id, datetime, close,
         |         SUM(absd) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         COUNT(absd) OVER ($W ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS cnt,
         |         abs(close - LAG(close, $n) OVER ($W)) AS change
         |  FROM a
         |), c AS (
         |  SELECT symbol, event_id, datetime, close, cnt, change,
         |         cum - COALESCE(LAG(cum, $n) OVER ($W), 0.0) AS vol
         |  FROM b
         |), d AS (
         |  SELECT symbol, event_id, datetime, close,
         |         CASE WHEN cnt = $n THEN
         |           CASE WHEN vol > 0 THEN change / vol ELSE 0.0 END END AS er
         |  FROM c
         |), e AS (
         |  SELECT symbol, event_id, datetime, close, er,
         |         (er * ${fastSC - slowSC} + $slowSC)
         |           * (er * ${fastSC - slowSC} + $slowSC) AS kama_alpha
         |  FROM d
         |), f AS (
         |  SELECT symbol, event_id, er, kama_alpha,
         |         kama_rec(close, kama_alpha) OVER ($W) AS kama
         |  FROM e
         |)
         |SELECT symbol, event_id, r6(er) AS er, r6(kama_alpha) AS kama_alpha,
         |       r6(kama) AS kama
         |FROM f ORDER BY event_id""".stripMargin)
  }

  // ---- EWM mean/std via ewm_var = ewma(x²) − ewma(x)² ----
  private val windowEwmVol: String = feat(
    s"""b AS (
       |  SELECT symbol, event_id, datetime, close, close * close AS c2
       |  FROM bars
       |), e AS (
       |  SELECT symbol, event_id,
       |         ewma_span(close, 20, false) OVER ($W) AS e1,
       |         ewma_span(c2, 20, false) OVER ($W) AS e2
       |  FROM b
       |)
       |SELECT symbol, event_id, r6(e1) AS ewm_mean,
       |       r6(sqrt(greatest(e2 - e1 * e1, 0.0D))) AS ewm_std
       |FROM e ORDER BY event_id""".stripMargin)

  // ---- Wilder ADX: ±DM / TR smoothing (alpha = 1/n), two EWMA stages ----
  private val featAdx: String = {
    val a = 1.0 / Market.AdxWindow
    feat(
      s"""d AS (
         |  SELECT symbol, event_id, datetime, high, low, close,
         |         LAG(high, 1) OVER ($W) AS ph,
         |         LAG(low, 1) OVER ($W) AS pl,
         |         LAG(close, 1) OVER ($W) AS pc
         |  FROM bars
         |), s1 AS (
         |  SELECT symbol, event_id, datetime,
         |         CASE WHEN (high - ph) > (pl - low) AND (high - ph) > 0
         |              THEN high - ph
         |              ELSE CASE WHEN ph IS NOT NULL THEN 0.0 END END AS pdm,
         |         CASE WHEN (pl - low) > (high - ph) AND (pl - low) > 0
         |              THEN pl - low
         |              ELSE CASE WHEN pl IS NOT NULL THEN 0.0 END END AS mdm,
         |         CASE WHEN pc IS NOT NULL THEN
         |           greatest(high - low, abs(high - pc), abs(low - pc)) END AS trw
         |  FROM d
         |), s2 AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma(pdm, $a, false) OVER ($W) AS spdm,
         |         ewma(mdm, $a, false) OVER ($W) AS smdm,
         |         ewma(trw, $a, false) OVER ($W) AS str
         |  FROM s1
         |), s3 AS (
         |  SELECT symbol, event_id, datetime,
         |         CASE WHEN str > 0.0 THEN 100.0 * spdm / str END AS plus_di,
         |         CASE WHEN str > 0.0 THEN 100.0 * smdm / str END AS minus_di
         |  FROM s2
         |), s4 AS (
         |  SELECT symbol, event_id, datetime, plus_di, minus_di,
         |         CASE WHEN plus_di + minus_di > 0.0 THEN
         |           100.0 * abs(plus_di - minus_di) / (plus_di + minus_di)
         |         END AS dx
         |  FROM s3
         |), s5 AS (
         |  SELECT symbol, event_id, plus_di, minus_di,
         |         ewma(dx, $a, false) OVER ($W) AS adx
         |  FROM s4
         |)
         |SELECT symbol, event_id, r6(plus_di) AS plus_di,
         |       r6(minus_di) AS minus_di, r6(adx) AS adx
         |FROM s5 ORDER BY event_id""".stripMargin)
  }

  // ---- TRIX: triple-EMA rate of change ----
  private val featTrix: String = {
    val n = Market.TrixSpan
    feat(
      s"""s1 AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma_span(close, $n, true) OVER ($W) AS e1
         |  FROM bars
         |), s2 AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma_span(e1, $n, true) OVER ($W) AS e2
         |  FROM s1
         |), s3 AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma_span(e2, $n, true) OVER ($W) AS e3
         |  FROM s2
         |), s4 AS (
         |  SELECT symbol, event_id, e3, LAG(e3, 1) OVER ($W) AS pe3
         |  FROM s3
         |)
         |SELECT symbol, event_id,
         |       r6(CASE WHEN pe3 IS NOT NULL AND NOT (pe3 = 0.0)
         |               THEN (e3 - pe3) / pe3 * 100.0 END) AS trix
         |FROM s4 ORDER BY event_id""".stripMargin)
  }

  // ---- TSI: double-EMA momentum ratio ----
  private val featTsi: String = feat(
    s"""m AS (
       |  SELECT symbol, event_id, datetime,
       |         close - LAG(close, 1) OVER ($W) AS mom
       |  FROM bars
       |), s1 AS (
       |  SELECT symbol, event_id, datetime, mom, abs(mom) AS amom
       |  FROM m
       |), s2 AS (
       |  SELECT symbol, event_id, datetime,
       |         ewma_span(mom, ${Market.TsiLong}, true) OVER ($W) AS e1,
       |         ewma_span(amom, ${Market.TsiLong}, true) OVER ($W) AS ae1
       |  FROM s1
       |), s3 AS (
       |  SELECT symbol, event_id,
       |         ewma_span(e1, ${Market.TsiShort}, true) OVER ($W) AS e2,
       |         ewma_span(ae1, ${Market.TsiShort}, true) OVER ($W) AS ae2
       |  FROM s2
       |)
       |SELECT symbol, event_id,
       |       r6(CASE WHEN ae2 IS NOT NULL AND NOT (ae2 = 0.0)
       |               THEN e2 / ae2 * 100.0 END) AS tsi
       |FROM s3 ORDER BY event_id""".stripMargin)

  // ---- PPO / PVO: normalized MACD on price / volume ----
  private def ppoLike(src: String, name: String): String = feat(
    s"""s1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ewma_span($src, ${Market.PpoFast}, true) OVER ($W) AS ef,
       |         ewma_span($src, ${Market.PpoSlow}, true) OVER ($W) AS es
       |  FROM bars
       |), s2 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN NOT (es = 0.0) THEN (ef - es) / es * 100.0 END AS osc
       |  FROM s1
       |), s3 AS (
       |  SELECT symbol, event_id, osc,
       |         ewma_span(osc, ${Market.PpoSignal}, true) OVER ($W) AS sig
       |  FROM s2
       |)
       |SELECT symbol, event_id, r6(osc) AS $name, r6(sig) AS ${name}_signal,
       |       r6(osc - sig) AS ${name}_hist
       |FROM s3 ORDER BY event_id""".stripMargin)

  private val featPpo: String = ppoLike("close", "ppo")
  private val featPvo: String = ppoLike("volume", "pvo")

  // ---- Klinger Volume Oscillator ----
  private val featKlinger: String = feat(
    s"""h AS (
       |  SELECT symbol, event_id, datetime, volume,
       |         (high + low + close) / 3.0 AS hlc3
       |  FROM bars
       |), v AS (
       |  SELECT symbol, event_id, datetime,
       |         volume * sign(hlc3 - LAG(hlc3, 1) OVER ($W)) AS vf
       |  FROM h
       |), k AS (
       |  SELECT symbol, event_id, datetime,
       |         ewma_span(vf, ${Market.KlingerFast}, true) OVER ($W)
       |           - ewma_span(vf, ${Market.KlingerSlow}, true) OVER ($W) AS kvo
       |  FROM v
       |), s AS (
       |  SELECT symbol, event_id, kvo,
       |         ewma_span(kvo, ${Market.KlingerSignal}, true) OVER ($W) AS sig
       |  FROM k
       |)
       |SELECT symbol, event_id, r6(kvo) AS kvo, r6(sig) AS klinger_signal
       |FROM s ORDER BY event_id""".stripMargin)

  // ---- Mass Index: EMA₉(range)/EMA₉(EMA₉(range)) rolled 25 ----
  private val featMassIndex: String = feat(
    s"""g AS (
       |  SELECT symbol, event_id, datetime, high - low AS rng
       |  FROM bars
       |), s1 AS (
       |  SELECT symbol, event_id, datetime,
       |         ewma_span(rng, ${Market.MassSpan}, true) OVER ($W) AS e1
       |  FROM g
       |), s2 AS (
       |  SELECT symbol, event_id, datetime, e1,
       |         ewma_span(e1, ${Market.MassSpan}, true) OVER ($W) AS e2
       |  FROM s1
       |), s3 AS (
       |  SELECT symbol, event_id, datetime,
       |         CASE WHEN NOT (e2 = 0.0) THEN e1 / e2 END AS ratio,
       |         CAST(ROW_NUMBER() OVER ($W) AS BIGINT) AS rn
       |  FROM s2
       |), s4 AS (
       |  SELECT symbol, event_id, datetime, rn,
       |         SUM(ratio) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM s3
       |)
       |SELECT symbol, event_id,
       |       r6(CASE WHEN rn >= ${Market.MassWindow} THEN
       |            cum - COALESCE(LAG(cum, ${Market.MassWindow}) OVER ($W), 0.0)
       |          END) AS mass_index
       |FROM s4 ORDER BY event_id""".stripMargin)

  // ---- StochRSI: stochastic of the house RSI + 3-bar %K SMA ----
  private val featStochRsi: String = {
    val n = Market.StochRsiWindow
    feat(
      s"""d AS (
         |  SELECT symbol, event_id, datetime,
         |         close - LAG(close, 1) OVER ($W) AS d1
         |  FROM bars
         |), e AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma_span(CAST(d1 > 0 AS DOUBLE) * d1,
         |                   ${Params.RsiPeriod}, false) OVER ($W) AS g,
         |         ewma_span(CAST(d1 < 0 AS DOUBLE) * (-d1),
         |                   ${Params.RsiPeriod}, false) OVER ($W) AS l
         |  FROM d
         |), rr AS (
         |  SELECT symbol, event_id, datetime,
         |         100 - 100 / (1 + g / (l + $eps)) AS rsi
         |  FROM e
         |), f AS (
         |  SELECT symbol, event_id, datetime, rsi,
         |         MIN(rsi) OVER ($W ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS mn,
         |         MAX(rsi) OVER ($W ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS mx,
         |         COUNT(rsi) OVER ($W ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS cnt
         |  FROM rr
         |), s AS (
         |  SELECT symbol, event_id, datetime,
         |         CASE WHEN cnt = $n AND mx > mn
         |              THEN (rsi - mn) / (mx - mn) * 100.0 END AS stochrsi
         |  FROM f
         |), c AS (
         |  SELECT symbol, event_id, stochrsi,
         |         COALESCE(SUM(stochrsi) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS ck,
         |         COUNT(stochrsi) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ckn,
         |         LAG(COALESCE(SUM(stochrsi) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 3) OVER ($W) AS pck,
         |         LAG(COUNT(stochrsi) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) OVER ($W) AS pckn
         |  FROM s
         |)
         |SELECT symbol, event_id, r6(stochrsi) AS stochrsi,
         |       r6(CASE WHEN (ckn - COALESCE(pckn, 0)) = 3
         |               THEN (ck - COALESCE(pck, 0.0)) / 3.0 END) AS stochrsi_k
         |FROM c ORDER BY event_id""".stripMargin)
  }

  // ---- DEMA / TEMA lag-compensated MAs ----
  private val featDemaTema: String = {
    val n = Market.DemaSpan
    feat(
      s"""s1 AS (
         |  SELECT symbol, event_id, datetime,
         |         ewma_span(close, $n, true) OVER ($W) AS e1
         |  FROM bars
         |), s2 AS (
         |  SELECT symbol, event_id, datetime, e1,
         |         ewma_span(e1, $n, true) OVER ($W) AS e2
         |  FROM s1
         |), s3 AS (
         |  SELECT symbol, event_id, e1, e2,
         |         ewma_span(e2, $n, true) OVER ($W) AS e3
         |  FROM s2
         |)
         |SELECT symbol, event_id,
         |       r6(2.0 * e1 - e2) AS dema_$n,
         |       r6(3.0 * e1 - 3.0 * e2 + e3) AS tema_$n
         |FROM s3 ORDER BY event_id""".stripMargin)
  }

  // ---- NVI/PVI conditional running products ----
  private val featNviPvi: String = feat(
    s"""p AS (
       |  SELECT symbol, event_id, datetime, volume,
       |         LAG(close, 1) OVER ($W) AS pc,
       |         LAG(volume, 1) OVER ($W) AS pv,
       |         close
       |  FROM bars
       |), g AS (
       |  SELECT symbol, event_id, datetime, volume, pv,
       |         1.0 + CASE WHEN NOT (pc = 0.0) THEN (close - pc) / pc END AS gf
       |  FROM p
       |), v AS (
       |  SELECT symbol, event_id,
       |         cond_prod(volume < pv, gf, ${Market.VolumeIndexBase}) OVER ($W) AS nvi,
       |         cond_prod(volume > pv, gf, ${Market.VolumeIndexBase}) OVER ($W) AS pvi
       |  FROM g
       |)
       |SELECT symbol, event_id, r6(nvi) AS nvi, r6(pvi) AS pvi
       |FROM v ORDER BY event_id""".stripMargin)

  // ---- ZigZag swing legs ----
  private val featZigzag: String = feat(
    s"""z AS (
       |  SELECT symbol, event_id,
       |         zigzag(close, ${Market.ZigzagTheta}) OVER ($W) AS zz
       |  FROM bars
       |)
       |SELECT symbol, event_id, CAST(zz.dir AS INT) AS zz_dir,
       |       r6(zz.ext) AS zz_extreme, CAST(zz.flip AS INT) AS zz_reversal
       |FROM z ORDER BY event_id""".stripMargin)

  // ---- Parabolic SAR line + regime ----
  private val featPsar: String = feat(
    s"""p AS (
       |  SELECT symbol, event_id,
       |         psar_line(high, low, ${Params.PsarAf0}, ${Params.PsarInc},
       |                   ${Params.PsarAfMax}) OVER ($W) AS psar,
       |         psar_dir(high, low, ${Params.PsarAf0}, ${Params.PsarInc},
       |                  ${Params.PsarAfMax}) OVER ($W) AS pdir
       |  FROM bars
       |)
       |SELECT symbol, event_id, r6(psar) AS psar, CAST(pdir AS INT) AS psar_trend
       |FROM p ORDER BY event_id""".stripMargin)

  // ---- Supertrend trailing stop ----
  private val featSupertrend: String = {
    val n = Params.SupertrendAtr
    val m = Params.SupertrendMult
    feat(
      s"""t AS (
         |  SELECT symbol, event_id, datetime, high, low, close,
         |         LAG(close, 1) OVER ($W) AS prevc
         |  FROM bars
         |), t2 AS (
         |  SELECT symbol, event_id, datetime, high, low, close, prevc,
         |         COALESCE(greatest(high - low, abs(high - prevc),
         |                           abs(low - prevc)), high - low) AS tr
         |  FROM t
         |), c AS (
         |  SELECT symbol, event_id, datetime, high, low, close, prevc,
         |         COALESCE(SUM(tr) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS ctr,
         |         COUNT(tr) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctrn
         |  FROM t2
         |), a AS (
         |  SELECT symbol, event_id, datetime, high, low, close, prevc,
         |         CASE WHEN (ctrn - COALESCE(LAG(ctrn, $n) OVER ($W), 0)) = $n
         |              THEN (ctr - COALESCE(LAG(ctr, $n) OVER ($W), 0.0)) / $n
         |         END AS atr
         |  FROM c
         |), b AS (
         |  SELECT symbol, event_id, datetime, close, prevc,
         |         (high + low) / 2.0 + $m * atr AS ub,
         |         (high + low) / 2.0 - $m * atr AS lb
         |  FROM a
         |), s AS (
         |  SELECT symbol, event_id,
         |         supertrend_line(ub, lb, close, prevc) OVER ($W) AS st,
         |         supertrend_dir(ub, lb, close, prevc) OVER ($W) AS sd
         |  FROM b
         |)
         |SELECT symbol, event_id, r6(st) AS supertrend, CAST(sd AS INT) AS st_trend
         |FROM s ORDER BY event_id""".stripMargin)
  }

  // ---- Tick-imbalance bars: ThresholdReset numbering + OHLCV aggregate ----
  private val barsImbalance: String = feat(
    s"""t AS (
       |  SELECT symbol, event_id, datetime, close, volume,
       |         sign(close - LAG(close, 1) OVER ($W)) AS tick
       |  FROM bars
       |), n AS (
       |  SELECT symbol, event_id, close, volume, tick,
       |         threshold_reset(tick, ${Params.ImbalanceThreshold}) OVER ($W) AS bar_id
       |  FROM t
       |)
       |SELECT symbol, bar_id, COUNT(*) AS n_ticks,
       |       SUM(COALESCE(tick, 0.0)) AS imbalance,
       |       r6(min_by(close, event_id)) AS open,
       |       r6(MAX(close)) AS high,
       |       r6(MIN(close)) AS low,
       |       r6(max_by(close, event_id)) AS close,
       |       SUM(volume) AS volume
       |FROM n GROUP BY symbol, bar_id
       |ORDER BY symbol, bar_id""".stripMargin)

  // ---- ml_matrix family: the oracle text with its two DuckDB-only
  // ingredients swapped for Spark-native equivalents ----
  //
  // The oracle's 49-feature matrix statement is Spark-runnable except for
  // (a) the recursive-CTE RSI/MACD replay (techCtes) and (b) the
  // list_sum(list(x) OVER ...) sequential-fold cumsum (DuckDB's native
  // windowed SUM pairwise-combines, so the oracle avoids it — but Spark's
  // OWN windowed SUM is exactly the strict left-to-right fold, so on the
  // engine the plain SUM() OVER is the bit-identical and O(n) form).
  // Swap both and bridge the rest mechanically; SqlParitySpec value-proves
  // the result against the DataFrame plan like every other entry.

  /** Spark twin of OracleSql.techCtes: ewma_span window recursions instead
    * of the recursive-CTE replay; emits the same tech(symbol, event_id,
    * rsi, macd, macd_signal, macd_histogram) relation. */
  private val techCtesSpark: String =
    s""", tg AS (
       |  SELECT symbol, event_id, datetime, close,
       |         close - LAG(close, 1) OVER ($W) AS delta
       |  FROM bars
       |), te AS (
       |  SELECT symbol, event_id, datetime, close,
       |         ewma_span(CAST(delta > 0 AS DOUBLE) * delta,
       |                   ${Params.RsiPeriod}, false) OVER ($W) AS ag,
       |         ewma_span(CAST(delta < 0 AS DOUBLE) * (-delta),
       |                   ${Params.RsiPeriod}, false) OVER ($W) AS al,
       |         ewma_span(close, ${Params.MacdFast}, true) OVER ($W)
       |           - ewma_span(close, ${Params.MacdSlow}, true) OVER ($W) AS macd
       |  FROM tg
       |), ts AS (
       |  SELECT symbol, event_id, ag, al, macd,
       |         ewma_span(macd, ${Params.MacdSignal}, true) OVER ($W) AS sig
       |  FROM te
       |), tech AS (
       |  SELECT symbol, event_id,
       |         100 - (100 / (1 + ag / (al + $eps))) AS rsi,
       |         macd,
       |         sig AS macd_signal,
       |         macd - sig AS macd_histogram
       |  FROM ts
       |)""".stripMargin

  /** list_sum(list(x) OVER w) → SUM(x) OVER w (see block comment above). */
  private def sparkSeqSums(sql: String): String =
    raw"COALESCE\(list_sum\(list\((.+?)\) OVER \(([^()]*)\)\), 0\.0\)".r
      .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        s"COALESCE(SUM(${m.group(1)}) OVER (${m.group(2)}), 0.0)"))

  private def mlSpark(oracleText: String): String =
    SparkSql.dialect(sparkSeqSums(oracleText
      .replace("WITH RECURSIVE ", "WITH ")
      .replace(OracleSql.techCtes, techCtesSpark)))

  /** Spark twin of the ngram-Jaccard oracle. Only structural change: the
    * DuckDB `FROM x, UNNEST(range) u(d) JOIN y` mixes a lateral into the
    * join list, which Spark's parser rejects (LATERAL VIEW must follow the
    * joins) — fold the explode into a derived relation instead. The
    * guarded floor rounding runs through the registered r6. */
  private val dedupNgramJaccard: String =
    """WITH g0 AS (
      |  SELECT doc_id, substring(text, i, 4) AS g
      |  FROM (SELECT doc_id, text,
      |          explode(sequence(1, greatest(length(text) - 3, 1))) AS i
      |        FROM documents)
      |), g AS (
      |  SELECT DISTINCT doc_id, g FROM g0
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_g FROM g GROUP BY doc_id
      |), cand AS (
      |  SELECT x.doc_id AS doc_a, x.doc_id + x.d AS doc_b
      |  FROM (SELECT doc_id, explode(sequence(1, 3)) AS d FROM documents) x
      |  JOIN documents y ON y.doc_id = x.doc_id + x.d
      |), inter AS (
      |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
      |  FROM cand
      |  JOIN g a ON doc_a = a.doc_id
      |  JOIN g b ON doc_b = b.doc_id AND a.g = b.g
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |       r6(CAST(n_inter AS DOUBLE) / (za.n_g + zb.n_g - n_inter)) AS jaccard
      |FROM inter
      |JOIN sizes za ON za.doc_id = doc_a
      |JOIN sizes zb ON zb.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Registry-keyed override map consumed by [[SparkSql.overrides]]. */
  val all: Map[String, String] = Map(
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "ml_matrix" -> mlSpark(OracleSql.mlMatrix),
    "feat_importance_corr" -> mlSpark(OracleSql.featImportanceCorr),
    "ml_feature_bins" -> mlSpark(OracleSql.mlFeatureBins),
    "feat_rsi" -> featRsi,
    "feat_macd" -> featMacd,
    "window_cusum" -> windowCusum,
    "window_holt" -> windowHolt,
    "window_kama" -> windowKama,
    "window_ewm_vol" -> windowEwmVol,
    "feat_adx" -> featAdx,
    "feat_trix" -> featTrix,
    "feat_tsi" -> featTsi,
    "feat_ppo" -> featPpo,
    "feat_pvo" -> featPvo,
    "feat_klinger" -> featKlinger,
    "feat_mass_index" -> featMassIndex,
    "feat_stoch_rsi" -> featStochRsi,
    "feat_dema_tema" -> featDemaTema,
    "feat_nvi_pvi" -> featNviPvi,
    "feat_zigzag" -> featZigzag,
    "feat_psar" -> featPsar,
    "feat_supertrend" -> featSupertrend,
    "bars_imbalance" -> barsImbalance)
}
