package graft

/** Engine defaults, mirroring the reference's config
  * (reference: src/config.py:41-56). Kept in one place so the Spark queries
  * and the DuckDB oracle SQL builders interpolate identical constants.
  */
object Params {
  val MomentumPeriods: Seq[Int] = Seq(5, 10, 20, 50)
  val VolatilityWindows: Seq[Int] = Seq(10, 20, 60)
  val RsiPeriod = 14
  val MacdFast = 12
  val MacdSlow = 26
  val MacdSignal = 9
  val BbPeriod = 20
  val BbStd = 2.0
  val PredictionHorizon = 1
  val TestSize = 0.2

  /** Reference divides with a literal epsilon, not nullif
    * (src/features/engineering.py:96,105,114). Replicated verbatim. */
  val Eps = "1e-10"
  /** Truncated pi, verbatim from the reference (engineering.py:186-193). */
  val Pi = "3.14159"

  /** Synthetic symbol count for the events→bars adapter (FIXTURES.md §4
    * allows any small K; 32 matches the local core count so the per-symbol
    * window stages saturate all cores instead of 8). Used identically by the
    * Spark queries and the oracle SQL builders. */
  val Symbols = 32

  /** CUSUM drift allowance / alarm threshold over 1-bar close DIFFERENCES
    * (`window_cusum`) — diffs are mean-≈0 on the synthetic series (σ≈70),
    * unlike returns, whose Jensen-positive mean saturates the upper side.
    * Classic tuning: k = σ/2 absorbs in-control noise, h = 5σ raises the
    * alarm. Shared verbatim with the oracle's recursive replay. */
  val CusumDrift = 35.0
  val CusumThreshold = 350.0

  /** Holt linear-trend smoothing weights (`window_holt`): α smooths the
    * level, β the trend — textbook mid-range defaults. Shared verbatim
    * with the oracle's recursive replay. */
  val HoltAlpha = 0.3
  val HoltBeta = 0.1

  /** Kleinberg 2-state burst detection (`events_burst`): the burst state
    * emits at `ratio`× the user's baseline rate; switching into it costs
    * `gamma` (Kleinberg 2002's s and γ with n=2 states). */
  val BurstRateRatio = 4.0
  val BurstGamma = 1.0

  /** Kaufman Adaptive MA (`window_kama`): efficiency-ratio window and the
    * classic fast/slow EMA spans (10/2/30). */
  val KamaWindow = 10
  val KamaFast = 2
  val KamaSlow = 30

  /** Chande Momentum Oscillator window (`feat_chande`). */
  val ChandeWindow = 14

  /** Detrended Price Oscillator window (`feat_dpo`); displacement is the
    * classic n/2 + 1. */
  val DpoWindow = 20

  /** Elder Ray EMA span (`feat_elder_ray`) — Elder's classic 13-bar EMA. */
  val ElderSpan = 13

  /** Supertrend (`feat_supertrend`): ATR window and band multiplier —
    * the conventional 14/3 pairing. Shared verbatim with the oracle's
    * recursive replay. */
  val SupertrendAtr = 14
  val SupertrendMult = 3.0

  /** Parabolic SAR (`feat_psar`): Wilder's classic 0.02 / 0.02 / 0.2
    * acceleration schedule. Shared verbatim with the oracle's replay. */
  val PsarAf0 = 0.02
  val PsarInc = 0.02
  val PsarAfMax = 0.2

  /** Dollar bars (`bars_dollar`): cumulative close·volume per bucket —
    * ~15 bars per symbol at sf0.01 magnitudes. */
  val DollarBarSize = 5.0e6

  /** Tick-imbalance bars (`bars_imbalance`): the signed-tick accumulation
    * threshold that closes a bar. */
  val ImbalanceThreshold = 20.0

  /** Purged CV (`cv_purged`): fold count and the embargo width as a
    * fraction of the row count (López de Prado's purged K-fold). */
  val PurgedFolds = 5
  val EmbargoFrac = 50 // n div EmbargoFrac rows of embargo on each side

  /** The events table's closed event-type vocabulary (TESTDATA.md) — the
    * explicit value list for pivot/unpivot on BOTH the Spark and oracle
    * sides, so the four uses cannot drift apart. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
}
