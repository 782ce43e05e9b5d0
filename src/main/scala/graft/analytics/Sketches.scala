package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches — the mergeable-summary algebra that makes
  * cardinality and frequency questions answerable at 100 TB without a
  * distinct-shuffle of the corpus.
  *
  * Everything here is DETERMINISTIC and oracle-replayable: hashes are md5
  * prefixes (`conv(hex, 16, 10)` == DuckDB `('0x' || hex)::BIGINT`), rank
  * computations are exact integer ops (`length(bin(w))` is floor(log2)+1 in
  * both engines — no float log), and register sums fold as BIGINTs, so the
  * one double division at the end is bit-identical regardless of partition
  * or merge order.
  *
  *  - [[hllRegisters]]/[[hllEstimate]]: HyperLogLog (Flajolet et al. 2007)
  *    with p = 8 (m = 256 registers) over a 48-bit uniform hash. The
  *    register table is the ONLY thing shuffled — max(rho) partial-aggs
  *    map-side, so a 100 TB scan ships ≤ 256 rows per group per partition.
  *    Registers are MERGEABLE (max is associative): daily registers union
  *    into weekly/monthly distinct counts without touching the raw data
  *    again, which is the whole point at scale ([[graft.queries]]
  *    `events_hll_sliding`).
  *  - [[cmsSketch]]/`agg_cms_topk`: Count-Min (Cormode & Muthukrishnan
  *    2005) with depth 4 × width 64, salted md5 row hashes. The sketch is
  *    d·w = 256 counters — broadcastable state that answers frequency
  *    point-queries with one-sided (over-)error ≤ εN; the registered query
  *    reports the top-k estimates against exact counts so the error is
  *    measured, not asserted.
  */
object Sketches {

  /** HLL precision: p = 8 → m = 256 registers, one 48-bit md5-prefix hash
    * split as (top 8 bits → bucket, low 40 bits → rank field). Standard
    * error 1.04/√m ≈ 6.5% — chosen small so the register table stays
    * readable in tests; at 100 TB you would raise p, not change shape. */
  val HllP = 8
  val HllM = 256
  val HllWBits = 40
  val TwoPowW = 1099511627776L // 2^40
  val TwoPowW1 = 2199023255552L // 2^41: the "empty register" weight
  /** α_m bias correction (Flajolet et al. §4, m ≥ 128 branch) and the
    * small-range linear-counting threshold — derived from HllM so raising
    * HllP keeps the whole formula (and the generated oracle SQL, which
    * interpolates the same constants) consistent. */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM.toDouble)
  val HllSmallRange: Double = 2.5 * HllM

  /** 48-bit uniform hash of a key — md5 hex prefix, the house
    * engine-portable construction. */
  def hash48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** (bucket, rho) for one observation: bucket = top p bits, rho = leading
    * zeros in the low 40 bits + 1 (= 41 − bitlength, exact via bin()). */
  def hllBucket(key: Column): Column = shiftright(hash48(key), HllWBits)

  def hllRho(key: Column): Column = {
    val w = hash48(key) % lit(TwoPowW)
    when(w > 0, lit(HllWBits + 1) - length(bin(w)))
      .otherwise(lit(HllWBits + 1)).cast("int")
  }

  /** Register table: max(rho) per (groupCols..., bucket). Partial-aggregates
    * map-side — the shuffle carries ≤ m rows per group per input partition,
    * never data volume. */
  def hllRegisters(df: DataFrame, key: Column, groupCols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ hllBucket(key).as("bucket") :+
        hllRho(key).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Estimate from a register table: the harmonic-mean formula with the
    * small-range linear-counting correction (E ≤ 2.5m and empty registers
    * present → m·ln(m/V)).
    *
    * The register sum Σ 2^−Mⱼ folds EXACTLY: each term is scaled to the
    * integer 2^(41−Mⱼ) (Mⱼ ≤ 41, so every term and the 256-term total fit a
    * BIGINT), absent registers contribute 2^41 each — integer addition is
    * order-free, so the one double division below is partition-invariant
    * and bit-equal to the oracle's replay. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val zp = sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllWBits + 1} - rho)"))
    val present = count(lit(1))
    val g = regs.groupBy(groupCols.map(col): _*)
      .agg(zp.as("_zp"), present.as("_np"))
    val zint = col("_zp") + (lit(HllM.toLong) - col("_np")) * lit(TwoPowW1)
    val v = lit(HllM.toLong) - col("_np")
    val eraw = lit(HllAlpha) * lit(HllM.toDouble) * lit(HllM.toDouble) *
      lit(TwoPowW1.toDouble) / zint.cast("double")
    val est = when(eraw <= lit(HllSmallRange) && v > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / v.cast("double")))
      .otherwise(eraw)
    g.select(groupCols.map(col) :+ est.as("hll_est"): _*)
  }

  /** Count-Min depth (independent salted hash rows) and width (counters per
    * row). ε = e/w ≈ 4.2%·N per point query at w = 64; tiny on purpose so
    * the test corpus actually exercises collisions (overcount > 0 rows). */
  val CmsDepth = 4
  val CmsWidth = 64

  /** Salted row hash: md5("i:key") % width. */
  def cmsBucket(row: Column, key: Column): Column =
    conv(substring(md5(concat_ws(":", row, key.cast("string"))), 1, 12),
      16, 10).cast("long") % lit(CmsWidth.toLong)

  /** The d×w counter table: one narrow pass, the explode is over a
    * 4-element literal array and the count partial-aggregates to ≤ d·w rows
    * per partition before the shuffle. */
  def cmsSketch(df: DataFrame, key: Column): DataFrame =
    df.select(key.as("_k"))
      .select(col("_k"), explode(lit((0 until CmsDepth).toArray)).as("i"))
      .select(col("i"), cmsBucket(col("i"), col("_k")).as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))
}
