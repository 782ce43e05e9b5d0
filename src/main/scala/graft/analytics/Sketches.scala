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

  // ---- Mergeable rank/quantile sketch (HDR-style log2 histogram) ----
  //
  // The rank companion to HLL (cardinality) and CMS (frequency): values
  // quantize to integer µ-units (the house floor(x·1e6 + 0.5) recipe),
  // µ-units map to a DETERMINISTIC bucket id — exact below 2^(S+1), then
  // 2^S sub-buckets per octave (relative bucket width ≤ 2^−S) — and the
  // sketch is just the (bucket → count) table. Merging sketches is integer
  // addition (order-free, partition-invariant, union-of-sketches IS the
  // sketch-of-the-union, exactly), a quantile estimate is the lower bound
  // of the first bucket whose cumulative count reaches ceil(q·N), and
  // every step is exact integer arithmetic both engines replay verbatim
  // (bitlength via length(bin(u)); variable shifts as exact
  // multiply/divide by 2^e, which is exponent arithmetic in doubles).
  // State per group is ≤ 64 + 32·octaves counters regardless of data
  // volume — the bounded-state at-scale contract. Non-negative inputs
  // (bucket 0 holds exact zeros); a signed variant would mirror the
  // bucket space below 0.

  /** Sub-bucket bits S: 32 sub-buckets per octave, relative error ≤ 1/32. */
  val QsketchSubBits = 5
  private val QsketchExact = 1L << (QsketchSubBits + 1) // 64: exact below this

  /** Value → integer µ-units (exact for the corpus's ≤ 2-decimal values;
    * the 0.5 offset makes the floor a round-half-up). */
  def qsketchMicros(value: Column): Column =
    floor(value * lit(1000000.0) + lit(0.5)).cast("long")

  /** µ-units → bucket id. u < 64 → u (width-1 buckets); else octave e =
    * bitlength(u) − 6 ≥ 1 and the top 6 bits pick the sub-bucket:
    * id = 64 + (e−1)·32 + ((u >> e) − 32). Monotone in u, so bucket order
    * IS value order and rank scans read the table in id order. */
  def qsketchBucket(u: Column): Column = {
    val bl = length(bin(u)).cast("long")
    val e = bl - lit(QsketchSubBits + 1).cast("long")
    // u >> e as exact double math: dividing by 2^e only shifts the
    // exponent (u < 2^53), so floor(u / 2^e) is the exact integer shift
    val top = floor(u.cast("double") / pow(lit(2.0), e.cast("double"))).cast("long")
    // loud domain guard: past 2^53 µ-units (~9e9 in value units) the
    // double shift above could round across a sub-bucket boundary where
    // the oracle's exact integer `>>` does not — a silent cross-engine
    // bucket divergence; negative values would produce garbage buckets on
    // both engines. Neither belongs in the sketch: fail the row here,
    // loudly, instead of as a far-away Verify hash mismatch.
    when(u < lit(0L) || u >= lit(1L << 53),
        raise_error(concat(
          lit("qsketchBucket: micro-units outside [0, 2^53): "),
          u.cast("string"))).cast("long"))
      .when(u < lit(QsketchExact), u)
      .otherwise(lit(QsketchExact) + (e - 1L) * lit(1L << QsketchSubBits) +
        (top - lit(1L << QsketchSubBits)))
  }

  /** Bucket id → lower bound in µ-units (the quantile estimate, a certain
    * LOWER bound of the true order statistic: the rank-r element lives in
    * the crossing bucket because the id mapping is monotone). */
  def qsketchLow(id: Column): Column = {
    val off = id - lit(QsketchExact)
    val e = (off / lit(1L << QsketchSubBits)).cast("long") + 1L
    val sub = off % lit(1L << QsketchSubBits)
    when(id < lit(QsketchExact), id)
      .otherwise(((sub + lit(1L << QsketchSubBits)).cast("double") *
        pow(lit(2.0), e.cast("double"))).cast("long"))
  }

  /** The sketch: per-(group, bucket) counts. One narrow pass with map-side
    * partials; the shuffle carries ≤ buckets rows per group per partition. */
  def qsketchCounts(df: DataFrame, value: Column, groupCols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ qsketchBucket(qsketchMicros(value)).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a (possibly merged) sketch table: for each q,
    * the lower bound of the first bucket whose running count reaches
    * ceil(q·N) (≥ 1). Integer window sum — exact under any association. */
  def qsketchQuantiles(counts: DataFrame, groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("bucket")
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val targets = explode(lit(qs.toArray)).as("q")
    cum.select(groupCols.map(col) :+ col("bucket") :+ col("cum") :+ col("n") :+ targets: _*)
      .filter(col("cum") >= greatest(lit(1L),
        ceil(col("q") * col("n").cast("double")).cast("long")))
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n_events"))
      .select(groupCols.map(col) :+ col("q") :+ col("n_events") :+
        (qsketchLow(col("bucket")).cast("double") / lit(1000000.0)).as("est"): _*)
  }
}
