package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators key the sampling decision on a HASH of a stable row key —
  * never on `rand()` or physical row position — so a sample is reproducible
  * across runs, partitionings, and engines (md5 is the same everywhere,
  * which is also what makes the DuckDB oracle able to replay it). That
  * reproducibility is what a 100 TB pipeline needs: re-running a stage after
  * a failure must select the same rows.
  */
object Sampling {

  /** Hash-Bernoulli sample: keep rows whose md5(key) hex prefix sorts below
    * `hexPrefixLt` — e.g. "2" keeps 2/16 ≈ 12.5%, "0a" keeps 10/256.
    * Narrow (no shuffle, no state): each row decides for itself, so the
    * filter composes with pushdown and scales linearly. */
  def bernoulliByHash(df: DataFrame, key: Column, hexPrefixLt: String): DataFrame =
    df.filter(substring(md5(key.cast("string")), 1, hexPrefixLt.length) < lit(hexPrefixLt))

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES,
    * Inf. Proc. Letters 2006): the k rows with the LARGEST ln(u)/w, where
    * u is a 48-bit md5-derived uniform in (0,1) and w the row's positive
    * weight — equivalent to k sequential weighted draws, but embarrassingly
    * parallel: the whole draw plans as ONE TakeOrderedAndProject
    * (per-partition partial top-k, driver merges k·P candidate rows),
    * no shuffle of the data, deterministic across runs/partitionings.
    * 2^48 divides exactly, so u is the same double in every engine; the
    * only cross-engine fp surface is one ln() call.
    *
    * Non-positive weights are filtered out up front — they are outside the
    * A-ES contract and would otherwise corrupt the draw silently and
    * engine-dependently: w=0 gives ln(u)/0 = −Inf in Spark but NULL in
    * DuckDB's division (divergent ordering), and w<0 flips ln(u)/w positive
    * so the row always wins. The oracle applies the same `weight > 0`
    * predicate, so both engines agree independent of the data contract. */
  def weightedByHash(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(281474976710656.0) // 2^48
    df.filter(weight > lit(0.0))
      .withColumn("_wk", log(u) / weight)
      .orderBy(col("_wk").desc, key)
      .limit(k)
      .drop("_wk")
  }

  /** Stratified exact-quota sample: per stratum, the `quota` rows with the
    * smallest md5(key) — a deterministic uniform draw without replacement.
    * One shuffle on the stratum key; rank ties broken by the key itself.
    * At scale, pre-filter with [[bernoulliByHash]] at a few times the
    * target rate so the per-stratum sort sees a sliver of the data. */
  def stratifiedByHash(df: DataFrame, stratum: Column, key: Column,
      quota: Int, rnCol: String = "strat_rn"): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn(rnCol, row_number().over(w).cast("long"))
      .filter(col(rnCol) <= quota)
  }

  /** Poisson(1) CDF breakpoints (k = 0..15) for the bootstrap draw:
    * e⁻¹·Σ_{i≤k} 1/i!. Computed ONCE here and injected into both engines
    * as the same double literals, so the inverse-CDF comparisons branch
    * identically everywhere — the draw is a pure function of md5. CDF(15)
    * leaves ~10⁻¹³ tail mass: a draw clamps at 16 with probability below
    * one row in 10¹² — immaterial to a resampling estimate. */
  val PoissonCdf: Seq[Double] = {
    val invE = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 to 15).map { k =>
      if (k > 0) fact *= k
      cum += invE / fact
      cum
    }
  }

  /** One-pass Poisson bootstrap (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams"): instead of materializing B
    * resamples of n rows — impossible at 100 TB — each row draws an
    * independent Poisson(1) replication count per replica (the
    * with-replacement bootstrap's n→∞ limit), so all B replica means
    * stream out of ONE pass over the data. Draws are md5-keyed
    * inverse-CDF lookups over [[PoissonCdf]]: deterministic across runs,
    * partitionings, and engines.
    *
    * Shuffle shape: the rows×B fan-out collapses map-side — the
    * (group, replica) partial aggregate combines before the exchange, so
    * the shuffle carries O(groups·B·partitions) rows, never rows×B; the
    * final order-statistic step sorts B doubles per group.
    *
    * Returns per group: row count, point mean, and the nearest-rank
    * 2.5%/97.5% bootstrap CI of the mean (the ⌈0.025B⌉-th and ⌈0.975B⌉-th
    * of the B sorted replica means). */
  def poissonBootstrap(df: DataFrame, group: Column, key: Column, x: Column,
      b: Int = 100): DataFrame = {
    require(b >= 40, s"poissonBootstrap: need b >= 40 for a 95% CI, got $b")
    require(b % 2 == 0, s"poissonBootstrap: b must be even, got $b")
    // one md5 per REPLICA PAIR: fan out to b/2 blocks, hash once per
    // block, and emit BOTH replicas from the digest's two independent
    // 48-bit halves (hex chars 1-12 and 13-24) — the hash runs before the
    // second generator, so the per-row hash count is b/2, not b. The
    // oracle slices the same digest positions.
    // Shape note (r13, A/B'd): the rows×B fan-out happens ONCE (the block
    // explode) — both replica weights are computed INLINE on the block row
    // and partial-aggregated per (grp, blk), so the pre-shuffle row count
    // is rows×B/2, not rows×B, and no 12-char digest slices or struct
    // arrays ever materialize into the aggregate's input. The per-replica
    // rows only appear AFTER aggregation, at groups×B/2 — negligible. The
    // draw scheme (md5 per block, two 48-bit halves) is unchanged, so the
    // oracle replay and every emitted value stay identical.
    // The uniforms get their OWN projection stage: the 16-breakpoint CDF
    // fold references u 16 times, and building u's conv(substring(md5…))
    // tree inline would copy it into every CASE branch (CaseWhen is
    // excluded from codegen subexpression elimination) — measured 63 s at
    // sf1 from pathological codegen once a downstream join fused the
    // stage, vs 2 s with the barrier. As multi-referenced non-cheap
    // aliases, _u1/_u2 survive CollapseProject (the window_mad precedent).
    def uOf(slice: Column): Column =
      (conv(slice, 16, 10).cast("double") + lit(0.5)) /
        lit(281474976710656.0) // 2^48
    def wOf(u: Column): Column =
      PoissonCdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)
    // Repartition the narrow 3-column projection by key BEFORE the ×B/2
    // fan-out: the explode multiplies work ~50×, so the stage must be
    // balanced across cores, not inherit the SCAN's split count — a
    // compact parquet input (2 splits at sf1) otherwise throttles the
    // whole query to 2 tasks (measured 66 s → 8 s at sf1 from this line).
    // The partition COUNT must be pinned explicitly: AQE sizes a keyless-
    // count exchange by its INPUT bytes, and this exchange's input is 50×
    // smaller than the stage it feeds, so AQE coalesced it to ONE
    // partition and serialized the whole md5 fan-out on one core
    // (measured r14: 8.4 s single-task stage = the entire query floor at
    // sf0.1). defaultParallelism — the session's core count locally, the
    // cluster's total cores on a real deployment — is the right scale-
    // adaptive size for a CPU-bound fan-out stage whose input bytes are
    // always tiny. The shuffle moves only (grp, k, x) rows; per-key
    // hashing keeps the draw deterministic.
    val blocks = df.select(group.as("grp"), key.cast("string").as("k"),
        x.cast("double").as("x"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("k"))
      .select(col("grp"), col("k"), col("x"),
        explode(expr(s"sequence(1, ${b / 2})")).as("blk"))
      .withColumn("_hex", md5(concat_ws(":", col("k"), col("blk"))))
      .select(col("grp"), col("x"), col("blk"),
        uOf(substring(col("_hex"), 1, 12)).as("_u1"),
        uOf(substring(col("_hex"), 13, 12)).as("_u2"))
      .select(col("grp"), col("x"), col("blk"),
        wOf(col("_u1")).as("_w1"), wOf(col("_u2")).as("_w2"))
    val perBlk = blocks
      .groupBy(col("grp"), col("blk"))
      .agg(sum(col("_w1") * col("x")).as("sx1"), sum(col("_w1")).as("sw1"),
        sum(col("_w2") * col("x")).as("sx2"), sum(col("_w2")).as("sw2"))
    val rep = perBlk.select(col("grp"), explode(array(
      struct((col("blk") * 2 - 1).as("rep"), col("sx1").as("sx"), col("sw1").as("sw")),
      struct((col("blk") * 2).as("rep"), col("sx2").as("sx"), col("sw2").as("sw"))))
      .as("e"))
      .select(col("grp"), col("e.sx").as("sx"), col("e.sw").as("sw"))
    val point = df.select(group.as("grp"), x.cast("double").as("x"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), avg(col("x")).as("mean"))
    // All-zero-weight replica (P ≈ e^-n per replica — real for small
    // groups): its mean is 0/0 = NaN, which sorts ABOVE every real mean
    // and would surface as ci_hi. Deterministic rule, mirrored in the
    // oracle: an empty resample reports the group's point mean.
    val means = rep
      .join(point.select(col("grp"), col("mean").as("_pm")), Seq("grp"))
      .select(col("grp"),
        when(col("sw") === 0L, col("_pm"))
          .otherwise(col("sx") / col("sw").cast("double")).as("m"))
    val lo = math.ceil(0.025 * b).toInt
    val hi = math.ceil(0.975 * b).toInt
    val ci = means.groupBy("grp")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("grp"), element_at(col("ms"), lo).as("ci_lo"),
        element_at(col("ms"), hi).as("ci_hi"))
    point.join(ci, Seq("grp"))
  }
}
