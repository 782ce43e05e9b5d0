package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-sectional (per-time-bucket, across-symbols) ranking — the
  * momentum-ranking / factor-bucketing pass a quant pipeline runs after
  * per-symbol feature extraction: at each time bucket, rank every symbol's
  * return against its peers, assign quantile buckets, and z-score against
  * the bucket's mean/std (reference's per-symbol driver loop has no
  * cross-symbol view at all — src/main.py:62-87 processes symbols
  * independently; this is the canonical operation that REQUIRES the
  * all-symbols-in-one-frame design SURVEY §1.5 chose).
  *
  * Scale shape: ONE hash exchange on `bucket` carries every cross-sectional
  * spec (count, ranked row_number/ntile, the symbol-ordered running sums and
  * their full-frame last). Per-bucket groups are symbol-count sized — at
  * 100 TB there are billions of buckets of ~constant width, the ideal hash
  * partitioning (skew structurally impossible). The per-symbol return lag is
  * the standard symbol exchange upstream. No broadcast, no driver state.
  *
  * Bit-portability: the bucket mean/std fold accumulates over SYMBOL-ORDERED
  * running sums (Spark's window Sum is strictly sequential; the oracle
  * restores the same fold with `list_sum(list(x) OVER ...)`, see
  * OracleSql.cumSum), and rank/ntile orderings carry the unique
  * (ret DESC, symbol) key, so every double and every tie-break replays
  * exactly in DuckDB.
  */
object CrossSection {

  /** Cross-sectional stats over one-row-per-(symbol, bucket) closes.
    *
    * Input: `symbol`, `bucket` (any orderable bucket key), `close`.
    * Output: per (symbol, bucket) with a prior bucket — the 1-bucket return
    * `ret`, cross-section size `xsec_n`, best-first `xsec_rank`,
    * `xsec_quintile` (ntile of `quantiles`), percentile `xsec_pct` in [0,1]
    * (0 = best, null for singleton cross-sections) and `xsec_z` (population
    * z-score, null when the cross-section variance is 0).
    */
  def xsecRank(hourly: DataFrame, quantiles: Int = 5): DataFrame = {
    val wSym = Window.partitionBy("symbol").orderBy("bucket")
    val prev = lag(col("close"), 1).over(wSym)
    val rets = hourly
      .select(col("symbol"), col("bucket"),
        try_divide(col("close") - prev, prev).as("ret"))
      .filter(col("ret").isNotNull)

    val byBucket = Window.partitionBy("bucket")
    val wRank = byBucket.orderBy(col("ret").desc, col("symbol"))
    val wCum = byBucket.orderBy("symbol")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = byBucket.orderBy("symbol")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val n = col("xsec_n").cast("double")
    val mean = col("_s") / n
    val variance = col("_q") / n - mean * mean
    rets
      .withColumn("xsec_n", count(lit(1)).over(wAll))
      .withColumn("xsec_rank", row_number().over(wRank))
      .withColumn("xsec_quintile", ntile(quantiles).over(wRank))
      .withColumn("_cs", sum(col("ret")).over(wCum))
      .withColumn("_cq", sum(col("ret") * col("ret")).over(wCum))
      .withColumn("_s", last(col("_cs")).over(wAll))
      .withColumn("_q", last(col("_cq")).over(wAll))
      .select(col("symbol"), col("bucket"), col("ret"),
        col("xsec_n"), col("xsec_rank"), col("xsec_quintile"),
        when(col("xsec_n") > 1,
          (col("xsec_rank") - 1).cast("double") / (col("xsec_n") - 1).cast("double"))
          .as("xsec_pct"),
        when(variance > 0.0, (col("ret") - mean) / sqrt(variance))
          .as("xsec_z"))
  }
}
