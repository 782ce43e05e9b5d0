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
}
