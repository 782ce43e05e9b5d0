package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.source.Checkpoint.PinOps

/** Exact global ordering without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` forces every row through ONE task
  * (Spark warns "No Partition Defined for Window operation") — fine at 10k
  * rows, fatal at 100 TB. This computes the identical numbering in three
  * scalable steps:
  *
  *   1. bucket each row by value-range of a numeric sort key (boundaries from
  *      `approxQuantile`; the bucket is a pure function of the ROW, not of
  *      physical partitioning, so it is deterministic across runs and
  *      re-shuffles);
  *   2. count rows per bucket (tiny aggregate) and turn the counts into
  *      per-bucket starting offsets on the driver — O(buckets) state, not
  *      O(rows);
  *   3. `row_number()` within each bucket (parallel windows) + the bucket's
  *      offset.
  *
  * The output is invariant to the boundary placement — any monotone
  * bucketing yields the same global numbering, so approxQuantile's
  * approximation error only affects balance, never values. Rows whose sort
  * key equals a boundary all land in the lower bucket (`>`-comparison), so
  * ties never straddle buckets; the tie columns then give a total order
  * inside each bucket.
  */
object Ranking {

  /** Append a 1-based global row-number column `rn` ordered by `orderCols`.
    *
    * @param sortKey   numeric (castable-to-double, NON-NULL — enforced) key
    *                  that is ORDER-MONOTONE w.r.t. `orderCols.head`:
    *                  a <= b on `orderCols.head` must imply
    *                  key(a) <= key(b) (which subsumes "equal rows share a
    *                  key"). An equality-consistent but order-inconsistent
    *                  key — a hash, a negated timestamp — would bucket rows
    *                  out of order and silently diverge from the
    *                  single-window numbering.
    * @param orderCols total ordering (ties broken by trailing columns)
    * @return (frame + `rn`, total row count — free from the bucket counts)
    */
  def withGlobalRowNumber(df: DataFrame, sortKey: Column,
      orderCols: Seq[Column], rnCol: String = "rn",
      buckets: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // materialize the input once: three consumers follow (the quantile
    // sketch, the per-bucket counts, and the final numbered output), and
    // callers often pass expensive plans (the 49-feature matrix) that must
    // not be re-executed per consumer
    val keyed = df.pinned().withColumn("_grn_key", sortKey.cast("double"))
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("_grn_key", probs, 0.001).distinct.sorted
    val bucket = boundaries
      .map(b => when(col("_grn_key") > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val bucketed = keyed.withColumn("_grn_bucket", bucket)
    // fail loudly on null keys (piggybacked on the existing counts pass):
    // approxQuantile IGNORES nulls while the `>`-fold routes them to bucket
    // 0, so a null key would otherwise yield a numbering that only works by
    // coincidence of nulls-first ordering
    val rawCounts = bucketed.groupBy("_grn_bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_grn_key").isNull, 1L).otherwise(0L)).as("n_null"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nullKeys = rawCounts.map(_._3).sum
    require(nullKeys == 0L,
      s"withGlobalRowNumber: sortKey is null on $nullKeys rows — the key " +
        "must be non-null (bucket boundaries ignore nulls)")
    val counts = rawCounts.map(r => r._1 -> r._2).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    val w = Window.partitionBy("_grn_bucket").orderBy(orderCols: _*)
    val offsetCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("_grn_bucket")), lit(0L))
    (bucketed
      .withColumn(rnCol, offsetCol + row_number().over(w).cast("long"))
      .drop("_grn_key", "_grn_bucket"), total)
  }

  /** Append a global inclusive running sum of an INTEGRAL `weight` column
    * ordered by `orderCols` — `SUM(w) OVER (ORDER BY ... ROWS UNBOUNDED
    * PRECEDING)` without the single-partition window, by the same
    * bucket-offset construction as [[withGlobalRowNumber]]: range-bucket on a
    * monotone numeric key, per-bucket weight totals → driver-side starting
    * offsets (O(buckets) state), then a parallel per-bucket running sum plus
    * the bucket's offset.
    *
    * Weights must be integral (enforced: cast to long happens here, so a
    * caller passing doubles gets truncation — pass longs): integer addition
    * is associative, so the bucketed sum is bit-identical to the
    * single-window sum under ANY bucket placement. A floating-point running
    * sum would NOT survive this regrouping (per-bucket offsets re-associate
    * the additions), which is why the signature takes token counts, byte
    * sizes, row weights — not measures.
    *
    * @param sortKey numeric, non-null, order-monotone w.r.t. `orderCols.head`
    *                (same contract as [[withGlobalRowNumber]])
    * @return frame + `cumCol` (inclusive running sum, long)
    */
  def withGlobalRunningSum(df: DataFrame, sortKey: Column,
      orderCols: Seq[Column], weight: Column, cumCol: String = "cum",
      buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df.pinned()
      .withColumn("_grs_key", sortKey.cast("double"))
      .withColumn("_grs_w", weight.cast("long"))
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("_grs_key", probs, 0.001).distinct.sorted
    val bucket = boundaries
      .map(b => when(col("_grs_key") > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val bucketed = keyed.withColumn("_grs_bucket", bucket)
    val rawSums = bucketed.groupBy("_grs_bucket")
      .agg(sum(col("_grs_w")).as("w"),
        sum(when(col("_grs_key").isNull || col("_grs_w").isNull, 1L)
          .otherwise(0L)).as("n_null"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nulls = rawSums.map(_._3).sum
    require(nulls == 0L,
      s"withGlobalRunningSum: sortKey/weight null on $nulls rows — both " +
        "must be non-null (bucket boundaries ignore nulls)")
    val sums = rawSums.map(r => r._1 -> r._2).sortBy(_._1)
    val offsets = sums.map(_._1).zip(
      sums.map(_._2).scanLeft(0L)(_ + _).init).toMap
    val w = Window.partitionBy("_grs_bucket").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col("_grs_bucket")), lit(0L))
    bucketed
      .withColumn(cumCol, offsetCol + sum(col("_grs_w")).over(w))
      .drop("_grs_key", "_grs_bucket", "_grs_w")
  }
}
