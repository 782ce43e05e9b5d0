package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Shared window specs for the per-symbol time-series operators.
  *
  * The reference isolates symbols with a driver-side loop over per-symbol
  * frames and pre-sorts by time (reference: src/main.py:62-87,
  * src/data/ingestion.py:184). Spark-first, both collapse into ONE window
  * spec: hash-partition by `symbol`, sort by (`datetime`, tie-break
  * `event_id`) within the partition. Every feature in the pipeline reuses
  * this spec, so the whole 49-column feature pass costs a single
  * `Exchange(hashpartitioning(symbol))` + one partition-local sort, no matter
  * how many features are stacked — the property that makes it scale to a
  * 1000-executor cluster.
  */
object Frames {
  val SymbolCol = "symbol"
  val TimeCol = "datetime"
  val TieCol = "event_id"

  /** Running (unbounded-preceding) per-symbol, time-ordered spec. */
  def bySymbol: WindowSpec =
    Window.partitionBy(SymbolCol).orderBy(col(TimeCol), col(TieCol))

  // ---- O(n) cumulative-sum rolling (the 100 TB formulation) ----
  //
  // Spark's sliding WindowFunctionFrame re-aggregates each frame from
  // scratch: O(n·w) per feature. The cum-lag identity
  //   rolling_sum(x, w)[t] = cum(x)[t] − cum(x)[t−w]
  // runs in two O(n) window passes (running aggregates, then lags), the same
  // incremental shape Polars' rolling kernels use. Running sums accumulate
  // strictly in row order on both Spark and DuckDB, so the identical
  // expression tree on both sides stays bit-equal — unlike engine-native
  // sliding SUM, whose association order differs between engines.
  //
  // Usage: stage A — withCums(df, name -> expr) materializes, per name,
  //   `name`   = coalesce(running sum of expr, 0.0)
  //   `name_n` = running count of non-null expr (the min_samples gate);
  // stage B — cumRolling(name, w) / cumCountGate(name, w) combine them.

  /** Stage A: append running sums + running non-null counts. */
  def withCums(df: org.apache.spark.sql.DataFrame,
      cums: Map[String, Column]): org.apache.spark.sql.DataFrame = {
    val running = bySymbol.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cols = cums.toSeq.flatMap { case (name, e) =>
      Seq(coalesce(sum(e).over(running), lit(0.0)).as(name),
        count(e).over(running).as(s"${name}_n"))
    }
    df.select(col("*") +: cols: _*)
  }

  /** Stage B: rolling sum of the last `w` rows from a stage-A cum column. */
  def cumRolling(name: String, w: Int): Column =
    col(name) - coalesce(lag(col(name), w).over(bySymbol), lit(0.0))

  /** Stage B: Polars min_samples gate — exactly `w` non-null values among
    * the last `w` rows. */
  def cumCountGate(name: String, w: Int): Column =
    (col(s"${name}_n") - coalesce(lag(col(s"${name}_n"), w).over(bySymbol), lit(0L))) === w

  /** Helper column names produced by [[withCums]] (for dropping). */
  def cumHelperCols(names: Seq[String]): Seq[String] =
    names.flatMap(n => Seq(n, s"${n}_n"))
}
