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

  /** Fixed row frame of the trailing `n` rows (inclusive of current). */
  def rolling(n: Int): WindowSpec = bySymbol.rowsBetween(-(n - 1), 0)

  /** Rolling mean with Polars `min_samples = window_size` semantics
    * (null until `n` non-null values fill the frame): gate on the non-null
    * count, compute the mean as sum/n so the Spark plan and the DuckDB
    * oracle evaluate the identical arithmetic tree. */
  def rollingMean(c: Column, n: Int): Column =
    when(count(c).over(rolling(n)) === n, sum(c).over(rolling(n)) / n)

  /** Rolling sample std-dev (ddof=1) via explicit sum/sum-of-squares, gated
    * like [[rollingMean]]. The explicit formula (rather than `stddev_samp`)
    * keeps the floating-point expression tree identical to the oracle's. */
  def rollingStd(c: Column, n: Int): Column = {
    val f = rolling(n)
    val s1 = sum(c).over(f)
    val s2 = sum(c * c).over(f)
    when(count(c).over(f) === n,
      sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), lit(0.0))))
  }

  /** Rolling sum gated on `n` non-null values in the frame. */
  def rollingSum(c: Column, n: Int): Column =
    when(count(c).over(rolling(n)) === n, sum(c).over(rolling(n)))
}
