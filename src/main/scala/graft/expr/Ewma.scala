package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a native Catalyst window function.
  *
  * Mirrors the reference's Polars `ewm_mean` semantics
  * (reference: src/features/engineering.py:42-43 `adjust=False` for RSI
  * avg-gain/avg-loss, span=14; engineering.py:49-52 default `adjust=True` for
  * MACD EMAs, spans 12/26/9; alpha = 2/(span+1)):
  *
  *  - `adjust = true`:  y_t = Σ_i (1-α)^i x_{t-i} / Σ_i (1-α)^i
  *  - `adjust = false`: y_t = (1-α)·y_{t-1} + α·x_t, seeded with the first
  *    non-null x.
  *
  * Null handling: nulls leave the state untouched and emit the current mean
  * (null until the first non-null input). The reference only ever feeds
  * leading nulls (from `diff()`), for which this matches Polars exactly.
  *
  * Implemented as a declarative [[AggregateWindowFunction]] — a running-frame
  * window aggregate (rows between unbounded preceding and current row), the
  * same machinery Spark uses for `rank`/`row_number`. The recurrence runs as
  * generated code inside WindowExec: one pass per partition, no UDF, no
  * driver-side state; scales to arbitrarily many symbols because state is one
  * (num, den) pair per partition stream.
  *
  * For `adjust = false` the buffer is reused as: num = running mean,
  * den = started flag (0.0/1.0) — evaluate num/den is then num/1 = num.
  */
case class Ewma(child: Expression, alpha: Double, adjust: Boolean,
    ignoreNulls: Boolean = true)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(adjust || ignoreNulls,
    "ignoreNulls=false (position-based weight decay) is only defined for adjust=true")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma"

  private lazy val num = AttributeReference("num", DoubleType, nullable = false)()
  private lazy val den = AttributeReference("den", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(num, den)
  override val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val decay = Literal(1.0 - alpha)
    if (adjust) {
      // ignoreNulls=false: a null still ages existing observations (weights
      // keyed to absolute position — pandas ewm ignore_na=False); both
      // accumulators decay, so the current mean is unchanged until the next
      // value arrives with a larger relative weight.
      val onNullNum = if (ignoreNulls) num else Multiply(num, decay)
      val onNullDen = if (ignoreNulls) den else Multiply(den, decay)
      Seq(
        If(IsNull(x), onNullNum, Add(Multiply(num, decay), x)),
        If(IsNull(x), onNullDen, Add(Multiply(den, decay), Literal(1.0))))
    } else {
      Seq(
        If(IsNull(x), num,
          If(EqualTo(den, Literal(0.0)), x,
            Add(Multiply(num, decay), Multiply(Literal(alpha), x)))),
        If(IsNull(x), den, Literal(1.0)))
    }
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(den, Literal(0.0)), Literal.create(null, DoubleType), Divide(num, den))

  override protected def withNewChildInternal(newChild: Expression): Ewma =
    copy(child = newChild)
}

object Ewma {
  /** ewm_mean with explicit alpha as a fully-built window expression over
    * (partitionBy..., orderBy...) with the running row frame. Constructed
    * directly in Catalyst ([[WindowExpression]]) — Spark 4's ColumnNode
    * `.over` round-trip does not recognize foreign expressions. */
  def ewmaOver(c: Column, alpha: Double, adjust: Boolean,
      partitionBy: Seq[Column], orderBy: Seq[Column],
      ignoreNulls: Boolean = true): Column = {
    val fn = Ewma(ColumnBridge.expression(c), alpha, adjust, ignoreNulls)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  /** ewm_mean parameterized by span, alpha = 2/(span+1) — the reference's API. */
  def ewmaSpanOver(c: Column, span: Double, adjust: Boolean,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    ewmaOver(c, 2.0 / (span + 1.0), adjust, partitionBy, orderBy)
}
