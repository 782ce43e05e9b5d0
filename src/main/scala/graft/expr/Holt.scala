package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Holt's linear-trend exponential smoothing (double exponential smoothing)
  * as a native Catalyst window function — the level+trend forecaster one
  * notch up from the EWMA the reference ships, and the standard baseline
  * for trending series (Holt 1957; Hyndman & Athanasopoulos, "Forecasting:
  * Principles and Practice" §8.2):
  *
  *  - level: l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
  *  - trend: b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
  *  - one-step forecast: l_t + b_t
  *
  * Seeding: l_1 = x_1, b_1 = 0 (the first observation carries no slope
  * information; the trend warms up through β). Nulls leave the state
  * untouched and emit the current (level, trend) — same contract as
  * [[Ewma]].
  *
  * Same execution shape as [[Ewma]]: a declarative
  * [[AggregateWindowFunction]] over the running row frame — generated code
  * inside WindowExec, one pass per partition stream, state is two doubles
  * regardless of partition length, so the operator scales to any number of
  * symbols with one hashpartitioning exchange. Emits a (level, trend)
  * struct so both states come out of ONE recursion pass.
  */
case class Holt(child: Expression, alpha: Double, beta: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "holt"

  private lazy val l = AttributeReference("l", DoubleType, nullable = false)()
  private lazy val b = AttributeReference("b", DoubleType, nullable = false)()
  private lazy val started =
    AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    // all updates read the OLD buffer; l_t's tree is inlined into b_t so
    // the oracle can replay the exact same arithmetic
    val newL = Add(Multiply(Literal(alpha), x),
      Multiply(Literal(1.0 - alpha), Add(l, b)))
    val newB = Add(Multiply(Literal(beta), Subtract(newL, l)),
      Multiply(Literal(1.0 - beta), b))
    Seq(
      If(IsNull(x), l, If(EqualTo(started, Literal(0.0)), x, newL)),
      If(IsNull(x), b, If(EqualTo(started, Literal(0.0)), Literal(0.0), newB)),
      If(IsNull(x), started, Literal(1.0)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(started, Literal(0.0)),
      Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("level"), l, Literal("trend"), b)))

  override protected def withNewChildInternal(newChild: Expression): Holt =
    copy(child = newChild)
}

object Holt {
  /** Holt smoothing as a fully-built window expression over
    * (partitionBy..., orderBy...) with the running row frame (same
    * direct-Catalyst construction as [[Ewma.ewmaOver]]). */
  def holtOver(c: Column, alpha: Double, beta: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Holt(ColumnBridge.expression(c), alpha, beta)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
