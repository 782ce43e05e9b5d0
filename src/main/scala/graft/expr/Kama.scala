package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Kaufman Adaptive Moving Average recursion (Kaufman 1995) as a native
  * Catalyst window function:
  *
  *   v_t = v_{t-1} + α_t · (x_t − v_{t-1}),  seeded v = x at the first row
  *   whose α is non-null
  *
  * Unlike [[Ewma]], the smoothing constant α is a DATA-DEPENDENT column
  * (derived upstream from the efficiency ratio), which no fixed-α recursion
  * can express — so the function takes (x, α) and the recursion runs as
  * generated code inside WindowExec with two doubles of state per
  * partition stream. Rows where α (or x) is null leave the state untouched
  * and emit the current value (null until seeded) — the warmup contract of
  * the window family.
  */
case class Kama(left: Expression, right: Expression)
    extends AggregateWindowFunction with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kama"

  private lazy val v = AttributeReference("v", DoubleType, nullable = false)()
  private lazy val started =
    AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(v, started)
  override val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (left.dataType == DoubleType) left else Cast(left, DoubleType)
  private def a: Expression =
    if (right.dataType == DoubleType) right else Cast(right, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(x), IsNull(a))
    Seq(
      If(skip, v,
        If(EqualTo(started, Literal(0.0)), x,
          Add(v, Multiply(a, Subtract(x, v))))),
      If(skip, started, Literal(1.0)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(started, Literal(0.0)),
      Literal.create(null, DoubleType), v)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Kama =
    copy(left = newLeft, right = newRight)
}

object Kama {
  /** The KAMA recursion over (partitionBy..., orderBy...) with the running
    * row frame (same direct-Catalyst construction as [[Ewma.ewmaOver]]). */
  def kamaOver(x: Column, alpha: Column,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Kama(ColumnBridge.expression(x), ColumnBridge.expression(alpha))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
