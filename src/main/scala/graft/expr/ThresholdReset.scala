package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Threshold-reset bucket numbering as a native Catalyst window function —
  * the primitive behind information-driven bars (López de Prado 2018,
  * ch. 2): accumulate x left-to-right; every time |acc| reaches the
  * threshold the bucket CLOSES on that row and the accumulator resets:
  *
  *   acc' = acc + coalesce(x, 0)
  *   row's bucket = current id;  |acc'| ≥ T → id += 1, acc = 0
  *
  * Unlike dollar bars (a monotone cumsum, expressible as floor(cum/T)),
  * the reset makes every bucket boundary depend on all prior boundaries —
  * a genuine data-dependent recursion, so it runs as generated code inside
  * WindowExec with two doubles of state, like [[Kama]]/[[SupertrendBase]].
  * Null x contributes nothing (the row still belongs to the open bucket).
  */
case class ThresholdReset(child: Expression, threshold: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(threshold > 0.0, s"threshold must be positive, got $threshold")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "threshold_reset"

  private lazy val acc = AttributeReference("acc", DoubleType, nullable = false)()
  private lazy val id = AttributeReference("id", DoubleType, nullable = false)()
  private lazy val cur = AttributeReference("cur", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc, id, cur)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val step = Add(acc, Coalesce(Seq(x, Literal(0.0))))
    val closed = GreaterThanOrEqual(Abs(step), Literal(threshold))
    Seq(
      If(closed, Literal(0.0), step),
      If(closed, Add(id, Literal(1.0)), id),
      id) // the row belongs to the bucket open BEFORE any reset
  }

  override lazy val evaluateExpression: Expression = Cast(cur, LongType)

  override protected def withNewChildInternal(newChild: Expression): ThresholdReset =
    copy(child = newChild)
}

object ThresholdReset {
  /** The reset-bucket numbering over (partitionBy..., orderBy...) with the
    * running row frame (same direct-Catalyst construction as
    * [[Ewma.ewmaOver]]). */
  def over(x: Column, threshold: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = ThresholdReset(ColumnBridge.expression(x), threshold)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
