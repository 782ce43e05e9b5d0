package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** One-sided CUSUM (Page 1954) as a native Catalyst window function:
  *
  *   S_0 = 0;  S_t = max(0, S_{t-1} + (x_t − k))
  *
  * the classic sequential change-point / drift detector — an alarm fires
  * when the accumulated positive drift of x above the allowance k exceeds a
  * threshold. The lower-side statistic is the same recursion on −x.
  *
  * Like [[Ewma]], the recursion references its own previous value, which no
  * built-in Spark window aggregate can express; as a declarative
  * [[AggregateWindowFunction]] it runs as generated code inside WindowExec
  * over the running row frame — one pass per partition stream, no UDF, no
  * driver state, state is ONE double per partition stream regardless of
  * scale.
  *
  * Null handling: a null x leaves the state untouched and emits the current
  * statistic (0.0 before any observation — the detector starts "in
  * control").
  */
case class Cusum(child: Expression, drift: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(drift >= 0.0 && java.lang.Double.isFinite(drift),
    s"drift allowance must be finite and >= 0, got $drift")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "cusum"

  private lazy val s = AttributeReference("s", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s)
  override val initialValues: Seq[Expression] = Seq(Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  // s + (x − k), associated exactly as the oracle's recursive CTE replays it
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), s,
      Greatest(Seq(Literal(0.0), Add(s, Subtract(x, Literal(drift)))))))

  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildInternal(newChild: Expression): Cusum =
    copy(child = newChild)
}

object Cusum {
  /** The upper-CUSUM statistic over (partitionBy..., orderBy...) with the
    * running row frame; lower side = the same call on a negated column.
    * Built directly as a Catalyst [[WindowExpression]] (same rationale as
    * [[Ewma.ewmaOver]]). */
  def cusumOver(c: Column, drift: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Cusum(ColumnBridge.expression(c), drift)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
