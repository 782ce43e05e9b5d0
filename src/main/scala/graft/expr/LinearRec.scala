package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Affine (first-order linear) recursion as a native Catalyst window
  * function:
  *
  *   v_0 = base;   v_t = c0 + c1·x_t + c2·v_{t-1}     (null x keeps v)
  *
  * — the recurrence family behind GARCH(1,1) conditional variance
  * (v = ω + α·r²_{t-1} + β·v_{t-1}), exponential smoothing with drift, and
  * any IIR filter with constant coefficients. [[Ewma]] is the special case
  * c0 = 0, c1 = α, c2 = 1−α with a first-value seed; this one seeds at a
  * caller-supplied prior (for GARCH: the unconditional variance
  * ω/(1−α−β)), which is what the textbook recursion wants.
  *
  * Declarative [[AggregateWindowFunction]] like the other recursions:
  * generated code inside WindowExec, one double of state per partition
  * stream, no UDF. The update tree is c0 + c1·x + c2·v in exactly that
  * association order, which the oracle's recursive CTE replays verbatim.
  */
case class LinearRec(child: Expression, c0: Double, c1: Double, c2: Double,
    base: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(Seq(c0, c1, c2, base).forall(java.lang.Double.isFinite),
    s"coefficients must be finite, got ($c0, $c1, $c2, base=$base)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "linear_rec"

  private lazy val v = AttributeReference("v", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(v)
  override val initialValues: Seq[Expression] = Seq(Literal(base))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), v,
      Add(Add(Literal(c0), Multiply(Literal(c1), x)),
        Multiply(Literal(c2), v))))

  override lazy val evaluateExpression: Expression = v

  override protected def withNewChildInternal(newChild: Expression): LinearRec =
    copy(child = newChild)
}

object LinearRec {
  /** The affine-recursion statistic over (partitionBy..., orderBy...) with
    * the running row frame (same construction rationale as
    * [[Ewma.ewmaOver]]). */
  def linearRecOver(c: Column, c0: Double, c1: Double, c2: Double,
      base: Double, partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = LinearRec(ColumnBridge.expression(c), c0, c1, c2, base)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
