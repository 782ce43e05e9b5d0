package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Conditional running product as a native Catalyst window function:
  *
  *   v_0 = base;   v_t = if (cond_t ∧ factor_t ≠ null) v_{t-1}·factor_t
  *                       else v_{t-1}
  *
  * — the recursion behind the Negative/Positive Volume Index family
  * (Fosback 1976: an index that compounds the bar's return only on
  * falling/rising-volume bars). A running product can't be rewritten as
  * exp(Σ ln) without giving up cross-engine bit-parity (ln/exp are not
  * correctly rounded in either engine), so like [[Ewma]]/[[Cusum]] it runs
  * as a declarative [[AggregateWindowFunction]] — generated code inside
  * WindowExec, one double of state per partition stream, no UDF.
  *
  * Null handling: a null condition or null factor leaves the state
  * untouched (the warmup rows where the lagged inputs don't exist yet).
  */
case class CondProd(cond: Expression, factor: Expression, base: Double)
    extends AggregateWindowFunction with BinaryLike[Expression] {

  require(java.lang.Double.isFinite(base), s"base must be finite, got $base")

  override def left: Expression = cond
  override def right: Expression = factor
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "cond_prod"

  private lazy val v = AttributeReference("v", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(v)
  override val initialValues: Seq[Expression] = Seq(Literal(base))

  private def f: Expression =
    if (factor.dataType == DoubleType) factor else Cast(factor, DoubleType)

  // v·f associated exactly as the oracle's recursive CTE replays it; a
  // null/false condition or null factor keeps v (Catalyst If sends a null
  // predicate to the else branch)
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(And(cond, IsNotNull(f)), Multiply(v, f), v))

  override lazy val evaluateExpression: Expression = v

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CondProd =
    copy(cond = newLeft, factor = newRight)
}

object CondProd {
  /** The conditional-product statistic over (partitionBy..., orderBy...)
    * with the running row frame. Built directly as a Catalyst
    * [[WindowExpression]] (same rationale as [[Ewma.ewmaOver]]). */
  def condProdOver(cond: Column, factor: Column, base: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = CondProd(ColumnBridge.expression(cond),
      ColumnBridge.expression(factor), base)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
