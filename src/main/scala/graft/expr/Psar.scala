package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Parabolic SAR recursion (Wilder 1978) as a native Catalyst window
  * function — an accelerating trailing stop whose state machine carries
  * FOUR interacting quantities: the stop itself (sar), the extreme point
  * (ep), the acceleration factor (af), and the regime (trend):
  *
  *   s'  = sar + af·(ep − sar)
  *   flip (up: low < s'; down: high > s') →
  *        sar = ep, ep = flip extreme, af = af₀, trend = −trend
  *   else sar = s'; new extreme (up: high > ep; down: low < ep) →
  *        ep = extreme, af = min(af + inc, af_max)
  *
  * seeded (sar, ep, af, trend) = (low₁, high₁, af₀, +1) at the first row —
  * PSAR has no warmup, every row emits. This is the BASIC Wilder recursion:
  * the optional prior-two-bars clamp on s' some platforms add is omitted
  * (one definition, both engines — the oracle replays this recursion
  * exactly).
  *
  * Like [[SupertrendBase]]: five doubles of state per partition stream,
  * two evaluators ([[PsarLine]] / [[PsarDir]]) over one recursion, run as
  * generated code inside WindowExec over the shared per-symbol exchange.
  */
abstract class PsarBase
    extends AggregateWindowFunction with BinaryLike[Expression] {

  def high: Expression
  def low: Expression
  override def left: Expression = high
  override def right: Expression = low

  def af0: Double
  def inc: Double
  def afMax: Double

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected lazy val sar = AttributeReference("sar", DoubleType, nullable = false)()
  protected lazy val ep = AttributeReference("ep", DoubleType, nullable = false)()
  protected lazy val af = AttributeReference("af", DoubleType, nullable = false)()
  protected lazy val trend = AttributeReference("trend", DoubleType, nullable = false)()
  protected lazy val started = AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sar, ep, af, trend, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0))

  private def d(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val (h, l) = (d(high), d(low))
    val skip = Or(IsNull(h), IsNull(l))
    val seed = EqualTo(started, Literal(0.0))
    val isUp = EqualTo(trend, Literal(1.0))
    val sPrime = Add(sar, Multiply(af, Subtract(ep, sar)))
    val flip = Or(And(isUp, LessThan(l, sPrime)),
      And(Not(isUp), GreaterThan(h, sPrime)))
    val newExtreme = Or(And(isUp, GreaterThan(h, ep)),
      And(Not(isUp), LessThan(l, ep)))
    val nsar = If(seed, l, If(flip, ep, sPrime))
    val nep = If(seed, h,
      If(flip, If(isUp, l, h),
        If(newExtreme, If(isUp, h, l), ep)))
    val naf = If(seed, Literal(af0),
      If(flip, Literal(af0),
        If(newExtreme, Least(Seq(Add(af, Literal(inc)), Literal(afMax))), af)))
    val ntrend = If(seed, Literal(1.0),
      If(flip, If(isUp, Literal(-1.0), Literal(1.0)), trend))
    Seq(
      If(skip, sar, nsar),
      If(skip, ep, nep),
      If(skip, af, naf),
      If(skip, trend, ntrend),
      If(skip, started, Literal(1.0)))
  }

  protected def notStartedNull(e: Expression): Expression =
    If(EqualTo(started, Literal(0.0)), Literal.create(null, DoubleType), e)
}

case class PsarLine(high: Expression, low: Expression,
    af0: Double, inc: Double, afMax: Double) extends PsarBase {
  override def prettyName: String = "psar"
  override lazy val evaluateExpression: Expression = notStartedNull(sar)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PsarLine = copy(high = l, low = r)
}

case class PsarDir(high: Expression, low: Expression,
    af0: Double, inc: Double, afMax: Double) extends PsarBase {
  override def prettyName: String = "psar_dir"
  override lazy val evaluateExpression: Expression = notStartedNull(trend)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PsarDir = copy(high = l, low = r)
}

object Psar {
  private def over(fn: AggregateWindowFunction,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  def lineOver(high: Column, low: Column, af0: Double, inc: Double,
      afMax: Double, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    over(PsarLine(ColumnBridge.expression(high), ColumnBridge.expression(low),
      af0, inc, afMax), partitionBy, orderBy)

  def dirOver(high: Column, low: Column, af0: Double, inc: Double,
      afMax: Double, partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    over(PsarDir(ColumnBridge.expression(high), ColumnBridge.expression(low),
      af0, inc, afMax), partitionBy, orderBy)
}
