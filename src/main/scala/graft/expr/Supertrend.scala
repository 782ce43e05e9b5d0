package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Supertrend band recursion (Olivier Seban's trailing-stop indicator) as a
  * native Catalyst window function — the most state-dependent recursion in
  * the window family: two ratcheting bands AND a regime flag feed back into
  * each other.
  *
  * Per row (bands ub/lb = hl2 ± m·ATR computed upstream, prevc = prior
  * close):
  *
  *   fub = if (ub < fub' or prevc > fub') ub else fub'   (upper ratchets DOWN)
  *   flb = if (lb > flb' or prevc < flb') lb else flb'   (lower ratchets UP)
  *   trend = if trend' = +1 then (close < flb ? −1 : +1)
  *           else               (close > fub ? +1 : −1)
  *   supertrend = trend = +1 ? flb : fub
  *
  * seeded (fub, flb, trend) = (ub, lb, +1) at the first row whose bands are
  * non-null (the ATR warmup row). Rows with any null input leave the state
  * untouched and emit null until seeded.
  *
  * No fixed-α recursion or prefix-sum identity can express the conditional
  * ratchets, so this is a custom [[AggregateWindowFunction]] like
  * [[Kama]]: four doubles of state per partition stream, evaluated as
  * generated code inside WindowExec — one pass, no UDF, scales to any
  * symbol count. The line and the regime are two evaluators over the SAME
  * recursion ([[SupertrendLine]] / [[SupertrendDir]]); Spark runs both in
  * one WindowExec over the shared per-symbol exchange.
  */
abstract class SupertrendBase
    extends AggregateWindowFunction with QuaternaryLike[Expression] {

  def ub: Expression
  def lb: Expression
  def close: Expression
  def prevc: Expression

  override def first: Expression = ub
  override def second: Expression = lb
  override def third: Expression = close
  override def fourth: Expression = prevc

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected lazy val fub = AttributeReference("fub", DoubleType, nullable = false)()
  protected lazy val flb = AttributeReference("flb", DoubleType, nullable = false)()
  protected lazy val trend = AttributeReference("trend", DoubleType, nullable = false)()
  protected lazy val started = AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(fub, flb, trend, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0))

  private def d(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val (u, l, c, pc) = (d(ub), d(lb), d(close), d(prevc))
    val skip = Or(Or(IsNull(u), IsNull(l)), Or(IsNull(c), IsNull(pc)))
    val seed = EqualTo(started, Literal(0.0))
    // update expressions all read the OLD buffer; the new-band trees are
    // inlined where the trend step needs them (same values, evaluated twice)
    val nfub = If(seed, u,
      If(Or(LessThan(u, fub), GreaterThan(pc, fub)), u, fub))
    val nflb = If(seed, l,
      If(Or(GreaterThan(l, flb), LessThan(pc, flb)), l, flb))
    val ntrend = If(seed, Literal(1.0),
      If(EqualTo(trend, Literal(1.0)),
        If(LessThan(c, nflb), Literal(-1.0), Literal(1.0)),
        If(GreaterThan(c, nfub), Literal(1.0), Literal(-1.0))))
    Seq(
      If(skip, fub, nfub),
      If(skip, flb, nflb),
      If(skip, trend, ntrend),
      If(skip, started, Literal(1.0)))
  }

  protected def notStartedNull(e: Expression): Expression =
    If(EqualTo(started, Literal(0.0)), Literal.create(null, DoubleType), e)
}

/** The supertrend line: the active band (flb in an uptrend, fub in a
  * downtrend). */
case class SupertrendLine(ub: Expression, lb: Expression,
    close: Expression, prevc: Expression) extends SupertrendBase {
  override def prettyName: String = "supertrend"
  override lazy val evaluateExpression: Expression =
    notStartedNull(If(EqualTo(trend, Literal(1.0)), flb, fub))
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): SupertrendLine = copy(f, s, t, q)
}

/** The supertrend regime: +1 uptrend / −1 downtrend. */
case class SupertrendDir(ub: Expression, lb: Expression,
    close: Expression, prevc: Expression) extends SupertrendBase {
  override def prettyName: String = "supertrend_dir"
  override lazy val evaluateExpression: Expression = notStartedNull(trend)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): SupertrendDir = copy(f, s, t, q)
}

object Supertrend {
  private def over(fn: AggregateWindowFunction,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  def lineOver(ub: Column, lb: Column, close: Column, prevc: Column,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    over(SupertrendLine(ColumnBridge.expression(ub), ColumnBridge.expression(lb),
      ColumnBridge.expression(close), ColumnBridge.expression(prevc)),
      partitionBy, orderBy)

  def dirOver(ub: Column, lb: Column, close: Column, prevc: Column,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column =
    over(SupertrendDir(ColumnBridge.expression(ub), ColumnBridge.expression(lb),
      ColumnBridge.expression(close), ColumnBridge.expression(prevc)),
      partitionBy, orderBy)
}
