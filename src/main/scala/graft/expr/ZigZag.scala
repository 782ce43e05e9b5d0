package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Causal ZigZag swing tracker as a native Catalyst window function: track
  * the running extreme of the current leg; when price retraces more than
  * `theta` from it, the reversal is CONFIRMED, the leg flips, and the
  * extreme restarts at the confirming price —
  *
  *   up leg:   x < ext·(1−θ)  →  flip down, ext = x;  else ext = max(ext, x)
  *   down leg: x > ext·(1+θ)  →  flip up,   ext = x;  else ext = min(ext, x)
  *
  * This is the ONLINE form (what a live strategy can actually know): the
  * classic chart ZigZag relabels history after each pivot confirms, which
  * is non-causal. Emits a (dir, ext, flip) struct per row — leg direction,
  * the leg's running extreme, and whether a reversal confirmed AT this row.
  * Seed: up leg at the first price (the first confirmed reversal makes the
  * direction meaningful; before it, dir is the conventional +1).
  *
  * Same execution shape as [[Holt]]: declarative state machine over the
  * running row frame, three doubles of state per partition stream, oracle
  * replayed as a recursive CTE with the identical branch trees. A null x
  * keeps the state and reports no flip.
  */
case class ZigZag(child: Expression, theta: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(theta > 0.0 && theta < 1.0, s"theta must be in (0, 1), got $theta")

  override def dataType: DataType = StructType(Seq(
    StructField("dir", DoubleType), StructField("ext", DoubleType),
    StructField("flip", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "zigzag"

  private lazy val dir = AttributeReference("dir", DoubleType, nullable = false)()
  private lazy val ext = AttributeReference("ext", DoubleType, nullable = false)()
  private lazy val flip = AttributeReference("flip", DoubleType, nullable = false)()
  private lazy val started =
    AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(dir, ext, flip, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(1.0), Literal(0.0), Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val up = EqualTo(dir, Literal(1.0))
    val flipUp = LessThan(x, Multiply(ext, Literal(1.0 - theta)))
    val flipDown = GreaterThan(x, Multiply(ext, Literal(1.0 + theta)))
    val fresh = EqualTo(started, Literal(0.0))
    Seq(
      If(IsNull(x), dir,
        If(fresh, Literal(1.0),
          If(up, If(flipUp, Literal(-1.0), Literal(1.0)),
            If(flipDown, Literal(1.0), Literal(-1.0))))),
      If(IsNull(x), ext,
        If(fresh, x,
          If(up, If(flipUp, x, Greatest(Seq(ext, x))),
            If(flipDown, x, Least(Seq(ext, x)))))),
      If(IsNull(x), Literal(0.0),
        If(fresh, Literal(0.0),
          If(up, If(flipUp, Literal(1.0), Literal(0.0)),
            If(flipDown, Literal(1.0), Literal(0.0))))),
      If(IsNull(x), started, Literal(1.0)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(started, Literal(0.0)),
      Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("dir"), dir, Literal("ext"), ext, Literal("flip"), flip)))

  override protected def withNewChildInternal(newChild: Expression): ZigZag =
    copy(child = newChild)
}

object ZigZag {
  /** The ZigZag state machine over (partitionBy..., orderBy...) with the
    * running row frame (same construction as [[Ewma.ewmaOver]]). */
  def zigzagOver(c: Column, theta: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = ZigZag(ColumnBridge.expression(c), theta)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
