package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Renko brick tracker as a native Catalyst window function: rebuild the
  * price-move bar series (bricks of fixed size `brick`, time removed) that
  * tick/bar-to-Renko conversion produces —
  *
  *   k_up = ⌊(x − anchor) / b⌋ ;  k_dn = ⌊(anchor − x) / b⌋
  *   k_up ≥ 1 → anchor += k_up·b, dir = +1, emit k_up bricks
  *   k_dn ≥ 1 → anchor −= k_dn·b, dir = −1, emit k_dn bricks
  *   else    → state unchanged, 0 bricks
  *
  * `anchor` is the close of the last completed brick; a single large move
  * emits ALL its bricks at once (k can exceed 1), so brick counts are
  * conserved no matter how the move is sliced across rows. This is the
  * plain (non-wick, no-reversal-gap) Renko; dir reports the side of the
  * last completed brick, 0 until the first brick completes.
  *
  * Same execution shape as [[ZigZag]]: a declarative state machine over the
  * running row frame — three doubles of state per partition stream, one
  * window pass, no shuffle beyond the partition exchange. The oracle
  * replays it as a recursive CTE with the identical floor/branch trees
  * (floor is kept double-typed on both engines). A null x keeps the state
  * and emits no brick.
  */
case class Renko(child: Expression, brick: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  require(brick > 0.0, s"brick size must be positive, got $brick")

  override def dataType: DataType = StructType(Seq(
    StructField("anchor", DoubleType), StructField("dir", DoubleType),
    StructField("bricks", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "renko"

  private lazy val anchor =
    AttributeReference("anchor", DoubleType, nullable = false)()
  private lazy val dir = AttributeReference("dir", DoubleType, nullable = false)()
  private lazy val bricks =
    AttributeReference("bricks", DoubleType, nullable = false)()
  private lazy val started =
    AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(anchor, dir, bricks, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0))

  private def x: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val b = Literal(brick)
    val kUp = Cast(Floor(Divide(Subtract(x, anchor), b)), DoubleType)
    val kDn = Cast(Floor(Divide(Subtract(anchor, x), b)), DoubleType)
    val up = GreaterThanOrEqual(kUp, Literal(1.0))
    val dn = GreaterThanOrEqual(kDn, Literal(1.0))
    val fresh = EqualTo(started, Literal(0.0))
    Seq(
      If(IsNull(x), anchor,
        If(fresh, x,
          If(up, Add(anchor, Multiply(kUp, b)),
            If(dn, Subtract(anchor, Multiply(kDn, b)), anchor)))),
      If(IsNull(x), dir,
        If(fresh, Literal(0.0),
          If(up, Literal(1.0), If(dn, Literal(-1.0), dir)))),
      If(IsNull(x), Literal(0.0),
        If(fresh, Literal(0.0),
          If(up, kUp, If(dn, kDn, Literal(0.0))))),
      If(IsNull(x), started, Literal(1.0)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(started, Literal(0.0)),
      Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("anchor"), anchor, Literal("dir"), dir,
        Literal("bricks"), bricks)))

  override protected def withNewChildInternal(newChild: Expression): Renko =
    copy(child = newChild)
}

object Renko {
  /** The Renko state machine over (partitionBy..., orderBy...) with the
    * running row frame (same construction as [[ZigZag.zigzagOver]]). */
  def renkoOver(c: Column, brick: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Renko(ColumnBridge.expression(c), brick)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
