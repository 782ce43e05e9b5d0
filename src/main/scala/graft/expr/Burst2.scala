package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Kleinberg 2-state burst detection (Kleinberg 2002, "Bursty and
  * Hierarchical Structure in Streams") as a native Catalyst window function
  * — the causal (filtered) Viterbi cost recursion over a user's inter-event
  * gaps:
  *
  *   state 0 ("baseline") emits gaps at rate λ, state 1 ("burst") at s·λ;
  *   switching INTO the burst state costs γ. Per gap x the exponential
  *   negative log-likelihoods differ from λx − ln λ by a shared constant,
  *   so the recursion uses cost terms a0 = λx and a1 = s·λ·x − ln s —
  *   SUBTRACTING the shared −ln λ per row, which cannot change the argmin
  *   path but removes every data-dependent `ln` from the recursion: the
  *   only transcendental left is ln s, a compile-time Scala literal that
  *   the DuckDB oracle interpolates verbatim (no cross-engine libm in the
  *   accumulation).
  *
  *   c0' = min(c0, c1 + γ) + a0
  *   c1' = min(c1, c0 + γ) + a1
  *   then both costs are re-based by m = min(c0', c1') (subtracting a
  *   common constant — again argmin-invariant) so state stays O(γ + per-row
  *   cost) instead of growing with stream length.
  *
  * Seeding: the pre-observation costs are (0, γ) — starting in the burst
  * state costs the switch. Nulls (each partition's first row has no gap)
  * leave the state untouched and emit null, the [[Ewma]] contract.
  *
  * Same execution shape as [[Holt]]: a declarative
  * [[AggregateWindowFunction]] over the running row frame, two doubles of
  * state per partition stream, generated code inside WindowExec — scales to
  * any number of users on one hashpartitioning exchange. Emits a
  * (cost0, cost1) struct; `burst = cost1 < cost0` downstream.
  *
  * `lam` is a per-partition-constant column (the user's MLE baseline rate
  * (n−1)/span) rather than a parameter so one WindowExec serves every user.
  */
case class Burst2(gap: Expression, lam: Expression, ratio: Double,
    gamma: Double)
    extends AggregateWindowFunction with BinaryLike[Expression] {

  require(ratio > 1.0, s"burst rate ratio must exceed 1, got $ratio")
  require(gamma >= 0.0, s"switch cost must be non-negative, got $gamma")

  override def left: Expression = gap
  override def right: Expression = lam

  override def dataType: DataType = StructType(Seq(
    StructField("cost0", DoubleType), StructField("cost1", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "burst2"

  /** ln s as a SCALA literal — both engines parse the identical decimal. */
  val lnRatio: Double = math.log(ratio)

  private lazy val c0 = AttributeReference("c0", DoubleType, nullable = false)()
  private lazy val c1 = AttributeReference("c1", DoubleType, nullable = false)()
  private lazy val started =
    AttributeReference("started", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(c0, c1, started)
  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(gamma), Literal(0.0))

  private def d(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = {
    val x = d(gap)
    val l = d(lam)
    val skip = Or(IsNull(x), IsNull(l))
    val t0 = Add(Least(Seq(c0, Add(c1, Literal(gamma)))), Multiply(l, x))
    val t1 = Add(Least(Seq(c1, Add(c0, Literal(gamma)))),
      Subtract(Multiply(Multiply(Literal(ratio), l), x), Literal(lnRatio)))
    val m = Least(Seq(t0, t1))
    Seq(
      If(skip, c0, Subtract(t0, m)),
      If(skip, c1, Subtract(t1, m)),
      If(skip, started, Literal(1.0)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(started, Literal(0.0)),
      Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("cost0"), c0, Literal("cost1"), c1)))

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Burst2 = copy(gap = l, lam = r)
}

object Burst2 {
  /** The burst recursion as a fully-built window expression over
    * (partitionBy..., orderBy...) with the running row frame (same
    * direct-Catalyst construction as [[Ewma.ewmaOver]]). */
  def burst2Over(gap: Column, lam: Column, ratio: Double, gamma: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Burst2(ColumnBridge.expression(gap), ColumnBridge.expression(lam),
      ratio, gamma)
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(o => SortOrder(ColumnBridge.expression(o), Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
