package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd guarded floor-form rounding — the oracle-parity rounding
  * (FIXTURES.md §4) as ONE cheap expression:
  *
  *   isNaN(x) || |x| > guard  ?  x  :  floor(x·scale + 0.5) / scale
  *
  * Semantically identical to the Column form
  * `when(abs(c) > guard, c).otherwise(floor(c·scale + 0.5)/scale)`:
  *  - Spark SQL orders NaN above every finite double, so the `when` sends
  *    NaN through the identity branch — the explicit isNaN test replicates
  *    that (Java's NaN > guard is false, the opposite);
  *  - Spark's `floor` rounds through LONG while this stays in double
  *    domain (`Math.floor`), but under the guard the two are bit-identical:
  *    |x|·scale + 0.5 ≤ 9.0·10¹⁵ < 2⁵³, so the long↔double roundtrip is
  *    exact — and double-domain floor is exactly what the DuckDB oracle
  *    computes.
  *
  * Why an expression and not the Column form: CollapseProject inlines the
  * rounded columns into upstream projections, and CaseWhen branches are
  * excluded from codegen common-subexpression elimination — every wrapped
  * feature expression was evaluated ~3× (abs guard, identity branch, floor
  * branch). Here the child is evaluated ONCE into a local, and the rounding
  * itself is three primitive ops (measured: the 44-column ml_matrix
  * rounding projection went from ~1.7 s to noise at sf0.1).
  */
case class GuardedFloorRound(child: Expression, scale: Double, guard: Double)
  extends UnaryExpression {

  // doGenCode interpolates both parameters into Java double literals via
  // Double.toString — valid for every finite double ("9.0E9D", "4.9E-324D")
  // but uncompilable for Infinity/NaN ("InfinityD"); make the constraint
  // explicit instead of failing at Janino compile time
  require(java.lang.Double.isFinite(scale) && java.lang.Double.isFinite(guard)
      && scale > 0.0,
    s"guarded_floor_round needs a finite positive scale and a finite guard " +
      s"(codegen embeds them as Java literals), got scale=$scale guard=$guard")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"guarded_floor_round expects a double argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "guarded_floor_round"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (java.lang.Double.isNaN(x) || math.abs(x) > guard) x
    else math.floor(x * scale + 0.5) / scale
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = (Double.isNaN($x) || Math.abs($x) > ${guard}D)
         |  ? $x : Math.floor($x * ${scale}D + 0.5D) / ${scale}D;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GuardedFloorRound =
    copy(child = newChild)
}

object GuardedFloorRound {
  /** 6-decimal oracle-parity rounding (see graft.queries.Core.r6). */
  def round6(c: Column): Column =
    ColumnBridge.column(GuardedFloorRound(
      ColumnBridge.expression(c.cast("double")), 1e6, 9.0e9))

  /** 4-decimal money-sum rounding (see graft.queries.Core.r4). */
  def round4(c: Column): Column =
    ColumnBridge.column(GuardedFloorRound(
      ColumnBridge.expression(c.cast("double")), 1e4, 9.0e11))
}
