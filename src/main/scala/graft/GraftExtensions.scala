package graft

import graft.expr.{Cusum, DotProduct, Ewma}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * with the session's FunctionRegistry so they are usable from SQL, e.g.
  *
  *   SELECT ewma(close, 0.2, false)
  *          OVER (PARTITION BY symbol ORDER BY datetime) FROM bars
  *
  * Activate via `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by [[GraftSession]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    // SQL decimal literals (e.g. `0.2`) arrive as Catalyst Decimal
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"ewma $what must be a literal number, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"ewma $what must be a literal boolean, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ewma"),
      new ExpressionInfo(classOf[Ewma].getName, "ewma"),
      (args: Seq[Expression]) => args match {
        case Seq(child, alpha, adjust) =>
          Ewma(child, doubleLit(alpha, "alpha"), boolLit(adjust, "adjust"))
        case Seq(child, alpha, adjust, ignoreNulls) =>
          Ewma(child, doubleLit(alpha, "alpha"), boolLit(adjust, "adjust"),
            boolLit(ignoreNulls, "ignoreNulls"))
        case _ => throw new IllegalArgumentException(
          "usage: ewma(col, alpha, adjust[, ignoreNulls])")
      }))
    ext.injectFunction((
      FunctionIdentifier("cusum"),
      new ExpressionInfo(classOf[Cusum].getName, "cusum"),
      (args: Seq[Expression]) => args match {
        case Seq(child, drift) => Cusum(child, doubleLit(drift, "drift"))
        case _ => throw new IllegalArgumentException(
          "usage: cusum(col, drift) OVER (PARTITION BY ... ORDER BY ...)")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: dot_product(array<double>, array<double>)")
      }))
  }
}
