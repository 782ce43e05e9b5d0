package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction (Spark 4 moved `Column` to a
  * ColumnNode facade; building a Column from a raw Catalyst [[Expression]] now
  * goes through `org.apache.spark.sql.classic.ExpressionUtils`). Lives under
  * an `org.apache.spark.sql` subpackage so the `private[sql]` scope applies.
  * Used by graft's custom Catalyst expressions (e.g. graft.expr.Ewma).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
