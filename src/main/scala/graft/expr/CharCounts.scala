package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-character occurrence counts of a string, as doubles, sorted by the
  * character — one O(n + k log k) pass.
  *
  * Value-identical to the declarative form
  * `transform(array_sort(filter(array_distinct(split(text, '')), c -> c != '')),
  *            c -> CAST(length(text) - length(replace(text, c, '')) AS DOUBLE))`
  * — the `charEntropy` building block — but that form rescans the whole
  * string once per DISTINCT character (`replace` + two `length`s), an
  * O(k·n) per-row cost that made `text_entropy` the slowest narrow query in
  * the bench sweep. Counting into a histogram in a single pass does the
  * same work in O(n).
  *
  * Only the counting moves into this expression: the entropy float fold
  * (`aggregate(..., (acc, x) -> acc + x * log2(x))`) stays in Spark SQL, so
  * every double operation — and therefore the oracle hash — is untouched.
  * Sort order is char order, which equals UTF8String binary order for the
  * single-code-unit (ASCII/BMP) corpus this engine's text ops assume (see
  * [[MinGramMd5]] for the same caveat).
  */
case class CharCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_counts expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "char_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // ASCII fast path: a flat 128-slot histogram; rare non-ASCII chars
    // overflow into a sorted map keyed by the char itself.
    val ascii = new Array[Long](128)
    var wide: java.util.TreeMap[Character, Long] = null
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128) ascii(c) += 1L
      else {
        if (wide == null) wide = new java.util.TreeMap[Character, Long]()
        wide.merge(c, 1L, java.lang.Long.sum _)
      }
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0L) out.add(ascii(c).toDouble)
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) out.add(it.next().toDouble)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  def charCounts(c: Column): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(c)))
}
