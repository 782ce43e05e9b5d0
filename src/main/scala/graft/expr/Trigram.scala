package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-trigram profiles for Cavnar–Trenkle language ID —
  * the narrow replacements for the relational
  * `explode(transform(sequence(0, length(text) - 3), p -> substring(text,
  * p + 1, 3)))` stream that previously materialized ~one row per corpus
  * CHARACTER and then sorted all of them in a per-doc ranking window.
  *
  * Both expressions slice on CODE POINTS (what Spark's `substring`/`length`
  * and DuckDB's count), count into a per-row hash map, and order ties by
  * UTF-8 byte order ([[graft.Utf8Order]] — exactly the engines' string
  * sort), so the outputs are value-identical to the relational pipeline and
  * the DuckDB oracle keeps replaying the relational form unchanged:
  *
  *  - [[TrigramTopK]]: the doc's k most frequent trigrams in rank order
  *    (count desc, gram asc) — replaces groupBy(doc, gram) + row_number.
  *  - [[TrigramCounts]]: the doc's full (trigram → count) map in UTF-8 key
  *    order — the language profile aggregate sums these per-doc counts, so
  *    the (lang, gram) shuffle carries per-doc DISTINCT grams instead of
  *    every occurrence.
  */
abstract class TrigramBase extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string arg, got ${child.dataType.simpleString}")

  /** (gram, count) pairs sorted by (count desc, gram UTF-8 asc). */
  protected def rankedCounts(input: Any): Array[(String, Long)] = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    if (cps.length < 3) return Array.empty
    val cnt = new java.util.HashMap[String, Long]()
    var p = 0
    while (p <= cps.length - 3) {
      cnt.merge(new String(cps, p, 3), 1L, java.lang.Long.sum _)
      p += 1
    }
    val buf = new Array[(String, Long)](cnt.size)
    val it = cnt.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); buf(i) = (e.getKey, e.getValue); i += 1
    }
    val ord: Ordering[(String, Long)] =
      Ordering.Tuple2(Ordering.Long.reverse, graft.Utf8Order.ofString)
        .on { case (g, c) => (c, g) }
    java.util.Arrays.sort(buf, ord) // TimSort; keys distinct so ties moot
    buf
  }
}

case class TrigramTopK(child: Expression, k: Int) extends TrigramBase {
  require(k > 0, s"k must be positive, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "trigram_topk"

  override protected def nullSafeEval(input: Any): Any = {
    val ranked = rankedCounts(input)
    val n = math.min(k, ranked.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = UTF8String.fromString(ranked(i)._1); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramTopK =
    copy(child = newChild)
}

case class TrigramCounts(child: Expression) extends TrigramBase {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "trigram_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val ranked = rankedCounts(input) // deterministic entry order
    val keys = new Array[Any](ranked.length)
    val vals = new Array[Any](ranked.length)
    var i = 0
    while (i < ranked.length) {
      keys(i) = UTF8String.fromString(ranked(i)._1)
      vals(i) = ranked(i)._2
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramCounts =
    copy(child = newChild)
}

object Trigram {
  def topK(c: Column, k: Int): Column =
    ColumnBridge.column(TrigramTopK(ColumnBridge.expression(c), k))
  def counts(c: Column): Column =
    ColumnBridge.column(TrigramCounts(ColumnBridge.expression(c)))
}
