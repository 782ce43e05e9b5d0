package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct char n-gram codes of a string: each n-gram packed into one int
  * (chars are 8-bit lanes — bijective for single-byte text, which the
  * corpus is; a shorter-than-n tail gram packs into fewer lanes and cannot
  * collide with a full gram because text contains no NUL). One pass, one
  * HashSet, one int array out.
  *
  * This is a REPRESENTATION change only: the packed set is isomorphic to
  * the string-gram set the oracle computes, so any set algebra downstream
  * (intersection sizes, Jaccard) yields identical numbers — while the
  * arrays carried through joins shrink ~4-6× and the set operations compare
  * ints instead of strings. n <= 4 keeps the pack inside 32 bits.
  */
case class CharNGramCodes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n > 0 && n <= 4, s"n must be in [1, 4] to pack into an int, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_codes expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_ngram_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val count = math.max(s.length - n + 1, 1)
    val seen = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < count) {
      var code = 0
      var j = i
      val end = math.min(i + n, s.length)
      while (j < end) {
        code = (code << 8) | (s.charAt(j) & 0xff)
        j += 1
      }
      seen.add(code)
      i += 1
    }
    val out = new Array[Int](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNGramCodes =
    copy(child = newChild)
}

object CharNGramCodes {
  def charNGramCodes(c: Column, n: Int): Column =
    ColumnBridge.column(CharNGramCodes(ColumnBridge.expression(c), n))
}
