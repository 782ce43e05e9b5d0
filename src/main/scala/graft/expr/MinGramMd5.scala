package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** min(md5(gram)) over all char `gramLen`-grams of a string, in one pass.
  *
  * Value-identical to the declarative form
  * `array_min(transform(sequence(1, greatest(len-gramLen+1, 1)),
  *            i -> md5(substring(text, i, gramLen))))`
  * (min over the multiset equals min over the distinct set, md5 hex strings
  * compare bytewise) — but evaluated as a single tight loop with zero
  * intermediate arrays, instead of interpreted higher-order functions
  * allocating a gram array, a distinct set, and an md5 array per row.
  * One digest instance per thread (the expression object is shared across
  * tasks in local mode).
  *
  * Assumes single-code-unit text (the corpus is ASCII); a non-BMP corpus
  * would need codepoint-based slicing to match Spark's substring.
  */
case class MinGramMd5(child: Expression, gramLen: Int)
  extends UnaryExpression with CodegenFallback {

  require(gramLen > 0, s"gramLen must be positive, got $gramLen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_gram_md5 expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = math.max(s.length - gramLen + 1, 1)
    val md = MinGramMd5.threadDigest.get()
    var min: String = null
    var i = 0
    while (i < n) {
      val g = s.substring(i, math.min(i + gramLen, s.length))
      md.reset()
      val hex = MinGramMd5.toHex(md.digest(g.getBytes(StandardCharsets.UTF_8)))
      if (min == null || hex.compareTo(min) < 0) min = hex
      i += 1
    }
    UTF8String.fromString(min)
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}

object MinGramMd5 {
  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def minGramMd5(c: Column, gramLen: Int): Column =
    ColumnBridge.column(MinGramMd5(ColumnBridge.expression(c), gramLen))
}
