package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature of a document in ONE pass: for every word
  * 3-gram shingle of `text`, v = first-8-hex-digits(md5(shingle)) mod p,
  * and output k = min over shingles of (a(k)·v + b(k)) mod p.
  *
  * Value-identical to the relational pipeline
  * `explode(shingles) → md5 → conv → groupBy(doc).agg(16 × min)` (min over
  * the shingle multiset equals min over the distinct set), but evaluated as
  * a tight per-row loop: no shingle-string array, no explode, and — the
  * scale win — NO aggregation shuffle at all: the signature is a narrow
  * projection, embarrassingly parallel over any partitioning.
  *
  * Tokenization mirrors Spark's `split(text, ' ')` exactly (Java regex
  * split with limit -1: consecutive separators yield empty tokens, trailing
  * empties kept); shingle text mirrors `concat_ws(' ', slice(w, i, 3))`.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
  extends UnaryExpression with CodegenFallback {

  require(a.nonEmpty && a.length == b.length,
    s"a/b coefficient lists must be non-empty and equal-length")

  // O(1) indexing in the per-shingle hot loop regardless of the Seq
  // implementation the caller passed (a List would make a(h) O(k) and the
  // loop O(k²) per shingle)
  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val nSh = math.max(tokens.length - 2, 1)
    val md = MinHashSig.threadDigest.get()
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      val end = math.min(i + 3, tokens.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 8 hex digits as an unsigned 32-bit value, like
      // conv(substring(md5(x), 1, 8), 16, 10)
      val v = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % p
      var h = 0
      while (h < k) {
        val x = (aArr(h) * v + bArr(h)) % p
        if (x < mins(h)) mins(h) = x
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def minhashSig(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), a, b, p))
}
