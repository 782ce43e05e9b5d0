package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 32-bit SimHash of a document in ONE pass: for every token of
  * `split(text, ' ')`, bit b of md5's first 8 hex digits votes +1/−1 (per
  * token OCCURRENCE — the multiset, not the set), and the sign of each
  * bit's vote sum sets that output bit.
  *
  * Value-identical to the relational pipeline
  * `explode(split) → md5 → 8 hex-digit decodes → groupBy(doc).agg(32 × sum)
  * → sign-pack` (which remains what the DuckDB oracle replays), but
  * evaluated as a tight per-row loop: no token explode, no 32-column
  * aggregation — and, the scale win, NO shuffle at all: the fingerprint is
  * a narrow projection, embarrassingly parallel over any partitioning.
  *
  * Bit layout mirrors the relational form exactly: bit b reads hex digit
  * k = b/4 (0-based; digit 0 is the HIGH nibble of md5 byte 0, as in
  * `substring(md5hex, 1, 1)`) at nibble bit j = b mod 4; the vote is
  * 2·bit − 1 and ties (sum == 0) emit 0, matching `sum > 0`.
  * Tokenization mirrors `split(text, ' ')` (Java regex split, limit −1:
  * consecutive separators yield empty tokens, which md5-hash and vote like
  * any other token — same rows the explode produces).
  */
case class SimHashSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = SimHashSig.threadDigest.get()
    val votes = new Array[Int](32)
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val d = md.digest(tokens(t).getBytes(StandardCharsets.UTF_8))
      var b = 0
      while (b < 32) {
        val k = b >> 2 // 0-based hex digit index into the md5 hex string
        val nib =
          if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
        votes(b) += (((nib >> (b & 3)) & 1) << 1) - 1
        b += 1
      }
      t += 1
    }
    var v = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) v |= (1L << b)
      b += 1
    }
    v
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def simhashSig(c: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))
}
