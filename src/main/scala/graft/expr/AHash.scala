package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit aHash chunk of the 8×-tiled 64-cell average-hash over a string
  * payload, in ONE O(len) per-row pass — the vectorized replacement for the
  * explode-based plan in [[graft.media.Multimodal.phashClusters]].
  *
  * Bit-exact derivation from the original cell construction (position
  * p ∈ [0, 8·len), cell = (p·64) div (8·len), value = ord of char p mod
  * len): writing p = t·len + j (tile t, offset j), cell = 8t + (8j) div len
  * because 8·len divides 64·t·len exactly. So cell sums repeat with period
  * 8 — cell_{8t+k} = slice_k where slice_k = Σ ord(char_j) over j with
  * (8j) div len = k — and the threshold 64·cell > total (total = 8·S,
  * S = Σ ord) reduces to 8·slice_k > S. The 64-bit hash is therefore the
  * 8-bit pattern P = Σ_{k: 8·slice_k > S} 2^k repeated 8×, and every 16-bit
  * chunk equals P·257 (P | P≪8). Verified chunk-equality (h0=h1=h2=h3,
  * all ≡ 0 mod 257) against the explode-based oracle on all sf0.1 events.
  *
  * Why: the old plan exploded 8 shuffle rows PER PAYLOAD BYTE through a
  * groupBy + per-event window — at 100 TB of media that shuffles 8× the
  * corpus byte volume. This expression keeps the whole hash narrow; the
  * only remaining shuffle is the hash-cluster groupBy. Evaluates ord at
  * the code-point level (Spark `ascii` / DuckDB `ord` semantics), matching
  * UTF8String.numChars' code-point length.
  */
case class AHashChunk(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ahash_chunk expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ahash_chunk"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len == 0) 0L
    else {
      val slice = new Array[Long](8)
      var total = 0L
      var j = 0
      while (j < len) {
        val v = cps(j).toLong
        slice((8L * j / len).toInt) += v // 8L: 8*j overflows Int past ~268M code points
        total += v
        j += 1
      }
      var pattern = 0L
      var k = 0
      while (k < 8) {
        if (8L * slice(k) > total) pattern |= (1L << k)
        k += 1
      }
      pattern * 257L // P | (P << 8): both bytes of the 16-bit chunk
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AHashChunk =
    copy(child = newChild)
}

object AHashChunk {
  def ahashChunk(c: Column): Column =
    ColumnBridge.column(AHashChunk(ColumnBridge.expression(c)))
}
