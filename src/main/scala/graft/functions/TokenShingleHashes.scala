package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Word n-gram shingle hashes in one pass. Each window of `n`
 * consecutive tokens hashes to the polynomial codepoint hash of the
 * space-joined shingle string:
 *
 *   h = fold(codepoints of "tok_i tok_{i+1} ... ", acc0 = 7,
 *            acc -> (acc * 31 + cp) mod (2^31 - 1))
 *
 * Texts shorter than `n` tokens produce one whole-text shingle,
 * mirroring `TextFunctions.wordShingles`. Values lie in [0, 2^31-1),
 * so downstream affine minhash permutations stay overflow-free under
 * ANSI arithmetic.
 *
 * Why this hash and not xxhash64: the exact same fold is expressible
 * in ANSI SQL over another engine's list/string functions, which makes
 * every consumer (minhash LSH, n-gram Jaccard, simhash, fingerprint)
 * end-to-end verifiable against the DuckDB oracle — and it is
 * collision-adequate for near-dup candidate generation (the set-of-
 * shingles identity is what minhash/Jaccard consume). Shingle strings
 * are never materialized: per token we precompute (poly, 31^len) and
 * fold windows in O(1) per token via the concatenation law
 * poly(a ++ b) = poly(a)*31^len(b) + poly(b).
 */
case class TokenShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_shingle_hashes requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenShingleHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashes =
    copy(child = newChild)
}

object TokenShingleHashes {

  val P31: Long = (1L << 31) - 1

  /** Shared kernel for the interpreted and codegen paths (the loop body
    * dominates; one static call per row keeps codegen tiny). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    // per token: polynomial hash from acc 0, and 31^numCodepoints mod P31
    val poly = new Array[Long](len)
    val mult = new Array[Long](len)
    var i = 0
    while (i < len) {
      var p = 0L
      var m = 1L
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        if (u.isFullAscii) {
          // fast path: ASCII bytes ARE the codepoints — fold raw bytes,
          // no String allocation (the common case for web/corpus text)
          val nb = u.numBytes
          var k = 0
          while (k < nb) {
            p = (p * 31 + u.getByte(k)) % P31
            m = (m * 31) % P31
            k += 1
          }
        } else {
          val s = u.toString
          var k = 0
          while (k < s.length) {
            val cp = s.codePointAt(k)
            p = (p * 31 + cp) % P31
            m = (m * 31) % P31
            k += Character.charCount(cp)
          }
        }
      }
      poly(i) = p
      mult(i) = m
      i += 1
    }
    val win = math.min(n, math.max(len, 1))
    val m = if (len == 0) 0 else math.max(len - win + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 7L
      var j = 0
      while (j < win && i + j < len) {
        if (j > 0) h = (h * 31 + 32) % P31 // joining space, codepoint 32
        h = (h * mult(i + j) + poly(i + j)) % P31
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass shingle hashes of a token-array column. */
  def tokenShingleHashes(tokens: Column, n: Int): Column =
    ExpressionBridge.column(
      TokenShingleHashes(ExpressionBridge.expression(tokens), n))
}
