package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Word n-gram shingle hashes in one pass: xxhash64 each token, then
 * fold each window of `n` consecutive token hashes into one 64-bit
 * shingle hash (order-sensitive polynomial fold; texts shorter than
 * `n` tokens produce one whole-text shingle, mirroring
 * `TextFunctions.wordShingles`).
 *
 * Replaces the composed `transform(sequence) + slice + array_join +
 * xxhash64 + array_distinct` pipeline, which materialized every shingle
 * STRING (O(text × n) bytes of allocation per row) before hashing.
 * Here only token hashes are materialized. Dedup semantics are
 * identical up to 64-bit hash collisions (the set-of-shingles identity
 * is what minhash/Jaccard consume). JVM arithmetic may wrap — this is
 * expression-internal, not subject to SQL ANSI overflow checks.
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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      i += 1
    }
    val win = math.min(n, math.max(len, 1))
    val m = math.max(len - win + 1, if (len == 0) 0 else 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = -7046029254386353131L
      var j = 0
      while (j < win && i + j < len) {
        h = h * 1099511628211L + th(i + j)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val win = ctx.freshName("win")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      s"""
         |int $len = $arr.numElements();
         |long[] $th = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $th[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |int $win = java.lang.Math.min($n, java.lang.Math.max($len, 1));
         |int $m = $len == 0 ? 0 : java.lang.Math.max($len - $win + 1, 1);
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = -7046029254386353131L;
         |  for (int $j = 0; $j < $win && $i + $j < $len; $j++) {
         |    $h = $h * 1099511628211L + $th[$i + $j];
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashes =
    copy(child = newChild)
}

object TokenShingleHashes {
  /** One-pass shingle hashes of a token-array column. */
  def tokenShingleHashes(tokens: Column, n: Int): Column =
    ExpressionBridge.column(
      TokenShingleHashes(ExpressionBridge.expression(tokens), n))
}
