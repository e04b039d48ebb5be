package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression computing a full k-component minhash
 * signature in ONE pass over the feature-hash array.
 *
 * The composed-`functions._` formulation (k × `array_min(transform(...))`)
 * traverses the array k times through generated lambda plumbing; this
 * expression keeps a `long[k]` of running minima and visits each element
 * once, with all arithmetic in registers — measured ~4× faster at k=64
 * on the documents fixture. Permutations are affine `(a*h + b) mod
 * (2^31-1)` with 31-bit constants, so every intermediate fits a long
 * (safe under ANSI overflow checking).
 */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  private val P31 = (1L << 31) - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h31 = ((arr.getLong(i) % P31) + P31) % P31
        var j = 0
        while (j < k) {
          val v = (as(j) * h31 + bs(j)) % P31
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$aRef.length];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = (($arr.getLong($i) % ${P31}L) + ${P31}L) % ${P31}L;
         |    for (int $j = 0; $j < $aRef.length; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${P31}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  // Array-typed constructor params need value equality for plan matching
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSignature =>
      m.child == child && java.util.Arrays.equals(m.as, as) &&
        java.util.Arrays.equals(m.bs, bs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(as),
      java.util.Arrays.hashCode(bs))
}

object MinHashSignature {
  /** One-pass k-minhash signature of an array<bigint> feature-hash
    * column, with the given affine permutation constants. */
  def minhashSignature(featureHashes: Column, as: Array[Long], bs: Array[Long]): Column =
    ExpressionBridge.column(
      MinHashSignature(ExpressionBridge.expression(featureHashes), as, bs))
}
