package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Two independent polynomial fold lanes mod 2^31-1 over an array of
 * 31-bit hashes, combined as `lane1 · 2^31 + lane2` — the fingerprint
 * kernel ([[TextFunctions.fingerprint]]) as ONE native pass. The
 * composed form (`aggregate(...) * 2^31 + aggregate(...)`) duplicated
 * the child subtree into both lanes (token hashing ran twice per row)
 * and its lambdas stayed interpreted; this runs both lanes in a single
 * loop inside whole-stage codegen. A null element yields NULL,
 * matching the composed aggregate's null propagation.
 */
case class TwoLanePolyFold(child: Expression, seed1: Long, mult1: Long,
    seed2: Long, mult2: Long) extends UnaryExpression {

  private val P = (1L << 31) - 1

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"two_lane_poly_fold requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc1 = seed1
    var acc2 = seed2
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      acc1 = (acc1 * mult1 + h) % P
      acc2 = (acc2 * mult2 + h) % P
      i += 1
    }
    java.lang.Long.valueOf(acc1 * (1L << 31) + acc2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val a1 = ctx.freshName("acc1")
      val a2 = ctx.freshName("acc2")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long $a1 = ${seed1}L;
         |long $a2 = ${seed2}L;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $arr.getLong($i);
         |  $a1 = ($a1 * ${mult1}L + $h) % ${P}L;
         |  $a2 = ($a2 * ${mult2}L + $h) % ${P}L;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $a1 * ${1L << 31}L + $a2;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TwoLanePolyFold =
    copy(child = newChild)
}

object TwoLanePolyFold {
  def twoLanePolyFold(hashes: Column, seed1: Long, mult1: Long,
      seed2: Long, mult2: Long): Column =
    ExpressionBridge.column(TwoLanePolyFold(
      ExpressionBridge.expression(hashes), seed1, mult1, seed2, mult2))
}
