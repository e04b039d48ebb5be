package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * All sign-random-projection bucket keys of a vector in ONE pass: for
 * each hash table t, bit j is the sign of the dot product with plane
 * (t, j). Output element t is the table's key OR'd with `t << 32`
 * (the tag used by the banded bucket machinery).
 *
 * Replaces `tables × bits` separate VectorDot calls (each re-traversing
 * the ArrayData): one traversal computes every dot with the exact same
 * left-to-right accumulation order, so results — and therefore the
 * DuckDB oracle's sign decisions — are bit-identical to the composed
 * form. Planes are expression-literal ±1 values (Dedup.planeSign).
 */
case class SrpKeys(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_keys requires array<double|float>, got ${other.catalogString}")
    }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    SrpKeys.compute(input.asInstanceOf[ArrayData], planes, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    val cls = SrpKeys.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr, $planesRef, $bits, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpKeys =
    copy(child = newChild)

  // Array-typed constructor params need value equality for plan matching
  override def equals(o: Any): Boolean = o match {
    case s: SrpKeys =>
      s.child == child && s.bits == bits &&
        s.planes.corresponds(planes)((a, b) => a.sameElements(b))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(bits), Int.box(planes.length))
}

object SrpKeys {

  /** One pass over the vector: accumulate every (t, j) dot in parallel
    * lanes, then fold signs into tagged per-table keys. */
  def compute(arr: ArrayData, planes: Array[Array[Double]], bits: Int,
      isFloat: Boolean): ArrayData = {
    val nPlanes = planes.length
    val tables = nPlanes / bits
    val n = arr.numElements()
    val out = new Array[Long](tables)
    // length mismatch: the composed form's VectorDot yields NULL, and
    // `when(null > 0, ...)` takes the 0-bit branch — every bit stays 0
    if (nPlanes > 0 && n != planes(0).length) {
      var t = 0
      while (t < tables) { out(t) = t.toLong << 32; t += 1 }
      return new GenericArrayData(out)
    }
    val dots = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += x * plane(i)
        i += 1
      }
      dots(p) = acc
      p += 1
    }
    var t = 0
    while (t < tables) {
      var key = t.toLong << 32
      var j = 0
      while (j < bits) {
        if (dots(t * bits + j) > 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Tagged SRP keys (one per table) of a vector column. */
  def srpKeys(vec: Column, planes: Array[Array[Double]], bits: Int): Column =
    ExpressionBridge.column(
      SrpKeys(ExpressionBridge.expression(vec), planes, bits))
}
