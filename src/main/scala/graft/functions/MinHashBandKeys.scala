package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * LSH band keys straight from the feature-hash array in ONE pass: the
 * k = bands × rows minhash components (affine permutations mod 2^31-1,
 * identical to [[MinHashSignature]]) fold into one 31-bit key per band
 * (`acc = (acc·31 + component) mod 2^31-1`, acc0 = 977 — identical to
 * Dedup.bandKeys).
 *
 * Exists so the banding projection needs NO materialized signature
 * column: the composed form (16 higher-order `aggregate`s over a sig
 * column) is not codegen-able, which forces either a cache boundary or
 * a 17× re-inlined minhash per row. This expression keeps the whole
 * plan codegen and the signature internal.
 */
case class MinHashBandKeys(child: Expression, as: Array[Long], bs: Array[Long],
    bands: Int, rows: Int) extends UnaryExpression {

  require(as.length == bands * rows, "as.length must equal bands*rows")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_band_keys requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], as, bs, bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bandAs", as, "long[]")
    val bRef = ctx.addReferenceObj("bandBs", bs, "long[]")
    val cls = MinHashBandKeys.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr, $aRef, $bRef, $bands, $rows);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case m: MinHashBandKeys =>
      m.child == child && java.util.Arrays.equals(m.as, as) &&
        java.util.Arrays.equals(m.bs, bs) && m.bands == bands && m.rows == rows
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(as),
      java.util.Arrays.hashCode(bs), Int.box(bands), Int.box(rows))
}

object MinHashBandKeys {

  private val P31 = (1L << 31) - 1

  /** Shared kernel for interpreted and codegen paths. */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long],
      bands: Int, rows: Int): ArrayData = {
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
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 977L
      var r = 0
      while (r < rows) {
        // components are already < P31; the extra mod only guards the
        // empty-input case (mins left at Long.MaxValue) from overflow
        acc = (acc * 31 + mins(b * rows + r) % P31) % P31
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass band keys of an array<bigint> feature-hash column. */
  def minhashBandKeys(featureHashes: Column, as: Array[Long], bs: Array[Long],
      bands: Int, rows: Int): Column =
    ExpressionBridge.column(
      MinHashBandKeys(ExpressionBridge.expression(featureHashes), as, bs, bands, rows))
}
