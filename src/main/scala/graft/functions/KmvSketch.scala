package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Bounded-state k-minimum-values sketch aggregate: the k smallest
 * DISTINCT values of a long (hash) column, as a sorted-ascending array.
 *
 * This is the aggregate a true KMV distinct-count sketch needs
 * (Bar-Yossef et al., RANDOM 2002): per-group state is AT MOST k longs
 * at every moment — during update, in the serialized partial buffer,
 * and after merge — so the plan is one map-side-combinable aggregation
 * with d·k bytes per group shuffled, no distinct pre-pass, no window,
 * no per-group sort of the full hash stream. (The previous formulation
 * computed the same answer through `distinct` + `row_number()`, which
 * shuffles and sorts EVERY distinct hash per group — exactly the
 * exact-count cost the sketch exists to avoid, and a single global
 * group serialized one task sorting the whole stream.)
 *
 * Distinctness is exact despite eviction: the buffer evicts only its
 * current MAXIMUM, so any later duplicate of an evicted value is ≥ the
 * current maximum and is rejected by the same bound check that would
 * have evicted it — a value can never be double-counted into the k
 * smallest.
 *
 * The state is a sorted long array used as a bounded max-heap
 * substitute (k is sketch-sized — 64 by default — so binary-search
 * insertion beats heap bookkeeping and serializes for free).
 */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  // k = 1 would degenerate the (k-1)·P/h_(k) estimator to a zero
  // numerator (every non-empty group reports 0.0), so it is outside the
  // estimator's validity domain
  require(k >= 2, s"kmv sketch size must be >= 2, got $k")

  // AbstractDataType is private[sql] in Spark 4's Scala signatures, so
  // ExpectsInputTypes can't be used from this package; check directly.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires bigint, got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Sorted ascending array of the k smallest distinct longs seen.
  * `size` is the filled prefix length; insertion keeps order. */
final class KmvBuffer(k: Int) {
  private val vals = new Array[Long](k)
  private var size = 0

  /** Insert h if it belongs to the k smallest distinct values. */
  def add(h: Long): Unit = {
    if (size == k && h >= vals(size - 1)) return // common case: too large
    var idx = java.util.Arrays.binarySearch(vals, 0, size, h)
    if (idx >= 0) return // duplicate of a kept value
    idx = -(idx + 1)
    val last = if (size == k) size - 1 else size
    System.arraycopy(vals, idx, vals, idx + 1, last - idx)
    vals(idx) = h
    if (size < k) size += 1
  }

  def addAll(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.vals(i)); i += 1 }
  }

  def toArray: Array[Long] = java.util.Arrays.copyOf(vals, size)

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * size)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putLong(vals(i)); i += 1 }
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvBuffer(k)
    // serialized values are ascending; appended to an empty buffer each
    // lands at the end with no shifting
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }
}

object KmvSketchAgg {
  /** Aggregate column: sorted array of the k smallest distinct values
    * of `h` in the group (fewer when the group has fewer). */
  def kmvSketch(h: Column, k: Int): Column =
    ExpressionBridge.column(
      KmvSketchAgg(ExpressionBridge.expression(h), k).toAggregateExpression())
}
