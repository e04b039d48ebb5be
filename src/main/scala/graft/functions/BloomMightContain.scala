package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Bloom-filter membership test whose bitset lives in a Spark
 * BROADCAST VARIABLE, not in the plan.
 *
 * The literal lane ([[graft.pipeline.Sketches.bloomMightContain]])
 * embeds the bitset via `typedLit` — fine at the default 24 KB, but a
 * production filter (10^10 keys × 10 bits ≈ GBs) embedded as a plan
 * literal ships inside EVERY serialized task and every plan string.
 * Here the expression serializes only the broadcast handle; executors
 * fetch the words once per JVM through the torrent broadcast layer and
 * every task on the node shares the same array.
 *
 * Semantics are bit-identical to the literal lane: the key is cast to
 * long, folded by `floorMod(key, 2^31-1)` (Spark's `pmod`), and each of
 * the `depth` affine rows `(a_j, b_j)` must hit a set bit in its own
 * `mBits`-wide block. Null key → null (filters drop the row), exactly
 * as the literal column chain. The bit test is codegen'd straight-line
 * arithmetic — no UDF, no per-row broadcast lookup (the words land in
 * a mutable field at stage init).
 *
 * The reference engine has no sketch surface (its only aggregate is a
 * user reduce, reference IndexedRDD.scala:294-297); this follows Bloom
 * (CACM 1970) with the partitioned-block layout of Kirsch & Mitzenmacher.
 */
case class BloomMightContainBcast(
    child: Expression,
    bits: Broadcast[Array[Long]],
    mBits: Int,
    depth: Int,
    rowConsts: Seq[(Long, Long)]) extends UnaryExpression {

  private val P31 = (1L << 31) - 1

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${child.dataType.catalogString}")

  // fetched lazily ONCE per executor JVM (interpreted path)
  @transient private lazy val words: Array[Long] = bits.value

  override def nullSafeEval(key: Any): Any = {
    val h = java.lang.Math.floorMod(key.asInstanceOf[Long], P31)
    var j = 0
    var member = true
    while (member && j < depth) {
      val (a, b) = rowConsts(j)
      val p = java.lang.Math.floorMod(h * a + b, P31) % mBits + j.toLong * mBits
      member = ((words((p >>> 6).toInt) >>> (p & 63)) & 1L) == 1L
      j += 1
    }
    member
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastRef = ctx.addReferenceObj("bloomBcast", bits,
      classOf[Broadcast[_]].getName)
    // materialized once per generated-class instance, shared by all rows
    val wordsVar = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcastRef.value();")
    nullSafeCodeGen(ctx, ev, key => {
      val h = ctx.freshName("bloomH")
      val checks = rowConsts.take(depth).zipWithIndex.map { case ((a, b), j) =>
        val p = ctx.freshName(s"bloomP$j")
        s"""
           |if (${ev.value}) {
           |  long $p = java.lang.Math.floorMod($h * ${a}L + ${b}L, ${P31}L)
           |    % ${mBits}L + ${j.toLong * mBits}L;
           |  ${ev.value} = (($wordsVar[(int)($p >>> 6)] >>> ($p & 63)) & 1L) == 1L;
           |}
         """.stripMargin
      }.mkString("\n")
      s"""
         |long $h = java.lang.Math.floorMod((long) $key, ${P31}L);
         |${ev.value} = true;
         |$checks
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBcast =
    copy(child = newChild)
}

object BloomMightContainBcast {
  /** Membership column over a broadcast bitset (cast the key yourself
    * if it is not already bigint-compatible — this casts to long). */
  def mightContain(bits: Broadcast[Array[Long]], key: Column,
      mBits: Int, depth: Int, rowConsts: Seq[(Long, Long)]): Column =
    ExpressionBridge.column(BloomMightContainBcast(
      ExpressionBridge.expression(key.cast("long")), bits, mBits, depth,
      rowConsts.take(depth)))
}
