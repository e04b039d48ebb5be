package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Within-document n-gram repetition counts in ONE pass over the token
 * array: `struct(top2, tot2, dup3, tot3)` where `top2` is the
 * occurrence count of the most frequent word 2-gram, `dup3` the total
 * occurrences of 3-grams appearing more than once, and `tot2`/`tot3`
 * the 2-/3-gram occurrence totals. The Gopher-style fractions are
 * `top2/tot2` and `dup3/tot3`, divided as doubles by the caller so the
 * IEEE result is bit-identical to the SQL oracle's.
 *
 * Gram identity is the EXACT space-joined gram string (null tokens
 * skipped, mirroring `array_join`/`concat_ws`), counted in a per-row
 * UTF8String hash map — exact, never hash-sketched, so the counts
 * equal a `GROUP BY gram` in any engine. Texts shorter than `n`
 * tokens contribute the whole text as one gram (count 1), mirroring
 * `TextFunctions.wordShingles`. Per-row state is bounded by the
 * document's own gram count; nothing shuffles.
 */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.outType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val outType: StructType = StructType(Seq(
    StructField("top2", LongType, nullable = false),
    StructField("tot2", LongType, nullable = false),
    StructField("dup3", LongType, nullable = false),
    StructField("tot3", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for the interpreted and codegen paths. */
  def compute(arr: ArrayData): InternalRow = {
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val (top2, tot2) = gramStats(toks, 2)
    val (_, dup3, tot3) = gramStatsFull(toks, 3)
    InternalRow(top2, tot2, dup3, tot3)
  }

  private def gramStats(toks: Array[UTF8String], n: Int): (Long, Long) = {
    val (top, _, tot) = gramStatsFull(toks, n)
    (top, tot)
  }

  /** (top, dup, tot) for word `n`-grams of `toks`; shorter-than-n
    * inputs yield the single whole-text gram. */
  private def gramStatsFull(toks: Array[UTF8String], n: Int): (Long, Long, Long) = {
    if (toks.length < n) return (1L, 0L, 1L)
    val windows = toks.length - n + 1
    val counts = new java.util.HashMap[UTF8String, Array[Long]](windows * 2)
    var i = 0
    while (i < windows) {
      // concatWs skips null inputs — the same null semantics as the
      // array_join the SQL oracle replays
      val gram =
        if (n == 2) UTF8String.concatWs(Space, toks(i), toks(i + 1))
        else UTF8String.concatWs(Space, toks(i), toks(i + 1), toks(i + 2))
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1L)) else c(0) += 1L
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    (top, dup, windows.toLong)
  }

  def repetitionStats(tokens: Column): Column =
    ExpressionBridge.column(RepetitionStats(ExpressionBridge.expression(tokens)))
}
