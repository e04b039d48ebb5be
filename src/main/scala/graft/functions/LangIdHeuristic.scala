package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The full language-ID heuristic in ONE pass over the text: whitespace
 * tokenization, per-profile stopword hit counting, Han-script codepoint
 * share, and the argmax/threshold decision — semantically identical to
 * the composed `TextFunctions.langIdFromTokens` formula (the DuckDB
 * oracle replicates the same arithmetic), but with a single traversal
 * instead of ~12 re-inlined tokenizations (the composed form references
 * the token array from every score expression, and higher-order filters
 * are not codegen-CSE-able).
 *
 * Tokenization matches `split(trim(text), "[ \t\n\f\r]+")` with
 * Java limit=-1 semantics (leading/trailing separator runs produce
 * empty tokens; trim strips spaces only). Lengths are codepoint counts.
 * NULL text yields a NULL struct (standard expression null
 * propagation; the composed form emits a struct of NULL fields — both
 * mean "no prediction", and the fixtures contain no NULL text).
 */
case class LangIdHeuristic(child: Expression, langs: Array[String],
    profiles: Array[Array[String]]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lang_id requires string, got ${other.catalogString}")
    }

  @transient private lazy val profileSets: Array[java.util.HashSet[String]] =
    profiles.map { ws =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    LangIdHeuristic.evalText(text, langs, profileSets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langsRef = ctx.addReferenceObj("lidLangs", langs, "java.lang.String[]")
    val setsRef = ctx.addReferenceObj("lidSets", profileSets, "java.util.HashSet[]")
    val cls = LangIdHeuristic.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.evalText($t.toString(), $langsRef, $setsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdHeuristic =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case l: LangIdHeuristic =>
      l.child == child && java.util.Arrays.equals(
        l.langs.asInstanceOf[Array[AnyRef]], langs.asInstanceOf[Array[AnyRef]]) &&
        l.profiles.corresponds(profiles)((a, b) => a.sameElements(b))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(
      langs.asInstanceOf[Array[AnyRef]]))
}

object LangIdHeuristic {

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  /** Shared kernel: returns InternalRow(lang: UTF8String, conf: Double). */
  def evalText(text: String, langs: Array[String],
      sets: Array[java.util.HashSet[String]]): InternalRow = {
    // trim spaces only (matching SQL trim), then split on whitespace
    // runs with Java limit=-1 semantics
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val trimmed = text.substring(start, end)

    var n = 0
    val hits = new Array[Int](sets.length)
    var i = 0
    val len = trimmed.length
    // token scan: a token boundary at each maximal whitespace run;
    // leading/trailing runs contribute empty tokens like Java split
    var tokStart = 0
    def consume(tok: String): Unit = {
      n += 1
      var p = 0
      while (p < sets.length) {
        if (sets(p).contains(tok)) hits(p) += 1
        p += 1
      }
    }
    while (i < len) {
      val cp = trimmed.codePointAt(i)
      if (isWs(cp)) {
        consume(trimmed.substring(tokStart, i))
        var j = i
        while (j < len && isWs(trimmed.codePointAt(j))) j += Character.charCount(trimmed.codePointAt(j))
        tokStart = j
        i = j
      } else {
        i += Character.charCount(cp)
      }
    }
    consume(trimmed.substring(tokStart, len)) // last (possibly empty) token

    var bestLang = "und"
    var bestScore = 0.0
    var p = 0
    while (p < langs.length) {
      val s = if (n == 0) 0.0 else hits(p).toDouble / n
      if (s > bestScore) { bestScore = s; bestLang = langs(p) }
      p += 1
    }

    // Han share over the UNtrimmed text, codepoint counts
    var cjk = 0
    var total = 0
    i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) cjk += 1
      total += 1
      i += Character.charCount(cp)
    }
    val zhConf =
      if (total == 0) 0.0
      else math.min(cjk.toDouble * 3.0 / math.max(total, 1), 1.0)

    val (lang, conf) =
      if (zhConf > 0.15) ("zh", zhConf)
      else (bestLang, math.min(bestScore * 5.0, 1.0))
    InternalRow(UTF8String.fromString(lang), conf)
  }

  /** struct(lang, confidence) language-ID of a text column. */
  def langId(text: Column, langs: Array[String], profiles: Array[Array[String]]): Column =
    ExpressionBridge.column(
      LangIdHeuristic(ExpressionBridge.expression(text), langs, profiles))
}
