package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines,
 * built from `org.apache.spark.sql.functions._` (codegen'd, no UDFs):
 * tokenization, token counting, word shingling, rolling-hash
 * fingerprinting, quality metrics, and a stopword-profile language
 * identifier. Everything here stays inside whole-stage codegen.
 */
object TextFunctions {

  /** Explicit whitespace class, identical in Java regex and RE2: Java's
    * `\s` includes U+000B (vertical tab) but RE2's does not, so any
    * `\s` in an oracle-paired pattern is a latent cross-engine
    * divergence. SQL form must spell `\x0b` (RE2 has no `\u` escape). */
  private[graft] val WsJava = " \\t\\n\\u000B\\f\\r"
  private[graft] val WsSql = " \\t\\n\\x0b\\f\\r"

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), s"[$WsJava]+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: each maximal letter run and
    * digit run is one subword, each other non-space character its own.
    * No lookarounds and an explicit whitespace class, so the pattern
    * means the same thing to Java regex and DuckDB's RE2. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$WsJava]"), lit(0)))

  /** Word n-gram shingles ("a b c" for n=3), the unit of near-dup
    * comparison. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(array_join(t, " "))).otherwise(
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + lit(1), lit(n)), " ")))
  }

  /** Distinct shingle hash set — 31-bit values in [0, 2^31-1), which is
    * LOAD-BEARING: minhash's affine permutations stay below 2^62 (ANSI
    * overflow safety) and the DuckDB oracle replicates the arithmetic.
    * One-pass native expression; shingle strings are never built. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(TokenShingleHashes.tokenShingleHashes(tokens(text), n))

  /**
   * Rolling polynomial fingerprint over the token stream (order
   * sensitive, whitespace-normalization invariant). Two independent
   * 31-bit polynomial lanes mod 2^31-1 over per-token polynomial
   * hashes, combined into one 62-bit value — all intermediates fit in
   * a long (safe under ANSI overflow checking), and every step is
   * replicable in DuckDB SQL for the oracle gate.
   */
  def fingerprint(text: Column): Column =
    TwoLanePolyFold.twoLanePolyFold(
      TokenShingleHashes.tokenShingleHashes(tokens(text), 1),
      17L, 1000003L, 31L, 999983L)

  /** Character count. */
  def charCount(text: Column): Column = length(text)

  /** PII redaction patterns — deliberately lookaround-free so the SAME
    * pattern strings run under Java regex (Spark) and RE2 (DuckDB
    * oracle, other engines). */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val UrlRe = "https?://[^ \\t\\n]+"
  private[graft] val PhoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Redact emails, URLs, then phone-like digit runs from a text
    * column (training-data curation: strip PII before the corpus ships
    * to a trainer). One codegen'd regexp pass per pattern, no UDF.
    * URL redaction runs before phone so digits inside URLs don't
    * half-match as phone numbers. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      PhoneRe, "<PHONE>")

  /** Count of PII matches redacted by [[redactPii]] (emails + URLs +
    * phone runs), for curation stats. */
  def piiCount(text: Column): Column = {
    def n(c: Column, re: String): Column =
      size(split(c, re, -1)) - 1
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterUrl = regexp_replace(afterEmail, UrlRe, "<URL>")
    n(text, EmailRe) + n(afterEmail, UrlRe) + n(afterUrl, PhoneRe)
  }

  /** Overlapping fixed-size token windows (the standard
    * pre-tokenization chunking step for long documents): chunk `i`
    * covers tokens `[i·(chunk−overlap), i·(chunk−overlap)+chunk)`;
    * a document shorter than one chunk yields itself. Returns an array
    * of chunk strings — explode it for one row per chunk. Pure Column
    * arithmetic (sequence + slice), no UDF, embarrassingly parallel. */
  def tokenChunks(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    // chunks = 1 if n <= chunk else ceil((n - chunk)/stride) + 1
    val extra = greatest(n - lit(chunkTokens), lit(0))
    val nChunks = ceil(extra.cast("double") / stride).cast("int") + lit(1)
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " "))
  }

  /** Ratio of non-space characters that are letters, 0..1. */
  def alphaRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val alpha = length(regexp_replace(text, "[^\\p{L}]", ""))
    when(nonSpace === 0, lit(0.0)).otherwise(alpha.cast("double") / nonSpace)
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(trim(text), s"[$WsJava]", "")).cast("double") / n)
  }

  /** Stopword hit ratio over an already-tokenized column. */
  def stopwordRatioTokens(toks: Column, stopwords: Seq[String]): Column = {
    val hits = size(filter(toks, w => w.isInCollection(stopwords)))
    when(size(toks) === 0, lit(0.0)).otherwise(hits.cast("double") / size(toks))
  }

  /** Stopword hit ratio against a given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordRatioTokens(tokens(text), stopwords)

  /**
   * Heuristic quality score in [0,1] combining length, token-length
   * sanity, and stopword presence — the standard cheap pre-filter for
   * training-data curation. Unrounded: the exact arithmetic is
   * replicated by the DuckDB oracle, and rounding identical doubles is
   * LESS safe than not rounding (engines disagree on doubles adjacent
   * to a decimal half boundary).
   */
  def qualityScore(text: Column, stopwords: Seq[String] = LangProfiles.en): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val tl = meanTokenLen(text)
    val tokLenScore = lit(1.0) / (lit(1.0) + abs(tl - lit(4.5)))
    val swScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    lenScore * 0.4 + tokLenScore * 0.3 + swScore * 0.3
  }

  /** Tiny per-language stopword/function-word profiles (public common
    * words), for the n-gram/stopword language-ID heuristic. */
  object LangProfiles {
    val en = Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for")
    val es = Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los")
    val de = Seq("der", "die", "das", "und", "von", "zu", "mit", "ist", "auf", "ein")
    val fr = Seq("le", "la", "de", "et", "un", "est", "pour", "dans", "que", "les")
    val zh = Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这")
    val all: Map[String, Seq[String]] =
      Map("en" -> en, "es" -> es, "de" -> de, "fr" -> fr, "zh" -> zh)
  }

  /**
   * Language-ID heuristic: CJK-codepoint share decides zh; otherwise
   * the language whose stopword profile hits the most tokens wins
   * (ties broken by fixed language order, 'und' when nothing hits).
   * Returns struct(lang, confidence). Native one-pass expression —
   * the composed [[langIdFromTokens]] references the token array from
   * every score term, which re-inlines the tokenization ~12× per row.
   */
  def langId(text: Column): Column = {
    val langs = Seq("en", "es", "de", "fr")
    LangIdHeuristic.langId(text, langs.toArray,
      langs.map(LangProfiles.all(_).toArray).toArray)
  }

  /** Language ID over an already-tokenized column — stage the token
    * array through its own projection so four per-language scores share
    * one tokenization. */
  def langIdFromTokens(toks: Column, text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\p{IsHan}]", ""))
    val langs = Seq("en", "es", "de", "fr")
    val scores = langs.map(l => stopwordRatioTokens(toks, LangProfiles.all(l)))
    val best = langs.zip(scores).foldLeft((lit("und"), lit(0.0))) {
      case ((bl, bs), (l, sc)) =>
        (when(sc > bs, lit(l)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    val zhConf = when(length(text) === 0, lit(0.0))
      .otherwise(least(cjk.cast("double") * 3.0 / greatest(length(text), lit(1)), lit(1.0)))
    // confidence is unrounded: the oracle replicates the arithmetic
    // exactly, and rounding is the only cross-engine hazard
    struct(
      when(zhConf > 0.15, lit("zh")).otherwise(best._1).as("lang"),
      when(zhConf > 0.15, zhConf).otherwise(least(best._2 * 5.0, lit(1.0)))
        .as("confidence"))
  }
}
