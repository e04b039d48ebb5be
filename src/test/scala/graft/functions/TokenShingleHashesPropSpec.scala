package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: the O(1)-per-window fold (via the concatenation law
  * poly(a++b) = poly(a)·31^len(b) + poly(b)) equals the DEFINITIONAL
  * hash — a direct codepoint fold over each space-joined shingle
  * string. The definitional form is exactly what the DuckDB oracle SQL
  * computes, so this property is the local proof of oracle parity for
  * every hash-derived pipeline (minhash, simhash, ngram, fingerprint). */
class TokenShingleHashesPropSpec extends AnyFunSuite {

  private val P31 = (1L << 31) - 1

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def charPoly(s: String): Long = {
    var h = 7L
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      h = (h * 31 + cp) % P31
      k += Character.charCount(cp)
    }
    h
  }

  private def definitional(tokens: Seq[String], n: Int): Seq[Long] = {
    if (tokens.isEmpty) return Seq.empty
    val win = math.min(n, math.max(tokens.length, 1))
    val m = math.max(tokens.length - win + 1, 1)
    (0 until m).map(i => charPoly(tokens.slice(i, i + win).mkString(" ")))
  }

  private def viaExpr(tokens: Seq[String], n: Int): Seq[Long] =
    TokenShingleHashes(Literal.create(tokens, ArrayType(StringType)), n)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  private val tokenGen: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""),
      Gen.nonEmptyListOf(Gen.oneOf('a', 'Z', '9', '!', 'é', '中')).map(_.mkString))

  test("windowed fold == definitional codepoint hash of joined shingles") {
    check(Prop.forAll(Gen.listOf(tokenGen), Gen.choose(1, 5)) {
      (tokens: List[String], n: Int) =>
        viaExpr(tokens, n) == definitional(tokens, n)
    })
  }

  test("all outputs lie in [0, 2^31-1) (minhash overflow-safety domain)") {
    check(Prop.forAll(Gen.listOf(tokenGen)) { tokens: List[String] =>
      viaExpr(tokens, 3).forall(h => h >= 0 && h < P31)
    })
  }
}
