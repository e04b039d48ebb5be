package graft.keys

import java.util.UUID

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class KeySerializerSpec extends AnyFunSuite {

  private val genUuid: Gen[UUID] =
    for { a <- Gen.long; b <- Gen.long } yield new UUID(a, b)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def roundTrips[K](gen: Gen[K])(implicit ser: KeySerializer[K]): Prop =
    Prop.forAll(gen) { k => ser.fromBytes(ser.toBytes(k)) == k }

  private def isProperPrefix(a: Array[Byte], b: Array[Byte]): Boolean =
    a.length < b.length && java.util.Arrays.equals(a, java.util.Arrays.copyOf(b, a.length))

  private def prefixFree[K](gen: Gen[K])(implicit ser: KeySerializer[K]): Prop =
    Prop.forAll(gen, gen) { (a, b) =>
      a == b || {
        val (ab, bb) = (ser.toBytes(a), ser.toBytes(b))
        !isProperPrefix(ab, bb) && !isProperPrefix(bb, ab)
      }
    }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def orderPreserving[K](gen: Gen[K], cmp: (K, K) => Int)(
      implicit ser: KeySerializer[K]): Prop =
    Prop.forAll(gen, gen) { (a, b) =>
      math.signum(unsignedCompare(ser.toBytes(a), ser.toBytes(b))) ==
        math.signum(cmp(a, b))
    }

  test("Long: round-trip, order preservation") {
    check(roundTrips(Gen.long))
    check(orderPreserving[Long](Gen.long, java.lang.Long.compare))
    val ser = KeySerializer[Long]
    Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue).foreach { k =>
      assert(ser.fromBytes(ser.toBytes(k)) === k)
    }
  }

  test("Int: round-trip, order preservation") {
    check(roundTrips(Gen.choose(Int.MinValue, Int.MaxValue)))
    check(orderPreserving[Int](Gen.choose(Int.MinValue, Int.MaxValue), Integer.compare))
  }

  test("Short: round-trip, order preservation") {
    val g = Gen.choose(Short.MinValue, Short.MaxValue)
    check(roundTrips(g))
    check(orderPreserving[Short](g, (a, b) => Integer.compare(a, b)))
  }

  test("Char: round-trip") {
    check(roundTrips(Gen.choose(Char.MinValue, Char.MaxValue)))
  }

  test("String: round-trip, prefix-freedom") {
    // include unicode beyond the BMP and empty strings
    val g = Gen.oneOf(Gen.asciiPrintableStr, Gen.identifier, Gen.const(""),
      Gen.const("héllo 世界 😀"))
    check(roundTrips(g))
    check(prefixFree(g))
    val ser = KeySerializer[String]
    assert(!isProperPrefix(ser.toBytes("a"), ser.toBytes("ab")))
    assert(!isProperPrefix(ser.toBytes(""), ser.toBytes("x")))
  }

  test("BigInt: round-trip, prefix-freedom") {
    val g = Gen.chooseNum(-1000000L, 1000000L).map(BigInt(_))
      .flatMap(b => Gen.oneOf(b, b * BigInt("123456789012345678901234567890")))
    check(roundTrips(g))
    check(prefixFree(g))
  }

  test("UUID: round-trip") { check(roundTrips(genUuid)) }

  test("Tuple2: round-trip + prefix-freedom, including nesting") {
    val gSL = Gen.zip(Gen.asciiPrintableStr, Gen.long)
    check(roundTrips[(String, Long)](gSL))
    check(prefixFree[(String, Long)](gSL))
    val gLS = Gen.zip(Gen.long, Gen.asciiPrintableStr)
    check(roundTrips[(Long, String)](gLS))
    val gNested = Gen.zip(Gen.zip(Gen.choose(-100, 100), Gen.identifier), Gen.long)
    check(roundTrips[((Int, String), Long)](gNested))
  }

  test("StringLex: round-trip, prefix-freedom, byte order == UTF-8 binary order") {
    implicit val ser: KeySerializer[String] = KeySerializer.StringLexSerializer
    // strings over the full BMP including embedded NULs (the escape
    // path) — surrogates excluded: Java encodes unpaired surrogates as
    // '?', a lossy path shared with the default StringSerializer
    val genChar = Gen.frequency(
      5 -> Gen.choose(0.toChar, 127.toChar),
      1 -> Gen.const(0.toChar), // force NUL coverage
      2 -> Gen.choose(128.toChar, 0xD7FF.toChar))
    val genStr = Gen.listOf(genChar).map(_.mkString)
    check(roundTrips(genStr))
    check(prefixFree(genStr))
    // the whole point: unsigned encoded-byte order == raw UTF-8 binary
    // order (how Spark's UTF8String and DuckDB VARCHAR compare)
    check(orderPreserving[String](genStr, (a, b) =>
      unsignedCompare(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    assert(ser.isOrderPreserving)
    // successor law the SQL half-open bounds rely on: s < s+NUL and
    // nothing sorts between them among generated neighbors
    val s = "ab"
    assert(unsignedCompare(ser.toBytes(s), ser.toBytes(s + 0.toChar)) < 0)
    assert(unsignedCompare(ser.toBytes(s + 0.toChar), ser.toBytes(s + 1.toChar)) < 0)
  }

  test("Tuple2: fixed-width components make byte order lexicographic; variable-width do not claim it") {
    // the law itself: byte order == lexicographic (a, b) order
    check(orderPreserving[(Long, Long)](Gen.zip(Gen.long, Gen.long),
      (x, y) => Ordering[(Long, Long)].compare(x, y)))
    check(orderPreserving[(Int, Short)](
      Gen.zip(Gen.choose(Int.MinValue, Int.MaxValue),
        Gen.choose(Short.MinValue, Short.MaxValue).map(_.toShort)),
      (x, y) => Ordering[(Int, Short)].compare(x, y)))
    // flags: claimed exactly when both components are fixed-width
    assert(KeySerializer[(Long, Long)].isOrderPreserving)
    assert(KeySerializer[(Long, Long)].fixedWidth === Some(4 + 8 + 8))
    assert(KeySerializer[(Int, Short)].isOrderPreserving)
    // a variable-width FIRST component sorts by its length prefix
    // first — not lexicographic, so the flag must stay off
    assert(!KeySerializer[(String, Long)].isOrderPreserving)
    assert(KeySerializer[(String, Long)].fixedWidth === None)
    assert(!KeySerializer[(Long, String)].isOrderPreserving)
    // nested fixed-width tuples inherit (constant inner prefix)
    assert(KeySerializer[((Long, Long), Int)].isOrderPreserving)
    check(orderPreserving[((Long, Long), Int)](
      Gen.zip(Gen.zip(Gen.long, Gen.long), Gen.choose(Int.MinValue, Int.MaxValue)),
      (x, y) => Ordering[((Long, Long), Int)].compare(x, y)))
  }

  test("ConcatTuple2: round-trip, prefix-freedom, lexicographic byte order with variable-width leads") {
    import KeySerializer._
    val genChar = Gen.frequency(
      5 -> Gen.choose(0.toChar, 127.toChar),
      1 -> Gen.const(0.toChar), // force the lex escape path
      2 -> Gen.choose(128.toChar, 0xD7FF.toChar))
    val genStr = Gen.listOf(genChar).map(_.mkString)
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    // (string, long): the composite SQL handles' workhorse pair — the
    // unprefixed concatenation must stay order-preserving even though
    // the lead is variable-width (where the length-prefixed
    // Tuple2Serializer loses the order; see the test above)
    implicit val serSL: KeySerializer[(String, Long)] =
      new ConcatTuple2Serializer(StringLexSerializer, LongSerializer)
    val genSL = Gen.zip(genStr, Gen.long)
    check(roundTrips(genSL))
    check(prefixFree(genSL))
    assert(serSL.isOrderPreserving)
    check(orderPreserving[(String, Long)](genSL, { (x, y) =>
      val c = unsignedCompare(utf8(x._1), utf8(y._1))
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }))

    // (uuid, long): unsigned (msb, lsb) component order
    implicit val serUL: KeySerializer[(UUID, Long)] =
      new ConcatTuple2Serializer(UuidLexSerializer, LongSerializer)
    val genUL = Gen.zip(genUuid, Gen.long)
    check(roundTrips(genUL))
    assert(serUL.isOrderPreserving)
    check(orderPreserving[(UUID, Long)](genUL, { (x, y) =>
      val c = UuidLexOrdering.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }))

    // (string, string), and a nested concat whose LEAD is itself a
    // concat — encodedLength must self-delimit recursively
    implicit val serSS: KeySerializer[(String, String)] =
      new ConcatTuple2Serializer(StringLexSerializer, StringLexSerializer)
    check(roundTrips(Gen.zip(genStr, genStr)))
    check(prefixFree(Gen.zip(genStr, genStr)))
    val nested = new ConcatTuple2Serializer[(String, Long), String](
      serSL, StringLexSerializer)
    check(roundTrips(Gen.zip(genSL, genStr))(nested))

    // fixed-width components compose to a fixed-width concat
    assert(new ConcatTuple2Serializer(LongSerializer, LongSerializer)
      .fixedWidth === Some(16))
  }

  test("ConcatN: round-trip, prefix-freedom, lexicographic byte order at arity 3+") {
    import KeySerializer._
    val genChar = Gen.frequency(
      5 -> Gen.choose(0.toChar, 127.toChar),
      1 -> Gen.const(0.toChar),
      2 -> Gen.choose(128.toChar, 0xD7FF.toChar))
    val genStr = Gen.listOf(genChar).map(_.mkString)
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def anySer(s: KeySerializer[_]): KeySerializer[Any] =
      s.asInstanceOf[KeySerializer[Any]]

    // (tenant string, entity long, ts long): the three-part key the
    // 2-ary laws (reference KeySerializerSuite's prefix-freedom
    // pattern) extend to — same laws, arity 3
    implicit val ser3: KeySerializer[Seq[Any]] = new ConcatNSerializer(
      Vector(anySer(StringLexSerializer), anySer(LongSerializer),
        anySer(LongSerializer)))
    val gen3: Gen[Seq[Any]] = for {
      s <- genStr; a <- Gen.long; b <- Gen.long
    } yield Vector[Any](s, a, b)
    check(roundTrips(gen3))
    check(prefixFree(gen3))
    assert(ser3.isOrderPreserving)
    check(orderPreserving[Seq[Any]](gen3, { (x, y) =>
      val c = unsignedCompare(utf8(x(0).asInstanceOf[String]),
        utf8(y(0).asInstanceOf[String]))
      if (c != 0) c
      else {
        val c2 = java.lang.Long.compare(
          x(1).asInstanceOf[Long], y(1).asInstanceOf[Long])
        if (c2 != 0) c2
        else java.lang.Long.compare(
          x(2).asInstanceOf[Long], y(2).asInstanceOf[Long])
      }
    }))

    // arity 4 with two variable-width components interleaved
    val ser4 = new ConcatNSerializer(
      Vector(anySer(LongSerializer), anySer(StringLexSerializer),
        anySer(UuidLexSerializer), anySer(StringLexSerializer)))
    val gen4: Gen[Seq[Any]] = for {
      a <- Gen.long; s <- genStr; u <- genUuid; t <- genStr
    } yield Vector[Any](a, s, u, t)
    check(roundTrips(gen4)(ser4))
    check(prefixFree(gen4)(ser4))
    assert(ser4.isOrderPreserving)

    // all-fixed-width components give a fixed-width concat; the
    // SeqLexOrdering agrees with the byte order
    val serFix = new ConcatNSerializer(
      Vector(anySer(LongSerializer), anySer(IntSerializer),
        anySer(LongSerializer)))
    assert(serFix.fixedWidth === Some(20))
    val genFix: Gen[Seq[Any]] = for {
      a <- Gen.long; i <- Gen.choose(Int.MinValue, Int.MaxValue); b <- Gen.long
    } yield Vector[Any](a, i, b)
    val lexOrd = new SeqLexOrdering(Vector(
      implicitly[Ordering[Long]].asInstanceOf[Ordering[Any]],
      implicitly[Ordering[Int]].asInstanceOf[Ordering[Any]],
      implicitly[Ordering[Long]].asInstanceOf[Ordering[Any]]))
    check(orderPreserving[Seq[Any]](genFix,
      (x, y) => lexOrd.compare(x, y))(serFix))
  }
}
