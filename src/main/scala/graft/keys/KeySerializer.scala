package graft.keys

import java.nio.charset.StandardCharsets
import java.util.UUID

/**
 * Typeclass mapping a key type to a byte-array encoding usable by an
 * ordered byte-keyed index (radix tree / sorted runs).
 *
 * Contract (two laws, property-tested in `KeySerializerSpec`):
 *
 *  1. '''Round-trip''': `fromBytes(toBytes(k)) == k`.
 *  2. '''Prefix-freedom''': for distinct keys `a != b`,
 *     `toBytes(a)` is never a proper prefix of `toBytes(b)`. Radix
 *     trees cannot store a key at an internal edge of another key, so
 *     variable-length encodings carry explicit length prefixes.
 *     (Semantics mirror the reference contract, reference
 *     KeySerializer.scala:25-31.)
 *
 * Beyond the reference we additionally make fixed-width numeric
 * encodings '''order-preserving''' (unsigned lexicographic byte order
 * == numeric order, via sign-bit flip) so a future range-scan over the
 * byte-sorted index iterates keys in numeric order.
 */
trait KeySerializer[K] extends Serializable {
  def toBytes(k: K): Array[Byte]
  def fromBytes(b: Array[Byte]): K

  /** True when unsigned byte order of encodings == the key type's
    * natural order. Fixed-width numeric encodings are (sign-flip);
    * length-prefixed ones (String/BigInt) are NOT — a short key sorts
    * by its length prefix first. Tuple2 encodings ARE when both
    * components are fixed-width and order-preserving (the length
    * prefix is then a constant). Range operations that mix byte order
    * with natural order must check this. */
  def isOrderPreserving: Boolean = false

  /** Encoded byte length when CONSTANT for every key, else None.
    * Fixed width is what lets a composite encoding inherit order
    * preservation: with constant component extents the tuple's byte
    * order is the lexicographic component order. */
  def fixedWidth: Option[Int] = None

  /** Byte length of ONE encoding that starts at `off` inside a larger
    * buffer — what lets [[KeySerializer.ConcatTuple2Serializer]]
    * split a composite encoding without a length prefix. Fixed-width
    * encodings know it statically; variable-width serializers that
    * participate in composites override (the lex string encoding scans
    * to its terminator, length-prefixed ones read their own prefix). */
  def encodedLength(b: Array[Byte], off: Int): Int =
    fixedWidth.getOrElse(throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} cannot delimit itself inside a composite encoding"))
}

object KeySerializer {
  def apply[K](implicit ks: KeySerializer[K]): KeySerializer[K] = ks

  private def putLongBE(out: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { out(off + i) = ((v >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
  }
  private def getLongBE(in: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (in(off + i) & 0xffL); i += 1 }
    v
  }
  private def putIntBE(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
    out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
  }
  private def getIntBE(in: Array[Byte], off: Int): Int =
    ((in(off) & 0xff) << 24) | ((in(off + 1) & 0xff) << 16) |
      ((in(off + 2) & 0xff) << 8) | (in(off + 3) & 0xff)

  /** 8 bytes big-endian, sign bit flipped: byte order == numeric order. */
  implicit object LongSerializer extends KeySerializer[Long] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(8)
    def toBytes(k: Long): Array[Byte] = {
      val out = new Array[Byte](8); putLongBE(out, 0, k ^ Long.MinValue); out
    }
    def fromBytes(b: Array[Byte]): Long = getLongBE(b, 0) ^ Long.MinValue
  }

  /** 8 bytes big-endian over IEEE-754 "sortable bits": byte order ==
    * `java.lang.Double.compare` total order (-Inf < finite < +Inf <
    * NaN; NaN canonicalized). Callers that need SQL's -0.0 == 0.0
    * must canonicalize -0.0 BEFORE keying — the two have distinct
    * encodings here, exactly as they are distinct in Double.compare. */
  implicit object DoubleSerializer extends KeySerializer[Double] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(8)
    def toBytes(k: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(k)
      val sortable = if (bits >= 0) bits else bits ^ Long.MaxValue
      val out = new Array[Byte](8)
      putLongBE(out, 0, sortable ^ Long.MinValue)
      out
    }
    def fromBytes(b: Array[Byte]): Double = {
      val sortable = getLongBE(b, 0) ^ Long.MinValue
      val bits = if (sortable >= 0) sortable else sortable ^ Long.MaxValue
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  /** 4 bytes big-endian, sign bit flipped. */
  implicit object IntSerializer extends KeySerializer[Int] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(4)
    def toBytes(k: Int): Array[Byte] = {
      val out = new Array[Byte](4); putIntBE(out, 0, k ^ Int.MinValue); out
    }
    def fromBytes(b: Array[Byte]): Int = getIntBE(b, 0) ^ Int.MinValue
  }

  /** 2 bytes big-endian, sign bit flipped. */
  implicit object ShortSerializer extends KeySerializer[Short] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(2)
    def toBytes(k: Short): Array[Byte] = {
      val v = k ^ Short.MinValue
      Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    }
    def fromBytes(b: Array[Byte]): Short =
      ((((b(0) & 0xff) << 8) | (b(1) & 0xff)) ^ Short.MinValue).toShort
  }

  /** 2 bytes big-endian (chars are unsigned; no flip needed). */
  implicit object CharSerializer extends KeySerializer[Char] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(2)
    def toBytes(k: Char): Array[Byte] =
      Array(((k >>> 8) & 0xff).toByte, (k & 0xff).toByte)
    def fromBytes(b: Array[Byte]): Char =
      (((b(0) & 0xff) << 8) | (b(1) & 0xff)).toChar
  }

  /** 4-byte big-endian byte-length prefix + UTF-8 payload (prefix-free). */
  implicit object StringSerializer extends KeySerializer[String] {
    def toBytes(k: String): Array[Byte] = {
      val payload = k.getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](4 + payload.length)
      putIntBE(out, 0, payload.length)
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def fromBytes(b: Array[Byte]): String = {
      val len = getIntBE(b, 0)
      new String(b, 4, len, StandardCharsets.UTF_8)
    }
    override def encodedLength(b: Array[Byte], off: Int): Int = 4 + getIntBE(b, off)
  }

  /** ORDER-PRESERVING string encoding: UTF-8 body with 0x00 escaped as
    * 0x00 0xFF, terminated by 0x00 0x00. Unsigned byte order == UTF-8
    * binary order — exactly how Spark's UTF8String (UTF8_BINARY
    * collation) and DuckDB VARCHAR compare — so a radix trie over these
    * bytes iterates strings in SQL order and serves pushed string
    * ranges and min/max(key). Prefix-free: inside a body a 0x00 is
    * always followed by 0xFF, so the byte pair 0x00 0x00 occurs exactly
    * once, at the end; a shorter encoding therefore always DIFFERS at
    * the terminator position rather than being a prefix. NOT the
    * implicit — ordered SQL string handles request it explicitly; the
    * length-prefixed [[StringSerializer]] (one byte shorter per escape,
    * cheaper to decode) stays the default for hash layouts. Note the
    * immediate successor of `s` in this order is `s + NUL (U+0000)` — what
    * half-open bound arithmetic uses for inclusive upper bounds. */
  object StringLexSerializer extends KeySerializer[String] {
    override def isOrderPreserving: Boolean = true
    def toBytes(k: String): Array[Byte] = {
      val body = k.getBytes(StandardCharsets.UTF_8)
      var zeros = 0
      var i = 0
      while (i < body.length) { if (body(i) == 0) zeros += 1; i += 1 }
      val out = new Array[Byte](body.length + zeros + 2)
      var j = 0
      i = 0
      while (i < body.length) {
        out(j) = body(i); j += 1
        if (body(i) == 0) { out(j) = 0xFF.toByte; j += 1 }
        i += 1
      }
      out // the final two bytes stay 0x00 0x00 (zero-initialized)
    }
    def fromBytes(b: Array[Byte]): String = {
      val buf = new java.io.ByteArrayOutputStream(b.length)
      var i = 0
      var done = false
      while (!done) {
        if (b(i) == 0) {
          if (b(i + 1) == 0) done = true
          else { buf.write(0); i += 2 } // 0x00 0xFF escape
        } else { buf.write(b(i)); i += 1 }
      }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    }
    /** Scan for the unique unescaped 0x00 0x00 terminator. */
    override def encodedLength(b: Array[Byte], off: Int): Int = {
      var i = off
      while (true) {
        if (b(i) == 0) {
          if (b(i + 1) == 0) return i + 2 - off
          i += 2 // 0x00 0xFF escape
        } else i += 1
      }
      -1 // unreachable
    }
  }

  /** UTF-8 binary string order — the order [[StringLexSerializer]]
    * encodings sort in, and the order SQL (UTF8String / DuckDB VARCHAR)
    * compares in. Java's natural `Ordering[String]` is UTF-16
    * code-unit order, which DISAGREES beyond the BMP (surrogate units
    * sort below U+E000..U+FFFF); a RangePartitioner built with the
    * natural ordering over lex-serialized keys would prune partitions
    * inconsistently with the tries' byte order. Range-partitioned
    * string layouts must use THIS ordering. */
  object Utf8StringOrdering extends Ordering[String] {
    def compare(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))
  }

  /** Canonical-string (RFC 4122 hex) UUID order — the order
    * [[UuidLexSerializer]] encodings sort in: unsigned msb, then
    * unsigned lsb. `java.util.UUID.compareTo` is SIGNED-long order
    * (JDK-7025832) and disagrees for UUIDs whose top bit differs; a
    * RangePartitioner built with the natural ordering over lex-encoded
    * UUID keys would prune partitions inconsistently with the tries'
    * byte order. Range-partitioned UUID layouts must use THIS. */
  object UuidLexOrdering extends Ordering[UUID] {
    def compare(a: UUID, b: UUID): Int = {
      val c = java.lang.Long.compareUnsigned(
        a.getMostSignificantBits, b.getMostSignificantBits)
      if (c != 0) c
      else java.lang.Long.compareUnsigned(
        a.getLeastSignificantBits, b.getLeastSignificantBits)
    }
  }

  /** 4-byte length prefix + two's-complement magnitude (prefix-free). */
  implicit object BigIntSerializer extends KeySerializer[BigInt] {
    def toBytes(k: BigInt): Array[Byte] = {
      val payload = k.toByteArray
      val out = new Array[Byte](4 + payload.length)
      putIntBE(out, 0, payload.length)
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def fromBytes(b: Array[Byte]): BigInt = {
      val len = getIntBE(b, 0)
      BigInt(java.util.Arrays.copyOfRange(b, 4, 4 + len))
    }
    override def encodedLength(b: Array[Byte], off: Int): Int = 4 + getIntBE(b, off)
  }

  /** 16 bytes: msb ‖ lsb, each sign-flipped big-endian. */
  implicit object UUIDSerializer extends KeySerializer[UUID] {
    override def isOrderPreserving: Boolean = true
    override def fixedWidth: Option[Int] = Some(16)
    def toBytes(k: UUID): Array[Byte] = {
      val out = new Array[Byte](16)
      putLongBE(out, 0, k.getMostSignificantBits ^ Long.MinValue)
      putLongBE(out, 8, k.getLeastSignificantBits ^ Long.MinValue)
      out
    }
    def fromBytes(b: Array[Byte]): UUID =
      new UUID(getLongBE(b, 0) ^ Long.MinValue, getLongBE(b, 8) ^ Long.MinValue)
  }

  /** 16 bytes msb ‖ lsb, RAW big-endian (no sign flip): unsigned byte
    * order == the UUID's CANONICAL-STRING (RFC 4122 hex) order — the
    * order a SQL `min/max` over a uuid string column uses. This
    * intentionally differs from [[UUIDSerializer]], whose flipped
    * encoding tracks `java.util.UUID.compareTo`'s signed-long order
    * (JDK-7025832); pick by which order the surrounding layer compares
    * in. NOT the implicit — SQL uuid handles request it explicitly. */
  object UuidLexSerializer extends KeySerializer[UUID] {
    override def isOrderPreserving: Boolean = true // canonical-string order
    override def fixedWidth: Option[Int] = Some(16)
    def toBytes(k: UUID): Array[Byte] = {
      val out = new Array[Byte](16)
      putLongBE(out, 0, k.getMostSignificantBits)
      putLongBE(out, 8, k.getLeastSignificantBits)
      out
    }
    def fromBytes(b: Array[Byte]): UUID = new UUID(getLongBE(b, 0), getLongBE(b, 8))
  }

  /** 4-byte first-component length prefix + a ‖ b. Prefix-free as long as
    * both component encodings are (the prefix pins a's extent; b inherits
    * its own prefix-freedom). */
  implicit def tuple2Serializer[A, B](
      implicit aSer: KeySerializer[A], bSer: KeySerializer[B]): KeySerializer[(A, B)] =
    new Tuple2Serializer[A, B](aSer, bSer)

  class Tuple2Serializer[A, B](aSer: KeySerializer[A], bSer: KeySerializer[B])
      extends KeySerializer[(A, B)] {
    /** With BOTH components fixed-width, the length prefix is a
      * constant and every encoding aligns: unsigned byte order ==
      * lexicographic (a, b) order whenever the components preserve
      * their own orders. (With a variable-width first component the
      * prefix sorts short `a`s first — NOT lexicographic — so this
      * stays false.) Enables partition pruning for tuple ranges on
      * RangePartitioner layouts (IndexedRDD.range/multiRange). */
    override def isOrderPreserving: Boolean =
      aSer.fixedWidth.isDefined && bSer.fixedWidth.isDefined &&
        aSer.isOrderPreserving && bSer.isOrderPreserving
    override def fixedWidth: Option[Int] =
      for (a <- aSer.fixedWidth; b <- bSer.fixedWidth) yield 4 + a + b
    def toBytes(k: (A, B)): Array[Byte] = {
      val a = aSer.toBytes(k._1)
      val b = bSer.toBytes(k._2)
      val out = new Array[Byte](4 + a.length + b.length)
      putIntBE(out, 0, a.length)
      System.arraycopy(a, 0, out, 4, a.length)
      System.arraycopy(b, 0, out, 4 + a.length, b.length)
      out
    }
    def fromBytes(b: Array[Byte]): (A, B) = {
      val aLen = getIntBE(b, 0)
      val aBytes = java.util.Arrays.copyOfRange(b, 4, 4 + aLen)
      val bBytes = java.util.Arrays.copyOfRange(b, 4 + aLen, b.length)
      (aSer.fromBytes(aBytes), bSer.fromBytes(bBytes))
    }
  }

  /** N-ary generalization of [[ConcatTuple2Serializer]]: the
    * components of a `Seq[Any]` key concatenate with NO length
    * prefixes. Component prefix-freedom (law 2) makes the
    * concatenation prefix-free for FIXED arity — distinct keys first
    * differ at some component i, whose encodings can't prefix each
    * other, so the concatenations differ at a byte inside both — and
    * order-preserving in lexicographic component order whenever every
    * component serializer preserves its own order (same argument as
    * the 2-ary proof, applied left to right). Decoding splits at each
    * component's self-delimited extent. The `(tenant, entity, ts)`
    * three-part key — and any wider — without manual `((a,b),c)`
    * nesting. All keys MUST have exactly `sers.length` components. */
  class ConcatNSerializer(sers: IndexedSeq[KeySerializer[Any]])
      extends KeySerializer[Seq[Any]] {
    require(sers.nonEmpty, "ConcatNSerializer needs at least one component")
    override def isOrderPreserving: Boolean = sers.forall(_.isOrderPreserving)
    override def fixedWidth: Option[Int] = {
      val ws = sers.map(_.fixedWidth)
      if (ws.forall(_.isDefined)) Some(ws.map(_.get).sum) else None
    }
    def toBytes(k: Seq[Any]): Array[Byte] = {
      require(k.length == sers.length,
        s"expected ${sers.length} key components, got ${k.length}")
      val parts = new Array[Array[Byte]](sers.length)
      var total = 0
      var i = 0
      while (i < sers.length) {
        parts(i) = sers(i).toBytes(k(i)); total += parts(i).length; i += 1
      }
      val out = new Array[Byte](total)
      var off = 0
      i = 0
      while (i < sers.length) {
        System.arraycopy(parts(i), 0, out, off, parts(i).length)
        off += parts(i).length
        i += 1
      }
      out
    }
    def fromBytes(b: Array[Byte]): Seq[Any] = {
      val out = new Array[Any](sers.length)
      var off = 0
      var i = 0
      while (i < sers.length) {
        val len = sers(i).encodedLength(b, off)
        out(i) = sers(i).fromBytes(java.util.Arrays.copyOfRange(b, off, off + len))
        off += len
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
    override def encodedLength(b: Array[Byte], off: Int): Int = {
      var o = off
      var i = 0
      while (i < sers.length) { o += sers(i).encodedLength(b, o); i += 1 }
      o - off
    }
  }

  /** Lexicographic component order for [[ConcatNSerializer]] keys —
    * the order its bytes preserve when every component does. */
  class SeqLexOrdering(ords: IndexedSeq[Ordering[Any]]) extends Ordering[Seq[Any]] {
    def compare(x: Seq[Any], y: Seq[Any]): Int = {
      var i = 0
      while (i < ords.length) {
        val c = ords(i).compare(x(i), y(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  /** a ‖ b with NO length prefix. Component prefix-freedom (law 2)
    * makes the concatenation prefix-free, and — whenever each
    * component preserves its own order — ORDER-PRESERVING in
    * lexicographic (a, b) order, VARIABLE-width first components
    * included: two distinct `a` encodings always differ at a byte
    * index inside both (neither can be the other's prefix), so the
    * tuple comparison is decided exactly where the standalone `a`
    * comparison is. The 4-byte-prefixed [[Tuple2Serializer]] loses
    * this for variable-width `a` (short encodings sort by length
    * first). Decoding splits at the first component's self-delimited
    * extent ([[KeySerializer.encodedLength]]) — the first component's
    * serializer must support it. The encoding of choice for SQL
    * composite handles (ordered string/uuid/integral key pairs). */
  class ConcatTuple2Serializer[A, B](aSer: KeySerializer[A], bSer: KeySerializer[B])
      extends KeySerializer[(A, B)] {
    override def isOrderPreserving: Boolean =
      aSer.isOrderPreserving && bSer.isOrderPreserving
    override def fixedWidth: Option[Int] =
      for (a <- aSer.fixedWidth; b <- bSer.fixedWidth) yield a + b
    def toBytes(k: (A, B)): Array[Byte] = {
      val a = aSer.toBytes(k._1)
      val b = bSer.toBytes(k._2)
      val out = new Array[Byte](a.length + b.length)
      System.arraycopy(a, 0, out, 0, a.length)
      System.arraycopy(b, 0, out, a.length, b.length)
      out
    }
    def fromBytes(b: Array[Byte]): (A, B) = {
      val aLen = aSer.encodedLength(b, 0)
      (aSer.fromBytes(java.util.Arrays.copyOfRange(b, 0, aLen)),
        bSer.fromBytes(java.util.Arrays.copyOfRange(b, aLen, b.length)))
    }
    override def encodedLength(b: Array[Byte], off: Int): Int = {
      val aLen = aSer.encodedLength(b, off)
      aLen + bSer.encodedLength(b, off + aLen)
    }
  }
}
