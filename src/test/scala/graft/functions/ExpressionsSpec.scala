package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/** Native-expression laws: codegen path (through a real query) must
  * agree with the interpreted `eval` path, and with composed-functions
  * reference formulations. */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("VectorDot: codegen == interpreted == composed; float and double inputs") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val native = df.select(VectorDot.vectorDot($"a", $"b")).head().getDouble(0)
    val composed = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)).head().getDouble(0)
    assert(native === composed && native === 32.0)
    val interp = VectorDot(
      Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Seq(4.0, 5.0, 6.0), ArrayType(DoubleType))).eval(null)
    assert(interp === 32.0)
    // float side widens per element, matching an explicit cast
    val fdf = Seq((Seq(1.5f, 2.5f), Seq(2.0, 4.0))).toDF("a", "b")
    assert(fdf.select(VectorDot.vectorDot($"a", $"b")).head().getDouble(0) === 13.0)
  }

  test("VectorDot: null element and length mismatch yield NULL (= composed form)") {
    // null element poisons the product-sum, like aggregate(zip_with(...))
    val ndf = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val nativeRow = ndf.select(VectorDot.vectorDot($"a", $"b")).head()
    val composedRow = ndf.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)).head()
    assert(nativeRow.isNullAt(0) && composedRow.isNullAt(0))
    // mismatched lengths: zip_with pads with null -> NULL; native matches
    val mdf = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    assert(mdf.select(VectorDot.vectorDot($"a", $"b")).head().isNullAt(0))
    assert(mdf.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)).head().isNullAt(0))
    // interpreted path agrees
    val interp = VectorDot(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Seq(4.0), ArrayType(DoubleType))).eval(null)
    assert(interp == null)
  }

  test("MinHashSignature: codegen == interpreted; component independence; min law") {
    val as = Array(3L, 5L, 7L)
    val bs = Array(11L, 13L, 17L)
    val df = Seq(Tuple1(Seq(100L, 200L, 300L))).toDF("hs")
    val viaQuery = df.select(MinHashSignature.minhashSignature($"hs", as, bs))
      .head().getSeq[Long](0)
    val interp = MinHashSignature(
      Literal.create(Seq(100L, 200L, 300L), ArrayType(LongType)), as, bs)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaQuery.toSeq === interp.toSeq)
    // each component is the min of its permutation applied to all inputs
    val P31 = (1L << 31) - 1
    val expected = as.indices.map { j =>
      Seq(100L, 200L, 300L).map(h => (as(j) * (((h % P31) + P31) % P31) + bs(j)) % P31).min
    }
    assert(viaQuery.toSeq === expected)
    // signature of a superset is component-wise <= (min law)
    val df2 = Seq(Tuple1(Seq(100L, 200L, 300L, 50L))).toDF("hs")
    val sup = df2.select(MinHashSignature.minhashSignature($"hs", as, bs))
      .head().getSeq[Long](0)
    assert(sup.zip(viaQuery).forall { case (s, v) => s <= v })
  }

  test("TokenShingleHashes: codegen == interpreted; window semantics") {
    val df = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("t")
    val viaQuery = df.select(TokenShingleHashes.tokenShingleHashes($"t", 3))
      .head().getSeq[Long](0)
    assert(viaQuery.length === 2) // windows: abc, bcd
    val interp = TokenShingleHashes(
      Literal.create(Seq("a", "b", "c", "d"), ArrayType(StringType)), 3)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaQuery.toSeq === interp.toSeq)
    // shorter than n -> one whole-text shingle
    val short = Seq(Tuple1(Seq("a", "b"))).toDF("t")
      .select(TokenShingleHashes.tokenShingleHashes($"t", 3)).head().getSeq[Long](0)
    assert(short.length === 1)
    // shifted window equality: shingle of (b,c,d) at pos 1 == shingle of
    // (b,c,d) at pos 0 in a shifted array (position-independence)
    val shifted = Seq(Tuple1(Seq("b", "c", "d"))).toDF("t")
      .select(TokenShingleHashes.tokenShingleHashes($"t", 3)).head().getSeq[Long](0)
    assert(viaQuery(1) === shifted.head)
    // order sensitivity
    val reversed = Seq(Tuple1(Seq("d", "c", "b"))).toDF("t")
      .select(TokenShingleHashes.tokenShingleHashes($"t", 3)).head().getSeq[Long](0)
    assert(reversed.head !== shifted.head)
  }

  test("Skew.saltedSumCount equals plain groupBy aggregation") {
    val df = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0), ("a", 0.5)).toDF("k", "v")
    val salted = graft.pipeline.Skew.saltedSumCount(df, Seq("k"), "v", saltBuckets = 4)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq === Seq(("a", 4.0, 3L), ("b", 4.0, 1L)))
    // salted-join helper: replicated dim joins a salted fact side losslessly
    val dim = Seq(("a", 10), ("b", 20)).toDF("k", "w")
    val rep = graft.pipeline.Skew.replicateForSalt(dim, 4)
    assert(rep.count() === 8)
    val fact = df.withColumn("__salt",
      graft.pipeline.Skew.saltColumn(4, $"k", $"v"))
    val joined = fact.join(rep, Seq("k", "__salt"))
    assert(joined.count() === df.count()) // every fact row finds its dim
  }
}

class RoundTwoExpressionsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSessionFixture.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{aggregate => sqlAggregate, _}

  test("SrpKeys == composed per-table srpKeyTable fold (tagged), double and float") {
    import graft.pipeline.Dedup
    val vecs = Seq(
      Tuple1(Seq.tabulate(64)(i => math.sin(i * 1.7) * (if (i % 3 == 0) -1 else 1))),
      Tuple1(Seq.tabulate(64)(i => math.cos(i) * 0.01)))
    val df = vecs.toDF("v")
    val native = df.select(Dedup.srpKeysTagged($"v", 64, 6, 4)).collect()
      .map(_.getSeq[Long](0))
    val composed = df.select(array((0 until 4).map { t =>
      Dedup.srpKeyTable($"v", 64, 6, t).bitwiseOR(lit(t.toLong << 32))
    }: _*)).collect().map(_.getSeq[Long](0))
    assert(native.toSeq.map(_.toSeq) === composed.toSeq.map(_.toSeq))
    // float input widens identically
    val fdf = Seq(Tuple1(Seq.tabulate(64)(i => (math.sin(i) * 3).toFloat))).toDF("v")
    val nf = fdf.select(Dedup.srpKeysTagged($"v", 64, 6, 2)).head().getSeq[Long](0)
    val cf = fdf.select(array((0 until 2).map { t =>
      Dedup.srpKeyTable(transform($"v", x => x.cast("double")), 64, 6, t)
        .bitwiseOR(lit(t.toLong << 32))
    }: _*)).head().getSeq[Long](0)
    assert(nf.toSeq === cf.toSeq)
  }

  test("MinHashBandKeys == bandKeys fold over MinHashSignature") {
    val P31 = (1L << 31) - 1
    val as = Array.tabulate(8)(i => 3L + 2 * i)
    val bs = Array.tabulate(8)(i => 11L + i)
    val df = Seq(Tuple1(Seq(100L, 200L, 300L, 12345L))).toDF("hs")
    val native = df.select(MinHashBandKeys.minhashBandKeys($"hs", as, bs, 2, 4))
      .head().getSeq[Long](0)
    val composed = df.select({
      val sig = MinHashSignature.minhashSignature($"hs", as, bs)
      array((0 until 2).map { j =>
        sqlAggregate(slice(sig, j * 4 + 1, 4), lit(977L),
          (acc, x) => pmod(acc * lit(31L) + x, lit(P31)))
      }: _*)
    }).head().getSeq[Long](0)
    assert(native.toSeq === composed.toSeq)
  }

  test("NearestCentroid == array_position(array_min) over composed distances") {
    val cents = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.5, 0.5, 0.0))
    val df = Seq(
      Tuple1(Seq(0.9, 0.1, 0.0)), Tuple1(Seq(0.1, 0.9, 0.0)),
      Tuple1(Seq(0.5, 0.5, 0.01))).toDF("v")
    val native = df.select(NearestCentroid.nearestCentroid($"v", cents))
      .collect().map(_.getLong(0))
    // composed reference: staged distance array + array_position(array_min)
    val staged = df.withColumn("__d", array(cents.map { c =>
      val cc = c.map(x => x * x).sum
      lit(cc) - lit(2.0) * VectorDot.vectorDot($"v", typedLit(c.toSeq))
    }: _*)).selectExpr("array_position(__d, array_min(__d)) AS p")
      .collect().map(_.getLong(0))
    assert(native.toSeq === staged.toSeq)
    assert(native.toSeq === Seq(1L, 2L, 3L))
  }

  test("LangIdHeuristic == composed langIdFromTokens on representative texts") {
    val texts = Seq(
      "the cat sat on the mat and it is that for a story",
      "el perro y la casa de que en un por con los",
      "der hund und die katze von zu mit ist auf ein",
      "le chien est pour dans que les de et un",
      "zzz qqq xxx www",
      "",
      "这是 一个 中文 句子 的 测试 这 人 有 我")
    val df = texts.map(Tuple1(_)).toDF("text")
    val native = df.select(TextFunctions.langId($"text").as("l"))
      .select($"l.lang", $"l.confidence").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val composed = df
      .select($"text", TextFunctions.tokens($"text").as("__t"))
      .select(TextFunctions.langIdFromTokens($"__t", $"text").as("l"))
      .select($"l.lang", $"l.confidence").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(native.toSeq === composed.toSeq)
  }

  test("TwoLanePolyFold: codegen == interpreted == composed aggregate lanes") {
    val df = Seq(
      Seq(5L, 1234567L, 99L, 2147483645L),
      Seq.empty[Long],
      Seq(42L)).toDF("th")
    val native = df.select(
      TwoLanePolyFold.twoLanePolyFold($"th", 17L, 1000003L, 31L, 999983L))
      .as[Long].collect().toSeq
    val p = lit((1L << 31) - 1)
    def lane(seed: Long, mult: Long) =
      aggregate($"th", lit(seed), (acc, h) => pmod(acc * lit(mult) + h, p))
    val composed = df.select(lane(17L, 1000003L) * lit(1L << 31) + lane(31L, 999983L))
      .as[Long].collect().toSeq
    assert(native === composed)
    // interpreted eval agrees with the codegen'd query path
    val expr = TwoLanePolyFold(Literal.create(Seq(5L, 1234567L, 99L, 2147483645L),
      ArrayType(LongType)), 17L, 1000003L, 31L, 999983L)
    assert(expr.eval(null) === native.head)
    // null element propagates NULL, like the composed aggregate
    val ndf = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("th")
    assert(ndf.select(
      TwoLanePolyFold.twoLanePolyFold($"th", 17L, 1000003L, 31L, 999983L))
      .head().isNullAt(0))
  }
}
