package graft.partition

import org.apache.spark.SparkConf
import org.apache.spark.serializer.{JavaSerializer, KryoSerializer, Serializer}
import org.scalatest.funsuite.AnyFunSuite

/** Abstract behavioral contract over `create` — one law set, N
  * implementations (pattern from reference IndexedRDDPartitionSuite). */
abstract class IndexedPartitionSpec extends AnyFunSuite {

  def create(elems: Iterator[(Long, Int)]): IndexedPartition[Long, Int]

  private def base: IndexedPartition[Long, Int] =
    create((1L to 100L).map(k => (k, k.toInt * 10)).iterator)

  test("size / apply / isDefined / multiget") {
    val p = base
    assert(p.size === 100)
    assert(p(5L) === Some(50))
    assert(p(101L) === None)
    assert(p.isDefined(1L) && !p.isDefined(0L))
    assert(p.multiget(Array(3L, 7L, 999L)).toMap === Map(3L -> 30, 7L -> 70))
  }

  test("iterator yields all entries exactly once") {
    assert(base.iterator.toMap === (1L to 100L).map(k => (k, k.toInt * 10)).toMap)
  }

  test("multiput: insert via z, merge via f, persistence of old version") {
    val p = base
    val p2 = p.multiput(Iterator((1L, 5), (200L, 7)),
      (_: Long, u: Int) => u * 100, (_: Long, old: Int, u: Int) => old + u)
    assert(p2(1L) === Some(15))      // merged: 10 + 5
    assert(p2(200L) === Some(700))   // projected insert: 7 * 100
    assert(p2.size === 101)
    // old version untouched (copy-on-write)
    assert(p(1L) === Some(10) && p.size === 100)
  }

  test("delete removes keys, old version persists") {
    val p = base
    val p2 = p.delete(Iterator(1L, 2L, 999L))
    assert(p2.size === 98 && p2(1L) === None)
    assert(p(1L) === Some(10))
  }

  test("filter") {
    val p2 = base.filter((k, v) => k % 2 == 0 && v > 100)
    assert(p2.iterator.toMap === (1L to 100L).filter(k => k % 2 == 0 && k * 10 > 100)
      .map(k => (k, k.toInt * 10)).toMap)
  }

  test("mapValues with key in scope") {
    val p2 = base.mapValues((k, v) => v + k.toInt)
    assert(p2(7L) === Some(77))
    assert(p2.size === 100)
  }

  test("diff keeps keys in both sides with differing values, this side's value") {
    val a = create((1L to 10L).map(k => (k, k.toInt)).iterator)
    val b = create((5L to 15L).map(k => (k, if (k <= 7) k.toInt else -1)).iterator)
    val d = a.diff(b)
    // keys 5,6,7 equal → dropped; 8,9,10 differ → kept with a's value
    assert(d.iterator.toMap === Map(8L -> 8, 9L -> 9, 10L -> 10))
  }

  test("fullOuterJoin covers both-present, left-only, right-only") {
    val a = create(Iterator((1L, 1), (2L, 2)))
    val b = create(Iterator((2L, 20), (3L, 30)))
    val j = a.fullOuterJoin(b)((_, l, r) => l.getOrElse(0) + r.getOrElse(0))
    assert(j.iterator.toMap === Map(1L -> 1, 2L -> 22, 3L -> 30))
  }

  test("join updates matches in place, keeps non-matches, inserts nothing") {
    val a = create(Iterator((1L, 1), (2L, 2)))
    val j = a.join(Iterator((2L, 5), (9L, 9)))((_, v, u) => v * u)
    assert(j.iterator.toMap === Map(1L -> 1, 2L -> 10))
  }

  test("leftJoin") {
    val a = create(Iterator((1L, 1), (2L, 2)))
    val b = create(Iterator((2L, 20)))
    val j = a.leftJoin(b)((_, v, o) => v + o.getOrElse(100))
    assert(j.iterator.toMap === Map(1L -> 101, 2L -> 22))
  }

  test("innerJoin") {
    val a = create(Iterator((1L, 1), (2L, 2), (3L, 3)))
    val b = create(Iterator((2L, 20), (3L, 30), (4L, 40)))
    val j = a.innerJoin(b)((_, v, u) => v + u)
    assert(j.iterator.toMap === Map(2L -> 22, 3L -> 33))
  }

  test("createUsingIndex: last write wins") {
    val p2 = base.createUsingIndex(Iterator((1L, 9), (1L, 11), (2L, 4)))
    assert(p2.iterator.toMap === Map(1L -> 11, 2L -> 4))
  }

  test("aggregateUsingIndex keeps keys absent from the index") {
    val p2 = base.aggregateUsingIndex(
      Iterator((1L, 1), (1L, 2), (-1L, 5), (-1L, 6)), (a: Int, b: Int) => a + b)
    assert(p2.iterator.toMap === Map(1L -> 3, -1L -> 11))
  }

  test("reindex preserves contents") {
    assert(base.reindex.iterator.toMap === base.iterator.toMap)
  }

  private def roundTrip(ser: Serializer, p: IndexedPartition[Long, Int]): IndexedPartition[Long, Int] = {
    val inst = ser.newInstance()
    inst.deserialize[IndexedPartition[Long, Int]](inst.serialize(p))
  }

  test("Java serialization round-trip") {
    val p2 = roundTrip(new JavaSerializer(new SparkConf), base)
    assert(p2.size === 100 && p2(5L) === Some(50))
    assert(p2.iterator.toMap === base.iterator.toMap)
  }

  test("Kryo serialization round-trip") {
    val p2 = roundTrip(new KryoSerializer(new SparkConf), base)
    assert(p2.size === 100 && p2(5L) === Some(50))
    assert(p2.iterator.toMap === base.iterator.toMap)
  }
}

class HashIndexedPartitionSpec extends IndexedPartitionSpec {
  override def create(elems: Iterator[(Long, Int)]): IndexedPartition[Long, Int] =
    HashIndexedPartition(elems)
}

/** Runs the same contract against a two-delta lazy view whose merged
  * content equals the input (split across deltas; overlap reduced). */
class LazyIndexedPartitionSpec extends IndexedPartitionSpec {
  override def create(elems: Iterator[(Long, Int)]): IndexedPartition[Long, Int] = {
    val all = elems.toVector
    val (a, b) = all.splitAt(all.size / 2)
    // right-biased reduce: last delta wins, so overlaps behave like updates
    new LazyIndexedPartition(
      Vector(HashIndexedPartition(a.iterator), HashIndexedPartition(b.iterator)),
      (_: Int, y: Int) => y)
  }
}

class LazySpecificSpec extends AnyFunSuite {
  test("lazy union reduces overlapping keys on point lookup without forcing") {
    val a = HashIndexedPartition(Iterator((1L, 1), (2L, 2)))
    val b = HashIndexedPartition(Iterator((2L, 20), (3L, 30)))
    val u = LazyIndexedPartition.union[Long, Int](a, b, _ + _)
    assert(u(2L) === Some(22))
    assert(u(1L) === Some(1) && u(3L) === Some(30))
  }

  test("chained unions flatten into one delta list when the reducer is shared") {
    val add = (a: Int, b: Int) => a + b
    val parts = (0 until 4).map(i => HashIndexedPartition(Iterator((i.toLong, 1), (99L, 1))))
    val u = parts.map(p => p: IndexedPartition[Long, Int]).reduce(
      (x, y) => LazyIndexedPartition.union(x, y, add))
    assert(u.asInstanceOf[LazyIndexedPartition[Long, Int]].deltas.size === 4)
    assert(u(99L) === Some(4))
    assert(u.reindex.iterator.toMap ===
      Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 1, 99L -> 4))
  }

  test("chained unions with DIFFERENT reducers nest, applying each reducer to its own deltas") {
    val a = HashIndexedPartition(Iterator((1L, 2), (2L, 5)))
    val b = HashIndexedPartition(Iterator((1L, 3), (3L, 7)))
    val c = HashIndexedPartition(Iterator((1L, 4), (2L, 1)))
    // (a ∪_+ b) ∪_max c : key 1 -> max(2+3, 4) = 5, NOT max(2,3,4) or 2+3+4
    val inner = LazyIndexedPartition.union[Long, Int](a, b, _ + _)
    val outer = LazyIndexedPartition.union[Long, Int](inner, c, math.max)
    assert(outer.deltas.size === 2) // nested view + c, not flattened
    assert(outer(1L) === Some(5))
    assert(outer(2L) === Some(5)) // max(5, 1)
    assert(outer(3L) === Some(7))
    assert(outer.reindex.iterator.toMap === Map(1L -> 5, 2L -> 5, 3L -> 7))
  }

  test("serialization ships deltas; merge re-runs at destination") {
    val a = HashIndexedPartition(Iterator((1L, 1)))
    val b = HashIndexedPartition(Iterator((1L, 2)))
    val u = LazyIndexedPartition.union[Long, Int](a, b, _ + _)
    val ser = new JavaSerializerShim
    val u2 = ser.roundTrip(u)
    assert(u2.size === 1 && u2(1L) === Some(3))
  }

  private class JavaSerializerShim {
    private val inst = new JavaSerializer(new SparkConf).newInstance()
    def roundTrip[T: scala.reflect.ClassTag](t: T): T = inst.deserialize[T](inst.serialize(t))
  }
}
