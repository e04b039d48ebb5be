package graft.partition

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.keys.KeySerializer
import graft.keys.KeySerializer._

/** Radix partition must satisfy the same contract laws as the hash
  * implementation — the abstract suite makes the swap safe. */
class RadixIndexedPartitionSpec extends IndexedPartitionSpec {
  override def create(elems: Iterator[(Long, Int)]): IndexedPartition[Long, Int] =
    RadixIndexedPartition(elems)
}

class RadixTreeSpec extends AnyFunSuite {

  test("iteration is in numeric key order (order-preserving encodings)") {
    val keys = Seq(5L, -3L, 100L, 0L, -100L, 42L, Long.MinValue, Long.MaxValue)
    val p = RadixIndexedPartition(keys.map(k => (k, 1)).iterator)
    assert(p.iterator.map(_._1).toSeq === keys.sorted)
  }

  test("range scan [from, to) matches filtered oracle, including negatives") {
    val keys = (-50L to 50L).filter(_ % 3 == 0)
    val p = RadixIndexedPartition(keys.map(k => (k, k.toInt * 2)).iterator)
    for ((from, to) <- Seq((-10L, 10L), (-100L, 0L), (0L, 1L), (40L, 99L), (7L, 7L))) {
      val got = p.range(from, to).toSeq
      val want = keys.filter(k => k >= from && k < to).map(k => (k, k.toInt * 2))
      assert(got === want, s"range [$from, $to)")
    }
  }

  test("string keys: range over byte order, prefix-free safety") {
    val words = Seq("apple", "app", "banana", "ba", "cherry", "a", "z")
    val p = RadixIndexedPartition(words.map(w => (w, w.length)).iterator)
    assert(p.size === words.size)
    words.foreach(w => assert(p(w) === Some(w.length)))
    assert(p("ap") === None)
    val deleted = p.delete(Iterator("app", "z"))
    assert(deleted.size === words.size - 2)
    assert(deleted("app") === None && deleted("apple") === Some(5))
  }

  test("property: contents equal HashMap oracle after random put/delete") {
    val ops = Gen.listOfN(200, Gen.zip(Gen.oneOf(true, false),
      Gen.choose(-30L, 30L), Gen.choose(0, 999)))
    val prop = Prop.forAll(ops) { list =>
      var model = Map.empty[Long, Int]
      var tree: IndexedPartition[Long, Int] = RadixIndexedPartition.empty[Long, Int]
      list.foreach { case (isPut, k, v) =>
        if (isPut) {
          model += (k -> v)
          tree = tree.multiput(Iterator((k, v)), (_, u: Int) => u, (_, _, u: Int) => u)
        } else {
          model -= k
          tree = tree.delete(Iterator(k))
        }
      }
      tree.iterator.toMap == model && tree.size == model.size &&
        (-30L to 30L).forall(k => tree(k) == model.get(k))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("copy-on-write: old radix version untouched by updates") {
    val v0 = RadixIndexedPartition((1L to 100L).map(k => (k, 1)).iterator)
    val v1 = v0.multiput(Iterator((50L, 99), (200L, 2)), (_, u: Int) => u, (_, _, u: Int) => u)
    assert(v0(50L) === Some(1) && v0.size === 100 && v0(200L) === None)
    assert(v1(50L) === Some(99) && v1.size === 101)
  }

  test("tuple composite keys round-trip through the trie") {
    val ks = implicitly[KeySerializer[(String, Long)]]
    val p = RadixIndexedPartition(
      Seq((("a", 1L), 1), (("a", 2L), 2), (("b", 1L), 3)).iterator)(ks)
    assert(p(("a", 2L)) === Some(2))
    assert(p.size === 3)
  }
}
