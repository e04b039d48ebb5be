package graft

import org.apache.spark.HashPartitioner
import org.scalatest.funsuite.AnyFunSuite

/** Operator laws vs Scala-collection oracles, mirroring the coverage of
  * the reference suite (reference IndexedRDDSuite.scala) including the
  * partitioner-mismatch shuffle paths. */
class IndexedRDDSpec extends AnyFunSuite {

  private lazy val sc = SparkSessionFixture.spark.sparkContext

  private def pairs(n: Int = 100): IndexedRDD[Long, Int] =
    IndexedRDD(sc.parallelize((1 to n).map(i => (i.toLong, i * 10)), 4))

  test("build enforces key uniqueness (last write wins) and partitioning") {
    val dup = sc.parallelize(Seq((1L, 1), (1L, 2), (2L, 5)), 3)
    val r = IndexedRDD(dup)
    assert(r.partitioner.isDefined)
    assert(r.count() === 2)
    assert(r.get(2L) === Some(5))
    assert(Set(1, 2).contains(r.get(1L).get)) // one of the duplicates survives
  }

  test("updatable folds duplicates with z/f") {
    val dup = sc.parallelize(Seq((1L, 1), (1L, 2), (1L, 4), (2L, 7)), 2)
    val r = IndexedRDD.updatable[Long, Int, Int](dup, (_, u) => u, (_, acc, u) => acc + u)
    assert(r.multiget(Array(1L, 2L)) === Map(1L -> 7, 2L -> 7))
  }

  test("get / multiget hit and miss") {
    val r = pairs()
    assert(r.get(5L) === Some(50))
    assert(r.get(0L) === None)
    assert(r.multiget(Array(1L, 50L, 1000L)) === Map(1L -> 10, 50L -> 500))
    assert(r.multiget(Array.empty[Long]) === Map.empty)
  }

  test("collect as plain RDD matches oracle") {
    assert(pairs(50).collect().toMap === (1 to 50).map(i => (i.toLong, i * 10)).toMap)
  }

  test("count is size sum, no scan") {
    assert(pairs(1000).count() === 1000)
  }

  test("put / multiput upsert; old version still queryable (COW)") {
    val v0 = pairs(10).cached
    val v1 = v0.put(11L, 110)
    val v2 = v1.multiput(Map(1L -> -1, 12L -> 120))
    assert(v2.get(11L) === Some(110))
    assert(v2.get(1L) === Some(-1))
    assert(v2.count() === 12)
    // versioned snapshots: v0 unchanged
    assert(v0.get(1L) === Some(10) && v0.count() === 10 && v0.get(11L) === None)
  }

  test("multiput with merge function") {
    val r = pairs(5).multiput(Map(1L -> 7, 9L -> 9), (_, old, nw) => old + nw)
    assert(r.get(1L) === Some(17)) // merged
    assert(r.get(9L) === Some(9))  // inserted
  }

  test("multiputRDD with project/merge over a mismatched-partitioner update set") {
    val updates = sc.parallelize(Seq((1L, 100L), (200L, 300L)), 7) // 7 != 4 partitions
    val r = pairs(10).multiputRDD[Long](updates,
      (_, u) => u.toInt, (_, old, u) => old + u.toInt)
    assert(r.get(1L) === Some(110))
    assert(r.get(200L) === Some(300))
  }

  test("delete removes keys; old version persists") {
    val v0 = pairs(10).cached
    val v1 = v0.delete(Array(1L, 2L, 99L))
    assert(v1.count() === 8 && v1.get(1L) === None)
    assert(v0.count() === 10 && v0.get(1L) === Some(10))
  }

  test("filter keeps index and partitioning") {
    val r = pairs(100).filter { case (k, v) => k % 2 == 0 && v > 100 }
    assert(r.partitioner.isDefined)
    assert(r.collect().toMap ===
      (1 to 100).filter(i => i % 2 == 0 && i * 10 > 100).map(i => (i.toLong, i * 10)).toMap)
    assert(r.get(50L) === Some(500) && r.get(51L) === None && r.get(10L) === None)
  }

  test("mapValues (with and without key)") {
    val r = pairs(10)
    assert(r.mapValues((v: Int) => v + 1).get(3L) === Some(31))
    assert(r.mapValues((k: Long, v: Int) => v + k.toInt).get(3L) === Some(33))
  }

  test("innerJoin: co-partitioned narrow path") {
    val a = pairs(10)
    val b = a.filter { case (k, _) => k >= 5 }.mapValues((v: Int) => v * 2)
    assert(a.partitioner === b.partitioner)
    val j = a.innerJoin(b)((_, x, y) => x + y)
    assert(j.collect().toMap === (5 to 10).map(i => (i.toLong, i * 30)).toMap)
  }

  test("innerJoin: arbitrary RDD path (different partition count)") {
    val a = pairs(10)
    val other = sc.parallelize((5 to 15).map(i => (i.toLong, i)), 9)
    val j = a.innerJoin(other)((_, x, y) => x + y)
    assert(j.collect().toMap === (5 to 10).map(i => (i.toLong, i * 10 + i)).toMap)
  }

  test("leftJoin both paths") {
    val a = pairs(6)
    val co = a.filter { case (k, _) => k > 3 }
    val expect = (1 to 6).map(i =>
      (i.toLong, if (i > 3) i * 20 else i * 10 + 1)).toMap
    val j1 = a.leftJoin(co)((_, v, o) => o.map(_ + v).getOrElse(v + 1))
    assert(j1.collect().toMap === expect)
    val other = sc.parallelize((4 to 6).map(i => (i.toLong, i * 10)), 5)
    val j2 = a.leftJoin(other)((_, v, o) => o.map(_ + v).getOrElse(v + 1))
    assert(j2.collect().toMap === expect)
  }

  test("join updates matches in place, keeps type and non-matches") {
    val a = pairs(6)
    val other = sc.parallelize(Seq((2L, 3), (99L, 9)), 2)
    val j = a.join(other)((_, v, u) => v * u)
    assert(j.collect().toMap ===
      ((1 to 6).map(i => (i.toLong, i * 10)).toMap + (2L -> 60)))
    assert(j.get(99L) === None) // join never inserts
  }

  test("fullOuterJoin covers all three regions, both paths") {
    val a = IndexedRDD(sc.parallelize((1 to 6).map(i => (i.toLong, i)), 4))
    val expect = ((1 to 3).map(i => (i.toLong, i)) ++
      (4 to 6).map(i => (i.toLong, i + i * 100)) ++
      (7 to 9).map(i => (i.toLong, i * 100))).toMap
    // co-partitioned
    val b = IndexedRDD(sc.parallelize((4 to 9).map(i => (i.toLong, i * 100)), 4)
      .partitionBy(a.partitioner.get))
    val j1 = a.fullOuterJoin(b)((_, l, r) => l.getOrElse(0) + r.getOrElse(0))
    assert(j1.collect().toMap === expect)
    // mismatched partitions
    val c = sc.parallelize((4 to 9).map(i => (i.toLong, i * 100)), 7)
    val j2 = a.fullOuterJoin(c)((_, l, r) => l.getOrElse(0) + r.getOrElse(0))
    assert(j2.collect().toMap === expect)
  }

  test("unionWith is a lazy keyed union: point reads work, scan forces merge") {
    val a = IndexedRDD(sc.parallelize((1 to 6).map(i => (i.toLong, i)), 4))
    val b = sc.parallelize((4 to 9).map(i => (i.toLong, i * 100)), 4)
    val u = a.unionWith(b, _ + _)
    assert(u.get(2L) === Some(2))
    assert(u.get(5L) === Some(505))
    assert(u.get(8L) === Some(800))
    val expect = ((1 to 3).map(i => (i.toLong, i)) ++
      (4 to 6).map(i => (i.toLong, i + i * 100)) ++
      (7 to 9).map(i => (i.toLong, i * 100))).toMap
    assert(u.collect().toMap === expect)
    assert(u.count() === 9)
    // chain another delta lazily, then reindex
    val w = u.unionWith(sc.parallelize(Seq((1L, 1000)), 2), _ + _).reindex()
    assert(w.get(1L) === Some(1001))
    // duplicate keys WITHIN the non-indexed other side fold with the
    // reducer too (not last-write-wins)
    val dup = a.unionWith(sc.parallelize(Seq((1L, 10), (1L, 20)), 3), _ + _)
    assert(dup.get(1L) === Some(31))
  }

  test("diff keeps this side's values for keys whose values differ") {
    val a = IndexedRDD(sc.parallelize((1 to 10).map(i => (i.toLong, i)), 4))
    val b = a.mapValues((k: Long, v: Int) => if (k <= 5) v else -v)
    val d = a.diff(b)
    assert(d.collect().toMap === (6 to 10).map(i => (i.toLong, i)).toMap)
    // mismatched-partitioner path
    val c = sc.parallelize((1 to 10).map(i => (i.toLong, if (i <= 5) i else -i)), 3)
    assert(a.diff(c).collect().toMap === (6 to 10).map(i => (i.toLong, i)).toMap)
  }

  test("aggregateUsingIndex reduces by key and KEEPS keys absent from index") {
    val a = pairs(10)
    val elems = sc.parallelize(Seq((1L, 1), (1L, 2), (3L, 5), (-1L, 7), (-1L, 8)), 5)
    val agg = a.aggregateUsingIndex(elems, (x: Int, y: Int) => x + y)
    assert(agg.collect().toMap === Map(1L -> 3, 3L -> 5, -1L -> 15))
  }

  test("createUsingIndex rebuilds with last-write-wins") {
    val a = pairs(10)
    val elems = sc.parallelize(Seq((1L, 9), (1L, 11), (2L, 4)), 3)
    val r = a.createUsingIndex(elems)
    assert(r.collect().toMap === Map(1L -> 11, 2L -> 4))
  }

  test("explicit partition count build") {
    val r = IndexedRDD.build(sc.parallelize((1 to 100).map(i => (i.toLong, i)), 4), 16)
    assert(r.partitionsRDD.partitions.length === 16)
    assert(r.partitioner.get === new HashPartitioner(16))
    assert(r.count() === 100)
  }

  test("minKey/maxKey: O(depth) radix descents and hash-layout fallback agree") {
    val data = (-50L to 50L).map(k => (k * 3, k.toInt))
    val ordered = IndexedRDD.ordered(sc.parallelize(data, 4))
    val hashed = IndexedRDD(sc.parallelize(data, 4))
    assert(ordered.minKey() === Some(-150L))
    assert(ordered.maxKey() === Some(150L))
    assert(hashed.minKey() === Some(-150L))
    assert(hashed.maxKey() === Some(150L))
    // extrema track copy-on-write versions
    val v2 = ordered.put(999L, 0)
    assert(v2.maxKey() === Some(999L))
    assert(ordered.maxKey() === Some(150L))
    val v3 = ordered.delete(Array(-150L))
    assert(v3.minKey() === Some(-147L))
    // empty index
    assert(IndexedRDD(sc.parallelize(Seq.empty[(Long, Int)], 2)).minKey() === None)
  }

  test("ordered build: full operator surface + distributed range scan") {
    val r = IndexedRDD.ordered(sc.parallelize((-50L to 50L).map(k => (k, k.toInt * 2)), 4))
    assert(r.count() === 101)
    assert(r.get(-7L) === Some(-14))
    assert(r.multiget(Array(-50L, 0L, 50L, 99L)).size === 3)
    // range runs on every partition without shuffle, pruned trie descent
    val got = r.range(-10L, 10L).collect().toMap
    assert(got === (-10L to 9L).map(k => (k, k.toInt * 2)).toMap)
    // operators still work through the contract defaults
    val j = r.innerJoin(r.filter { case (k, _) => k >= 0 })((_, a, b) => a + b)
    assert(j.count() === 51)
    val v1 = r.put(1000L, 1)
    assert(v1.get(1000L) === Some(1) && r.get(1000L) === None)
  }

  test("rangePartitioned: globally sorted layout prunes partitions for range scans") {
    val r = IndexedRDD.rangePartitioned(
      sc.parallelize((0L until 1000L).map(k => (k, k.toInt)), 8), 8)
    assert(r.count() === 1000)
    val scan = r.range(100L, 200L)
    // partition pruning: the scan job must touch a strict subset
    assert(scan.getNumPartitions < 8)
    assert(scan.collect().toMap === (100L until 200L).map(k => (k, k.toInt)).toMap)
    // point ops still work under the range partitioner
    assert(r.get(555L) === Some(555))
    assert(r.multiget(Array(0L, 999L, 5000L)).size === 2)
  }

  test("selectKthByKey: global rank selection without sort or shuffle") {
    // non-contiguous keys so rank != key
    val keys = (0L until 500L).map(k => k * 3 + 7)
    val r = IndexedRDD.rangePartitioned(
      sc.parallelize(scala.util.Random.shuffle(keys).map(k => (k, ())), 8), 8)
    val sorted = keys.sorted
    val ranks = Array(0L, 1L, 249L, 250L, 498L, 499L)
    assert(r.selectKthByKey(ranks).toSeq === ranks.toSeq.map(i => sorted(i.toInt)))
    // duplicate + unsorted rank requests come back position-aligned
    val dup = Array(499L, 0L, 499L, 42L)
    assert(r.selectKthByKey(dup).toSeq === dup.toSeq.map(i => sorted(i.toInt)))
    assert(r.selectKthByKey(Array.empty[Long]).isEmpty)
    intercept[IllegalArgumentException] { r.selectKthByKey(Array(500L)) }
    intercept[IllegalArgumentException] { r.selectKthByKey(Array(-1L)) }
    // hash-partitioned layouts cannot serve global ranks
    val h = IndexedRDD(sc.parallelize(keys.map(k => (k, ())), 8))
    intercept[IllegalArgumentException] { h.selectKthByKey(Array(0L)) }
  }

  test("String and composite keys work end-to-end") {
    import graft.keys.KeySerializer._
    val s = IndexedRDD(sc.parallelize(Seq(("a", 1), ("b", 2), ("aa", 3)), 2))
    assert(s.multiget(Array("a", "aa", "zz")) === Map("a" -> 1, "aa" -> 3))
    val t = IndexedRDD(sc.parallelize(Seq((("x", 1L), 1), (("x", 2L), 2)), 2))
    assert(t.get(("x", 2L)) === Some(2))
  }
}
