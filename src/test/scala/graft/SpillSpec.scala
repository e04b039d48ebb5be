package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spill tolerance (SURVEY §7.5 risk 6): the reference keeps every
 * partition in heap forever (reference build.sbt:40 just raises test
 * heap); our partition contract is serialization-clean, so the cached
 * footprint may exceed executor memory — `MEMORY_AND_DISK(_SER)` /
 * `DISK_ONLY` storage levels put cold partitions on disk and every
 * operator (point read, COW update, join, range) streams them back on
 * demand. These specs run the full operator surface against indexes
 * whose blocks live OUTSIDE the heap of record.
 */
class SpillSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def payload(k: Long): String = s"payload-$k-" + ("x" * 120)

  test("DISK_ONLY index: every query shape correct with zero in-memory blocks") {
    val sc = spark.sparkContext
    val n = 100000L
    val idx = IndexedRDD(sc.parallelize((1L to n).map(k => (k, payload(k))), 8))
      .persist(StorageLevel.DISK_ONLY)
    assert(idx.count() === n) // builds + writes all partitions to disk
    // point reads: only the owning partitions deserialize from disk
    val hits = idx.multiget(Array(1L, 50000L, n, n + 12345L))
    assert(hits.keySet === Set(1L, 50000L, n))
    assert(hits(50000L) === payload(50000L))
    // copy-on-write update over a disk-resident base; old version intact
    val upd = idx.multiput(Map(5L -> "updated", n + 1 -> "inserted"))
    assert(upd.get(5L) === Some("updated"))
    assert(upd.count() === n + 1)
    assert(idx.get(5L) === Some(payload(5L)))
    // index-probe join against the disk-resident base
    val other = sc.parallelize((1L to 1000L).map(k => (k, k * 2)))
    val joined = idx.innerJoin(other)((_, _, u) => u)
    assert(joined.count() === 1000)
    // full scan
    assert(idx.filter { case (k, _) => k % 1000 == 0 }.count() === n / 1000)
    idx.unpersist()
  }

  test("MEMORY_AND_DISK_SER ordered index: range + point paths through the serialized store") {
    val sc = spark.sparkContext
    val idx = IndexedRDD.ordered(sc.parallelize((1L to 50000L).map(k => (k, payload(k))), 8))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    assert(idx.count() === 50000L)
    assert(idx.range(1000L, 1100L).count() === 100)
    assert(idx.multiget(Array(7L, 42L)).size === 2)
    val deleted = idx.delete(Array(7L))
    assert(deleted.get(7L) === None && idx.get(7L).isDefined)
    idx.unpersist()
  }

  test("DISK_ONLY index: lookup join family probes cold partitions correctly") {
    import graft.keys.KeySerializer._
    val sc = spark.sparkContext
    val idx = IndexedRDD.rangePartitioned(
      sc.parallelize((0L until 20000L).map(k => (k, k * 2)), 8), 8)
    idx.persist(StorageLevel.DISK_ONLY)
    idx.count()
    // point lookup join: hits, misses, dup probes
    val probe = sc.parallelize(Seq(5L, 5L, 19999L, 90000L).map(k => (k, s"p$k")), 2)
    val joined = idx.lookupJoinStream(probe)((k, v, u) => (k, v, u))
      .collect().sorted.toSeq
    assert(joined === Seq((5L, 10L, "p5"), (5L, 10L, "p5"),
      (19999L, 39998L, "p19999")))
    // semi/anti
    val keys = sc.parallelize(Seq(1L, 2L, 90000L), 2)
    assert(idx.lookupSemiStream(keys).collect().sorted.toSeq ===
      Seq((1L, 2L), (2L, 4L)))
    assert(idx.lookupSemiStream(keys, anti = true).count() === 19998L)
    // band: pruned range scans from disk
    val bands = sc.parallelize(Seq(((100L, Some(105L)), "a"),
      ((19998L, None), "b")), 2)
    assert(idx.lookupRangeJoinStream(bands)((k, _, u) => (k, u))
      .collect().sorted.toSeq ===
      Seq((100L, "a"), (101L, "a"), (102L, "a"), (103L, "a"), (104L, "a"),
        (19998L, "b"), (19999L, "b")))
    // floor: exact, between, before-first
    val floors = sc.parallelize(Seq[((Long, Option[Long]), String)](
      ((0L, Some(8L)), "x"), ((0L, Some(1L)), "y"),
      ((500L, Some(500L)), "z")), 2)
    assert(idx.lookupFloorStream(floors).collect()
      .map { case (f, u) => (u, f.map(_._1)) }.sortBy(_._1).toSeq ===
      Seq(("x", Some(7L)), ("y", Some(0L)), ("z", None)))
    idx.unpersist()
  }

  test("skewAware build: a stride-skewed key set cannot produce an oversized partition") {
    val sc = spark.sparkContext
    // every key is a multiple of 32 -> hashCode % 32 == 0 -> a vanilla
    // 32-bucket hash build piles ALL 120k rows into partition 0
    val n = 120000L
    val pairs = sc.parallelize((1L to n).map(k => (k * 32L, payload(k))), 8)
    val vanilla = IndexedRDD.build(pairs, 32)
    val vSizes = vanilla.partitionsRDD.map(_.size.toLong).collect()
    assert(vSizes.max === n) // the OOM shape this guards against
    val idx = IndexedRDD.skewAware(pairs, 32, maxRowsPerPartition = 10000L)
      .persist(StorageLevel.DISK_ONLY)
    assert(idx.count() === n)
    val sizes = idx.partitionsRDD.map(_.size.toLong).collect()
    // the cap holds with hash slack: nothing near the old single-bucket
    // pile-up, and the hot bucket's rows spread over its sub-splits
    assert(sizes.max <= 2 * 10000L, s"max=${sizes.max}")
    assert(sizes.count(_ > 0) >= 12)
    // the full operator surface routes through the two-level partitioner
    val hits = idx.multiget(Array(32L, 32000L, n * 32L, 7L))
    assert(hits.keySet === Set(32L, 32000L, n * 32L))
    assert(hits(32000L) === payload(1000L))
    val upd = idx.multiput(Map(64L -> "updated", 1L -> "inserted"))
    assert(upd.get(64L) === Some("updated"))
    assert(upd.get(1L) === Some("inserted"))
    assert(upd.count() === n + 1)
    val probe = sc.parallelize((1L to 500L).map(k => (k * 32L, k)))
    assert(idx.innerJoin(probe)((_, _, u) => u).count() === 500)
    val deleted = idx.delete(Array(32L, 96L))
    assert(deleted.count() === n - 2)
    // IO round-trip: the SplitPartitioner serializes with the save and
    // the reloaded copy keeps pruned point routing
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_skew_io").toString
    graft.IndexedRDDIO.save(idx, path)
    val back = graft.IndexedRDDIO.load[Long, String](sc, path)
    assert(back.partitioner === idx.partitioner)
    assert(back.get(32000L) === Some(payload(1000L)))
    idx.unpersist()
  }

  test("skewAware build with no oversized bucket stays single-level") {
    val sc = spark.sparkContext
    val pairs = sc.parallelize((1L to 50000L).map(k => (k, k * 2.0)), 8)
    val idx = IndexedRDD.skewAware(pairs, 16, maxRowsPerPartition = 10000L)
    assert(idx.partitions.length === 16)
    assert(idx.partitioner.exists(_.isInstanceOf[org.apache.spark.HashPartitioner]))
    assert(idx.get(777L) === Some(1554.0))
  }
}
