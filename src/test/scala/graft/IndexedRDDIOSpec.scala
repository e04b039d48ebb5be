package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite


/** Index persistence: a saved index reloads with its partitioner —
  * point reads and narrow joins work with no shuffle and no rebuild. */
class IndexedRDDIOSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  private def sc = spark.sparkContext

  test("save/load round-trips entries, partitioner, and point reads") {
    val dir = Files.createTempDirectory("graft-io").toString
    val idx = IndexedRDD(sc.parallelize((1L to 1000L).map(k => (k, k * 2)), 8))
    IndexedRDDIO.save(idx, s"$dir/idx")
    val loaded = IndexedRDDIO.load[Long, Long](sc, s"$dir/idx")
    assert(loaded.partitioner === idx.partitioner)
    assert(loaded.count() === 1000L)
    assert(loaded.multiget(Array(1L, 500L, 1000L, 5000L)) ===
      Map(1L -> 2L, 500L -> 1000L, 1000L -> 2000L))
    assert(loaded.collect().toMap === idx.collect().toMap)
  }

  test("loaded index joins the original NARROWLY (co-partitioned, zero shuffle)") {
    val dir = Files.createTempDirectory("graft-io").toString
    val idx = IndexedRDD(sc.parallelize((1L to 200L).map(k => (k, k)), 4))
    IndexedRDDIO.save(idx, s"$dir/idx")
    val loaded = IndexedRDDIO.load[Long, Long](sc, s"$dir/idx")
    val joined = loaded.innerJoin(idx)((_, a, b) => a + b)
    // narrow co-partitioned path: no shuffle between the join output and
    // either input index (the original's BUILD shuffle is upstream of
    // the stop set and does not count)
    val stop = Set(loaded.partitionsRDD.id, idx.partitionsRDD.id)
    def hasShuffle(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
      !stop.contains(rdd.id) && rdd.dependencies.exists {
        case _: org.apache.spark.ShuffleDependency[_, _, _] => true
        case d => hasShuffle(d.rdd)
      }
    assert(!hasShuffle(joined))
    assert(joined.collect().toMap === (1L to 200L).map(k => (k, 2 * k)).toMap)
  }

  test("empty partitions and updates after load survive the round trip") {
    val dir = Files.createTempDirectory("graft-io").toString
    // 8 partitions, only a few keys -> some partitions empty
    val idx = IndexedRDD(sc.parallelize(Seq((1L, "a"), (2L, "b")), 8))
    IndexedRDDIO.save(idx, s"$dir/idx")
    val loaded = IndexedRDDIO.load[Long, String](sc, s"$dir/idx")
    assert(loaded.count() === 2)
    val updated = loaded.put(99L, "z")
    assert(updated.get(99L) === Some("z") && loaded.get(99L) === None)
  }

  test("range-partitioned index reloads with pruned range scans intact") {
    val dir = Files.createTempDirectory("graft-io").toString
    val idx = IndexedRDD.rangePartitioned(
      sc.parallelize((1L to 1000L).map(k => (k, k)), 8), 8)
    IndexedRDDIO.save(idx, s"$dir/idx")
    val loaded = IndexedRDDIO.load[Long, Long](sc, s"$dir/idx")
    assert(loaded.partitioner === idx.partitioner)
    assert(loaded.range(100L, 200L).collect().toMap ===
      (100L until 200L).map(k => (k, k)).toMap)
  }

  test("RangePartitioner heals after a Kryo round-trip (pins the evidence$2 reflection)") {
    // Spark's RangePartitioner custom (de)serialization under a
    // non-Java data serializer restores every functional field but
    // leaves its private ClassTag null; a healed partitioner must
    // Java-serialize again (the driver-side task-closure path that
    // NPE'd in r21 before IndexedRDDIO.load healed it). This test pins
    // the reflective field name against Spark upgrades: if Spark
    // renames it, the find() below fails loudly instead of the heal
    // silently becoming a no-op.
    val idx = IndexedRDD.rangePartitioned(
      sc.parallelize((1L to 1000L).map(k => (k, k)), 8), 8)
    val p = idx.partitioner.get
    assume(p.isInstanceOf[org.apache.spark.RangePartitioner[_, _]])
    val f = p.getClass.getDeclaredFields
      .find(_.getName.endsWith("evidence$2"))
    assert(f.isDefined,
      "Spark renamed RangePartitioner's ClassTag field — update " +
        "IndexedRDDIO.healRangePartitioner to match")
    f.get.setAccessible(true)
    val kryo = new org.apache.spark.serializer.KryoSerializer(
      new org.apache.spark.SparkConf).newInstance()
    val rt = kryo.deserialize[org.apache.spark.Partitioner](
      kryo.serialize(p))(scala.reflect.ClassTag(p.getClass))
    IndexedRDDIO.healRangePartitioner[Long](rt)
    assert(f.get.get(rt) != null,
      "healRangePartitioner left the ClassTag null")
    // the post-heal partitioner must survive Java serialization (what
    // a downstream job's task closure does)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(rt)
    oos.close()
    assert(bos.size() > 0)
  }
}
