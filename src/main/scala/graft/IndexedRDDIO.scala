package graft

import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.reflect.ClassTag

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.{Partition, Partitioner, SparkContext, TaskContext}
import org.apache.spark.graftbridge.{ConfBridge, HadoopConfBroadcast}
import org.apache.spark.rdd.RDD

import graft.keys.KeySerializer
import graft.partition.IndexedPartition

/**
 * Persistence for the indexed representation itself: [[save]] writes one
 * file per partition (whole [[IndexedPartition]] objects, Java
 * serialization over the Hadoop FileSystem API — local FS, HDFS, or any
 * object-store connector) plus the partitioner; [[load]] re-attaches the
 * SAVED partitioner to a one-file-per-partition RDD, so the reloaded
 * index answers point reads and joins immediately — no shuffle, no
 * index rebuild, no scan. This is the engine's "sink": the reference
 * has only `collect`/RDD actions (reference IndexedRDD.scala:40).
 *
 * At scale this is the difference between re-ingesting 100 TB to
 * rebuild indexes and re-opening them: load cost is one read per
 * partition, and co-partitioned joins against other indexes saved with
 * the same partitioner stay narrow.
 */
object IndexedRDDIO {

  /** Save the index: `path/part-NNNNN` per partition + `path/_partitioner`.
    * The session's Hadoop configuration is broadcast to the writer tasks
    * so `spark.hadoop.*` settings (object-store credentials, defaultFS)
    * apply on executors. */
  def save[K, V](rdd: IndexedRDD[K, V], path: String): Long = {
    val p = rdd.partitioner.get
    val n = rdd.partitionsRDD.getNumPartitions
    val sc = rdd.sparkContext
    val confBc = ConfBridge.broadcast(sc)
    // the write pass already touches every partition, so the exact row
    // count rides back for free — callers persist it so reloaded
    // handles can answer stats (and Catalyst sizeInBytes) with ZERO
    // jobs instead of a full deserializing count at first planning
    val total = rdd.partitionsRDD.mapPartitionsWithIndex { (pid, it) =>
      val fs = FileSystem.get(new Path(path).toUri, confBc.value)
      val out = new ObjectOutputStream(new BufferedOutputStream(
        fs.create(new Path(path, f"part-$pid%05d"), true)))
      // empty partitions write null; load substitutes an empty index
      val part = if (it.hasNext) it.next() else null
      try out.writeObject(part)
      finally out.close()
      Iterator.single(if (part == null) 0L else part.size.toLong)
    }.fold(0L)(_ + _)
    val fs = FileSystem.get(new Path(path).toUri, sc.hadoopConfiguration)
    val meta = new ObjectOutputStream(fs.create(new Path(path, "_partitioner"), true))
    try { meta.writeInt(n); meta.writeObject(p) }
    finally meta.close()
    total
  }

  /** Reload a saved index. The saved partitioner (hash OR range) is
    * re-attached, so key routing and narrow joins work immediately. */
  def load[K: ClassTag: KeySerializer, V: ClassTag](
      sc: SparkContext, path: String): IndexedRDD[K, V] = {
    val fs = FileSystem.get(new Path(path).toUri, sc.hadoopConfiguration)
    val meta = new ObjectInputStream(fs.open(new Path(path, "_partitioner")))
    val (n, p) =
      try (meta.readInt(), meta.readObject().asInstanceOf[Partitioner])
      finally meta.close()
    healRangePartitioner[K](p)
    new IndexedRDD(new LoadedPartitionsRDD[K, V](
      sc, path, n, p, ConfBridge.broadcast(sc)))
  }

  /** Spark's RangePartitioner has custom (de)serialization that, under
    * a NON-Java `spark.serializer` (Kryo), restores every functional
    * field but leaves its private `evidence$2` ClassTag null — it is
    * only consumed by `writeObject`, so a LOADED partitioner routes
    * keys fine but NPEs the moment it is serialized again (e.g. into
    * a task closure of a downstream job). Executors never re-serialize
    * a partitioner, so stock Spark never trips this; a driver-side
    * save/load round-trip does. Restore the tag reflectively (the
    * field is `evidence$2` in Spark 4.1.x; a rename makes this a
    * no-op and the Java-serializer path never needs it). */
  private[graft] def healRangePartitioner[K: ClassTag](p: Partitioner): Unit =
    p match {
      case rp: org.apache.spark.RangePartitioner[_, _] =>
        try {
          val f = rp.getClass.getDeclaredFields
            .find(_.getName.endsWith("evidence$2"))
          f.foreach { fl =>
            fl.setAccessible(true)
            if (fl.get(rp) == null) fl.set(rp, implicitly[ClassTag[K]])
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }

  private class LoadedPartition(override val index: Int) extends Partition

  /** One partition per saved file, exposing the saved partitioner. */
  private class LoadedPartitionsRDD[K, V](sc: SparkContext, path: String,
      n: Int, p: Partitioner, confBc: HadoopConfBroadcast)
      extends RDD[IndexedPartition[K, V]](sc, Nil) {

    override protected def getPartitions: Array[Partition] =
      Array.tabulate(n)(new LoadedPartition(_))

    override val partitioner: Option[Partitioner] = Some(p)

    override def compute(split: Partition, ctx: TaskContext): Iterator[IndexedPartition[K, V]] = {
      val fs = FileSystem.get(new Path(path).toUri, confBc.value)
      val in = new ObjectInputStream(new BufferedInputStream(
        fs.open(new Path(path, f"part-${split.index}%05d"))))
      try Iterator.single(
        Option(in.readObject().asInstanceOf[IndexedPartition[K, V]])
          .getOrElse(graft.partition.HashIndexedPartition.empty[K, V]))
      finally in.close()
    }
  }
}
