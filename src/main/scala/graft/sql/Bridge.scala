package graft.sql

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

import graft.IndexedRDD
import graft.keys.KeySerializer

/**
 * Two-way bridge between [[graft.IndexedRDD]] and the Dataset world.
 *
 * The reference engine has no relational surface at all (reference
 * SURVEY §2.7) — aggregates, windows, sorts, set ops and SQL come from
 * Catalyst via this bridge: parquet sources flow in through
 * `fromDataset`, and `toDS` exposes an index back to Catalyst so the
 * optimizer (pushdown, whole-stage codegen, AQE) handles everything
 * downstream of the keyed operators.
 */
object Bridge {

  /** Index a typed pair Dataset (e.g. read from parquet). */
  def fromDataset[K: ClassTag: KeySerializer, V: ClassTag](
      ds: Dataset[(K, V)]): IndexedRDD[K, V] =
    IndexedRDD(ds.rdd)

  /** Index with an explicit partition count (decouple index parallelism
    * from source-scan parallelism at scale). */
  def fromDataset[K: ClassTag: KeySerializer, V: ClassTag](
      ds: Dataset[(K, V)], numPartitions: Int): IndexedRDD[K, V] =
    IndexedRDD.build(ds.rdd, numPartitions)

  implicit class RichIndexedRDD[K, V](private val self: IndexedRDD[K, V]) {
    /** Back to Catalyst-land. */
    def toDS(implicit spark: SparkSession, enc: Encoder[(K, V)]): Dataset[(K, V)] =
      spark.createDataset(self: RDD[(K, V)])
  }
}
