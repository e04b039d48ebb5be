package graft.partition

/**
 * Contract for one indexed partition of an [[graft.IndexedRDD]]: a
 * single-node, immutable, point-queryable map `K -> V` supporting
 * copy-on-write updates and scan-and-probe join kernels.
 *
 * Semantics mirror the reference partition contract (reference
 * IndexedRDDPartition.scala:31-148) but the physical layout is ours:
 * implementations must be persistent data structures so that every
 * update returns a new partition sharing structure with the old one
 * (the reference achieves this with an ART `snapshot()`,
 * PARTPartition.scala:53). All implementations must survive Java and
 * Kryo serialization round-trips.
 *
 * Join kernels take another partition (or raw iterator) that is
 * already co-located — alignment/shuffling is the RDD layer's job.
 */
trait IndexedPartition[K, V] extends Serializable {

  def size: Long

  /** Point lookup. */
  def apply(k: K): Option[V]

  def isDefined(k: K): Boolean = apply(k).isDefined

  /** Full scan. */
  def iterator: Iterator[(K, V)]

  /** Visit every VALUE without per-entry tuple allocation (and, for
    * layouts that store serialized keys, without key decoding) — the
    * fast path for scan-shaped consumers that ignore the key. */
  def foreachValue(f: V => Unit): Unit = iterator.foreach(kv => f(kv._2))

  /** Batch point lookup; emits only present keys. */
  def multiget(ks: Array[K]): Iterator[(K, V)] =
    ks.iterator.flatMap(k => apply(k).map(v => (k, v)))

  /** Copy-on-write upsert batch: `z(k, u)` projects inserts, `f(k, old, u)`
    * merges updates. */
  def multiput[U](kvs: Iterator[(K, U)], z: (K, U) => V, f: (K, V, U) => V): IndexedPartition[K, V]

  /** Copy-on-write delete batch. */
  def delete(ks: Iterator[K]): IndexedPartition[K, V]

  /** Keep entries satisfying the predicate; key alignment preserved. */
  def filter(pred: (K, V) => Boolean): IndexedPartition[K, V]

  /** Map values (with key in scope); key set and alignment preserved. */
  def mapValues[V2](f: (K, V) => V2): IndexedPartition[K, V2]

  /** Rebuild from new elements (last write wins on duplicate keys). */
  def createUsingIndex[V2](elems: Iterator[(K, V2)]): IndexedPartition[K, V2]

  /** Fresh, self-contained rebuild: same flavor and contents, but no
    * structural sharing with ancestor copy-on-write versions and no
    * deferred state (a lazy union compacts to its merged form). The
    * building block of snapshot compaction — a compacted partition
    * retains nothing from the version chain that produced it. */
  def compacted: IndexedPartition[K, V] = createUsingIndex(iterator)

  // Scan-and-probe kernels below have generic default implementations in
  // terms of iterator/apply/multiput/createUsingIndex; implementations
  // may override with layout-specific versions.

  /** Keys present in BOTH sides whose values differ, keeping THIS side's
    * value (changeset extraction between two versions). */
  def diff(other: IndexedPartition[K, V]): IndexedPartition[K, V] =
    filter((k, v) => other(k).exists(_ != v))

  /** Full outer join. */
  def fullOuterJoin[V2, W](other: IndexedPartition[K, V2])(
      f: (K, Option[V], Option[V2]) => W): IndexedPartition[K, W] =
    createUsingIndex(
      iterator.map { case (k, v) => (k, f(k, Some(v), other(k))) } ++
        other.iterator.collect {
          case (k, v2) if !isDefined(k) => (k, f(k, None, Some(v2)))
        })

  /** Left outer join updating matched values in place; unmatched keys keep
    * their old value (upsert-flavored join, value type preserved). */
  def join[U](other: Iterator[(K, U)])(f: (K, V, U) => V): IndexedPartition[K, V] =
    multiput(other.filter { case (k, _) => isDefined(k) },
      (_: K, _: U) => throw new IllegalStateException("join never inserts"), f)

  /** Left outer join with free result type. */
  def leftJoin[V2, V3](other: IndexedPartition[K, V2])(
      f: (K, V, Option[V2]) => V3): IndexedPartition[K, V3] =
    createUsingIndex(iterator.map { case (k, v) => (k, f(k, v, other(k))) })

  /** Inner join. */
  def innerJoin[U, V2](other: IndexedPartition[K, U])(
      f: (K, V, U) => V2): IndexedPartition[K, V2] =
    createUsingIndex(iterator.flatMap { case (k, v) =>
      other(k).map(u => (k, f(k, v, u)))
    })

  /** Reduce-by-key over `elems`; keys absent from this index are KEPT
    * (the existing index is a layout hint, not a semantic filter). */
  def aggregateUsingIndex[V2](elems: Iterator[(K, V2)],
      reduce: (V2, V2) => V2): IndexedPartition[K, V2] = {
    var m = scala.collection.immutable.HashMap.empty[K, V2]
    elems.foreach { case (k, v2) =>
      m = m.updated(k, m.get(k) match {
        case Some(acc) => reduce(acc, v2)
        case None      => v2
      })
    }
    createUsingIndex(m.iterator)
  }

  /** Collapse any deferred structure (lazy delta chains) into a single
    * materialized index. No-op for eager implementations. */
  def reindex: IndexedPartition[K, V] = this
}
