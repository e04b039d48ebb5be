package graft.partition

/**
 * A deferred union-with-merge view over a chain of partitions
 * ("deltas") sharing one binary reducer — the partition-level engine
 * behind lazy keyed union (reference LazyPartition.scala:29-136).
 *
 * Point lookups probe every delta and reduce multi-hits
 * (reference LazyPartition.scala:43-67) WITHOUT materializing; any
 * operator that needs the whole key space forces a one-time merge into
 * a single [[HashIndexedPartition]] (reference `cached`,
 * LazyPartition.scala:36-37). Chaining lazy unions flattens into one
 * delta list rather than nesting views (reference
 * IndexedRDD.scala:360-378).
 *
 * The merged form is cached transiently: serializing the partition
 * ships only the deltas, and the merge re-runs on first full-scan use
 * at the destination.
 */
class LazyIndexedPartition[K, V](
    private[partition] val deltas: Vector[IndexedPartition[K, V]],
    private[partition] val reduce: (V, V) => V)
    extends IndexedPartition[K, V] {

  require(deltas.nonEmpty, "lazy partition needs at least one delta")

  @transient private lazy val forced: IndexedPartition[K, V] = {
    val agg = HashIndexedPartition.empty[K, V]
    agg.aggregateUsingIndex(deltas.iterator.flatMap(_.iterator), reduce)
  }

  override def apply(k: K): Option[V] =
    deltas.iterator.flatMap(_.apply(k)).reduceOption(reduce)

  override def isDefined(k: K): Boolean = deltas.exists(_.isDefined(k))

  override def size: Long = forced.size

  override def iterator: Iterator[(K, V)] = forced.iterator

  override def foreachValue(f: V => Unit): Unit = forced.foreachValue(f)

  override def multiget(ks: Array[K]): Iterator[(K, V)] =
    ks.iterator.flatMap(k => apply(k).map(v => (k, v)))

  override def reindex: IndexedPartition[K, V] = forced

  // Structural operators force the merge first — correctness over
  // deferral (the reference pushes `filter` into deltas,
  // LazyPartition.scala:75-76, which changes semantics when the
  // predicate inspects reduced values; we do not reproduce that).
  override def multiput[U](kvs: Iterator[(K, U)], z: (K, U) => V,
      f: (K, V, U) => V): IndexedPartition[K, V] = forced.multiput(kvs, z, f)
  override def delete(ks: Iterator[K]): IndexedPartition[K, V] = forced.delete(ks)
  override def filter(pred: (K, V) => Boolean): IndexedPartition[K, V] = forced.filter(pred)
  override def mapValues[V2](f: (K, V) => V2): IndexedPartition[K, V2] = forced.mapValues(f)
  override def diff(other: IndexedPartition[K, V]): IndexedPartition[K, V] = forced.diff(other)
  override def fullOuterJoin[V2, W](other: IndexedPartition[K, V2])(
      f: (K, Option[V], Option[V2]) => W): IndexedPartition[K, W] =
    forced.fullOuterJoin(other)(f)
  override def join[U](other: Iterator[(K, U)])(f: (K, V, U) => V): IndexedPartition[K, V] =
    forced.join(other)(f)
  override def leftJoin[V2, V3](other: IndexedPartition[K, V2])(
      f: (K, V, Option[V2]) => V3): IndexedPartition[K, V3] = forced.leftJoin(other)(f)
  override def innerJoin[U, V2](other: IndexedPartition[K, U])(
      f: (K, V, U) => V2): IndexedPartition[K, V2] = forced.innerJoin(other)(f)
  override def createUsingIndex[V2](elems: Iterator[(K, V2)]): IndexedPartition[K, V2] =
    forced.createUsingIndex(elems)
  // the merged form IS a fresh single-delta rebuild — reuse it rather
  // than re-iterating it into a second copy
  override def compacted: IndexedPartition[K, V] = forced
  override def aggregateUsingIndex[V2](elems: Iterator[(K, V2)],
      reduce2: (V2, V2) => V2): IndexedPartition[K, V2] =
    forced.aggregateUsingIndex(elems, reduce2)
}

object LazyIndexedPartition {
  /** Lazy keyed union of two partitions under `reduce`. A lazy operand's
    * delta list is flattened into the new chain only when its reducer is
    * reference-equal to `reduce` — flattening under a DIFFERENT reducer
    * would re-merge its deltas with the wrong function (e.g.
    * `a.unionWith(b, _+_).unionWith(c, math.max)` must not re-reduce the
    * a/b deltas with max). Otherwise the lazy operand is kept NESTED as
    * a single delta: point probes recurse into it with its own reducer,
    * and a full-scan merge forces it first (reference
    * IndexedRDD.scala:360-378 nests the same way). */
  def union[K, V](a: IndexedPartition[K, V], b: IndexedPartition[K, V],
      reduce: (V, V) => V): LazyIndexedPartition[K, V] = {
    def flat(p: IndexedPartition[K, V]): Vector[IndexedPartition[K, V]] = p match {
      case l: LazyIndexedPartition[K, V] if l.reduce eq reduce => l.deltas
      case e => Vector(e) // plain partition, or lazy view with its own reducer
    }
    new LazyIndexedPartition(flat(a) ++ flat(b), reduce)
  }
}
