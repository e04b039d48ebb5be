package graft.partition

import scala.collection.immutable.HashMap

/**
 * [[IndexedPartition]] backed by Scala's persistent HAMT
 * (`immutable.HashMap`). Every update path (`multiput`/`delete`/`join`)
 * returns a new partition that shares structure with its parent — the
 * persistent-map analogue of the reference's O(1) ART
 * `snapshot()` + copy-on-write insert (reference
 * PARTPartition.scala:51-69). Old versions remain fully queryable.
 *
 * Probe cost is O(1) expected per key; joins are scan-and-probe with
 * the already-built index, so there is no build phase at query time
 * (reference PARTPartition.scala:177-196).
 */
class HashIndexedPartition[K, V](@transient private[partition] var map: HashMap[K, V])
    extends IndexedPartition[K, V]
    with com.esotericsoftware.kryo.KryoSerializable {

  // Serialization (Java AND Kryo) is a flat (k, v) entry stream, not
  // the default HAMT node-graph encoding: the graph form pays per-node
  // object overhead (plus Kryo reference tracking) on every DISK_ONLY
  // round-trip; the flat form writes exactly the entries and rebuilds
  // the map with the builder on read. The field is a var solely so the
  // read paths can assign it.

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(map.size)
    map.foreach { case (k, v) =>
      out.writeObject(k.asInstanceOf[AnyRef])
      out.writeObject(v.asInstanceOf[AnyRef])
    }
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = HashMap.newBuilder[K, V]
    var i = 0
    while (i < n) {
      val k = in.readObject().asInstanceOf[K]
      val v = in.readObject().asInstanceOf[V]
      b += ((k, v))
      i += 1
    }
    map = b.result()
  }

  override def write(kryo: com.esotericsoftware.kryo.Kryo,
      output: com.esotericsoftware.kryo.io.Output): Unit = {
    output.writeVarInt(map.size, true)
    map.foreach { case (k, v) =>
      kryo.writeClassAndObject(output, k.asInstanceOf[AnyRef])
      kryo.writeClassAndObject(output, v.asInstanceOf[AnyRef])
    }
  }

  override def read(kryo: com.esotericsoftware.kryo.Kryo,
      input: com.esotericsoftware.kryo.io.Input): Unit = {
    val n = input.readVarInt(true)
    val b = HashMap.newBuilder[K, V]
    var i = 0
    while (i < n) {
      val k = kryo.readClassAndObject(input).asInstanceOf[K]
      val v = kryo.readClassAndObject(input).asInstanceOf[V]
      b += ((k, v))
      i += 1
    }
    map = b.result()
  }

  override def size: Long = map.size.toLong

  override def apply(k: K): Option[V] = map.get(k)

  override def isDefined(k: K): Boolean = map.contains(k)

  override def iterator: Iterator[(K, V)] = map.iterator

  /** Tuple-free value walk (the HAMT's foreachEntry). */
  override def foreachValue(f: V => Unit): Unit =
    map.foreachEntry((_, v) => f(v))

  override def multiput[U](kvs: Iterator[(K, U)], z: (K, U) => V,
      f: (K, V, U) => V): IndexedPartition[K, V] = {
    var m = map
    kvs.foreach { case (k, u) =>
      m = m.updated(k, m.get(k) match {
        case Some(old) => f(k, old, u)
        case None      => z(k, u)
      })
    }
    new HashIndexedPartition(m)
  }

  override def delete(ks: Iterator[K]): IndexedPartition[K, V] = {
    var m = map
    ks.foreach(k => m = m.removed(k))
    new HashIndexedPartition(m)
  }

  override def filter(pred: (K, V) => Boolean): IndexedPartition[K, V] =
    new HashIndexedPartition(map.filter { case (k, v) => pred(k, v) })

  override def mapValues[V2](f: (K, V) => V2): IndexedPartition[K, V2] =
    new HashIndexedPartition(map.map { case (k, v) => (k, f(k, v)) })

  override def diff(other: IndexedPartition[K, V]): IndexedPartition[K, V] =
    new HashIndexedPartition(map.filter { case (k, v) =>
      other(k).exists(_ != v)
    })

  override def fullOuterJoin[V2, W](other: IndexedPartition[K, V2])(
      f: (K, Option[V], Option[V2]) => W): IndexedPartition[K, W] = {
    var m = HashMap.empty[K, W]
    // scan this, probe other (covers both-present and this-only)
    map.foreach { case (k, v) => m = m.updated(k, f(k, Some(v), other(k))) }
    // anti half: scan other, keep keys absent from this
    other.iterator.foreach { case (k, v2) =>
      if (!map.contains(k)) m = m.updated(k, f(k, None, Some(v2)))
    }
    new HashIndexedPartition(m)
  }

  override def join[U](other: Iterator[(K, U)])(
      f: (K, V, U) => V): IndexedPartition[K, V] = {
    var m = map
    other.foreach { case (k, u) =>
      m.get(k) match {
        case Some(old) => m = m.updated(k, f(k, old, u))
        case None      => // non-matches keep old value; new keys are NOT inserted
      }
    }
    new HashIndexedPartition(m)
  }

  override def leftJoin[V2, V3](other: IndexedPartition[K, V2])(
      f: (K, V, Option[V2]) => V3): IndexedPartition[K, V3] =
    new HashIndexedPartition(map.map { case (k, v) => (k, f(k, v, other(k))) })

  override def innerJoin[U, V2](other: IndexedPartition[K, U])(
      f: (K, V, U) => V2): IndexedPartition[K, V2] = {
    var m = HashMap.empty[K, V2]
    map.foreach { case (k, v) =>
      other(k) match {
        case Some(u) => m = m.updated(k, f(k, v, u))
        case None    =>
      }
    }
    new HashIndexedPartition(m)
  }

  override def createUsingIndex[V2](elems: Iterator[(K, V2)]): IndexedPartition[K, V2] = {
    var m = HashMap.empty[K, V2]
    elems.foreach { case (k, v2) => m = m.updated(k, v2) } // last write wins
    new HashIndexedPartition(m)
  }

  override def aggregateUsingIndex[V2](elems: Iterator[(K, V2)],
      reduce: (V2, V2) => V2): IndexedPartition[K, V2] = {
    var m = HashMap.empty[K, V2]
    elems.foreach { case (k, v2) =>
      m = m.updated(k, m.get(k) match {
        case Some(acc) => reduce(acc, v2)
        case None      => v2
      })
    }
    new HashIndexedPartition(m)
  }
}

object HashIndexedPartition {

  def empty[K, V]: HashIndexedPartition[K, V] =
    new HashIndexedPartition(HashMap.empty[K, V])

  /** Build from an iterator, resolving duplicate keys with `z`/`f`
    * (semantics of reference PARTPartition.scala:208-225). */
  def apply[K, U, V](iter: Iterator[(K, U)], z: (K, U) => V,
      f: (K, V, U) => V): HashIndexedPartition[K, V] = {
    var m = HashMap.empty[K, V]
    iter.foreach { case (k, u) =>
      m = m.updated(k, m.get(k) match {
        case Some(old) => f(k, old, u)
        case None      => z(k, u)
      })
    }
    new HashIndexedPartition(m)
  }

  /** Build assuming last-write-wins on duplicates. */
  def apply[K, V](iter: Iterator[(K, V)]): HashIndexedPartition[K, V] =
    apply[K, V, V](iter, (_, v) => v, (_, _, v) => v)
}
