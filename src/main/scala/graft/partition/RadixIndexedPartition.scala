package graft.partition

import java.util.Arrays

import graft.keys.KeySerializer

/**
 * Persistent path-compressed radix tree over serialized key bytes — the
 * in-repo analogue of the reference's per-partition ART index
 * (reference PARTPartition.scala:26-31; the external ART library is
 * unavailable offline, SURVEY §7.1). Simplifications vs a full ART:
 * children live in a sorted sparse array at every fanout (no
 * Node4/16/48/256 specialization), which keeps the structure persistent
 * (copy-on-write along the modified path only — the snapshot analogue
 * of `ArtTree.snapshot()`) and keeps iteration in unsigned byte order.
 *
 * Because [[KeySerializer]] encodings are prefix-free, every stored key
 * terminates in a leaf (never on an internal edge), and because the
 * fixed-width encodings are order-preserving, byte-ordered iteration ==
 * numeric key order — which is what makes [[range]] scans meaningful.
 */
object RadixTree {

  sealed trait TNode[+V]
  case object TEmpty extends TNode[Nothing]
  /** Full key bytes kept in the leaf; suffix comparison happens against
    * these (path bytes are implicit in the branch structure). */
  final case class TLeaf[V](key: Array[Byte], value: V) extends TNode[V]
  /** `prefix` = compressed shared bytes below the parent edge;
    * `bytes(i)` = first byte of child i's edge (sorted unsigned). */
  final case class TBranch[V](prefix: Array[Byte], bytes: Array[Int],
      kids: Array[TNode[V]]) extends TNode[V]

  private def commonLen(a: Array[Byte], ao: Int, b: Array[Byte], bo: Int): Int = {
    var i = 0
    while (ao + i < a.length && bo + i < b.length && a(ao + i) == b(bo + i)) i += 1
    i
  }

  /** Insert/update; `merge(old, new)` resolves existing keys. */
  def insert[V](node: TNode[V], key: Array[Byte], depth: Int, value: V,
      merge: (V, V) => V): TNode[V] = node match {
    case TEmpty => TLeaf(key, value)
    case leaf @ TLeaf(k2, v2) =>
      if (Arrays.equals(k2, key)) TLeaf(key, merge(v2, value))
      else {
        val cl = commonLen(key, depth, k2, depth)
        val prefix = Arrays.copyOfRange(key, depth, depth + cl)
        val bNew = key(depth + cl) & 0xff
        val bOld = k2(depth + cl) & 0xff
        val (bs, ks) =
          if (bNew < bOld) (Array(bNew, bOld), Array[TNode[V]](TLeaf(key, value), leaf))
          else (Array(bOld, bNew), Array[TNode[V]](leaf, TLeaf(key, value)))
        TBranch(prefix, bs, ks)
      }
    case br: TBranch[V @unchecked] =>
      val prefix = br.prefix; val bytes = br.bytes; val kids = br.kids
      val cl = commonLen(key, depth, prefix, 0)
      if (cl < prefix.length) {
        // split the compressed edge
        val subBranch = TBranch(Arrays.copyOfRange(prefix, cl + 1, prefix.length),
          bytes, kids)
        val bOld = prefix(cl) & 0xff
        val bNew = key(depth + cl) & 0xff
        val newLeaf = TLeaf(key, value)
        val (bs, ks) =
          if (bNew < bOld) (Array(bNew, bOld), Array[TNode[V]](newLeaf, subBranch))
          else (Array(bOld, bNew), Array[TNode[V]](subBranch, newLeaf))
        TBranch(Arrays.copyOfRange(prefix, 0, cl), bs, ks)
      } else {
        val d = depth + prefix.length
        val b = key(d) & 0xff
        val i = Arrays.binarySearch(bytes, b)
        if (i >= 0) {
          val nk = kids.clone()
          nk(i) = insert(kids(i), key, d + 1, value, merge)
          br.copy(kids = nk)
        } else {
          val ins = -i - 1
          val nb = new Array[Int](bytes.length + 1)
          val nk = new Array[TNode[V]](kids.length + 1)
          System.arraycopy(bytes, 0, nb, 0, ins)
          System.arraycopy(kids, 0, nk, 0, ins)
          nb(ins) = b
          nk(ins) = TLeaf(key, value)
          System.arraycopy(bytes, ins, nb, ins + 1, bytes.length - ins)
          System.arraycopy(kids, ins, nk, ins + 1, kids.length - ins)
          TBranch(prefix, nb, nk)
        }
      }
  }

  def search[V](node: TNode[V], key: Array[Byte], depth: Int): Option[V] = node match {
    case TEmpty => None
    case TLeaf(k2, v) => if (Arrays.equals(k2, key)) Some(v) else None
    case TBranch(prefix, bytes, kids) =>
      val cl = commonLen(key, depth, prefix, 0)
      if (cl < prefix.length) None
      else {
        val d = depth + prefix.length
        if (d >= key.length) None
        else {
          val i = Arrays.binarySearch(bytes, key(d) & 0xff)
          if (i < 0) None else search(kids(i), key, d + 1)
        }
      }
  }

  /** Delete; collapses single-child branches back into their parent edge. */
  def delete[V](node: TNode[V], key: Array[Byte], depth: Int): TNode[V] = node match {
    case TEmpty => TEmpty
    case l @ TLeaf(k2, _) => if (Arrays.equals(k2, key)) TEmpty else l
    case br @ TBranch(prefix, bytes, kids) =>
      val cl = commonLen(key, depth, prefix, 0)
      if (cl < prefix.length) br
      else {
        val d = depth + prefix.length
        if (d >= key.length) br
        else {
          val i = Arrays.binarySearch(bytes, key(d) & 0xff)
          if (i < 0) br
          else delete(kids(i), key, d + 1) match {
            case TEmpty =>
              if (bytes.length == 2) {
                // collapse: splice the surviving child onto this edge
                val j = 1 - i
                kids(j) match {
                  case TLeaf(k2, v) => TLeaf(k2, v)
                  case TBranch(p2, b2, k2s) =>
                    val np = new Array[Byte](prefix.length + 1 + p2.length)
                    System.arraycopy(prefix, 0, np, 0, prefix.length)
                    np(prefix.length) = bytes(j).toByte
                    System.arraycopy(p2, 0, np, prefix.length + 1, p2.length)
                    TBranch(np, b2, k2s)
                  case TEmpty => TEmpty
                }
              } else {
                val nb = new Array[Int](bytes.length - 1)
                val nk = new Array[TNode[V]](kids.length - 1)
                System.arraycopy(bytes, 0, nb, 0, i)
                System.arraycopy(kids, 0, nk, 0, i)
                System.arraycopy(bytes, i + 1, nb, i, bytes.length - i - 1)
                System.arraycopy(kids, i + 1, nk, i, kids.length - i - 1)
                TBranch(prefix, nb, nk)
              }
            case child =>
              val nk = kids.clone()
              nk(i) = child
              br.copy(kids = nk)
          }
        }
      }
  }

  /** DFS in unsigned byte order → keys in serialized-byte order.
    * Explicit-stack traversal: the obvious `kids.iterator.flatMap`
    * nests one iterator per branch level, so every `next()` re-walks
    * the whole chain — full scans paid ~2x in iterator plumbing alone
    * (the profiler's "handle full-scan path" cost). */
  def iterate[V](node: TNode[V]): Iterator[(Array[Byte], V)] = node match {
    case TEmpty => Iterator.empty
    case TLeaf(k, v) => Iterator.single((k, v))
    case root => new scala.collection.AbstractIterator[(Array[Byte], V)] {
      private[this] val stack = new java.util.ArrayDeque[TNode[V]]()
      stack.push(root)
      private[this] var nk: Array[Byte] = null
      private[this] var nv: V = null.asInstanceOf[V]
      private[this] var ready = false
      private[this] def advance(): Unit =
        while (!ready && !stack.isEmpty) {
          stack.pop() match {
            case TLeaf(k, v) => nk = k; nv = v; ready = true
            case TBranch(_, _, kids) =>
              var i = kids.length - 1
              while (i >= 0) { stack.push(kids(i)); i -= 1 }
            case TEmpty => ()
          }
        }
      override def hasNext: Boolean = { advance(); ready }
      override def next(): (Array[Byte], V) = {
        advance()
        if (!ready) throw new NoSuchElementException("empty radix iterator")
        ready = false
        val out = (nk, nv)
        nk = null; nv = null.asInstanceOf[V]
        out
      }
    }
  }

  /** Visit every leaf in DFS (sorted-byte) order with zero iterator or
    * tuple allocation — the fold/serialization fast path. Recursion
    * depth is bounded by the key length (every branch consumes ≥1
    * byte), so the stack stays trivially shallow. */
  def foreachLeaf[V](node: TNode[V])(f: (Array[Byte], V) => Unit): Unit =
    node match {
      case TEmpty => ()
      case TLeaf(k, v) => f(k, v)
      case TBranch(_, _, kids) =>
        var i = 0
        while (i < kids.length) { foreachLeaf(kids(i))(f); i += 1 }
    }

  /** Rebuild a tree from entries already in DFS (unsigned sorted byte)
    * order — O(n·depth), allocating every node array exactly sized.
    * This is the deserialization path: a compact (key, value) stream
    * replaces the node-graph encoding, and the structure rebuilds
    * here. Requires: keys strictly sorted unsigned, prefix-free (both
    * invariants of [[iterate]] output over any valid tree). */
  def fromSorted[V](keys: Array[Array[Byte]], vals: Array[AnyRef],
      lo: Int, hi: Int, depth: Int): TNode[V] = {
    if (hi <= lo) return TEmpty
    if (hi - lo == 1) return TLeaf(keys(lo), vals(lo).asInstanceOf[V])
    // shared prefix of a sorted slice == shared prefix of first & last
    val a = keys(lo)
    val b = keys(hi - 1)
    var cl = 0
    while (depth + cl < a.length && depth + cl < b.length &&
        a(depth + cl) == b(depth + cl)) cl += 1
    val prefix = Arrays.copyOfRange(a, depth, depth + cl)
    val d = depth + cl
    // count child groups by the (differing) byte at d, then fill
    var groups = 0
    var i = lo
    while (i < hi) {
      val b0 = keys(i)(d)
      var j = i + 1
      while (j < hi && keys(j)(d) == b0) j += 1
      groups += 1
      i = j
    }
    val bs = new Array[Int](groups)
    val ks = new Array[TNode[V]](groups)
    var g = 0
    i = lo
    while (i < hi) {
      val b0 = keys(i)(d)
      var j = i + 1
      while (j < hi && keys(j)(d) == b0) j += 1
      bs(g) = b0 & 0xff
      ks(g) = fromSorted(keys, vals, i, j, d + 1)
      g += 1
      i = j
    }
    TBranch(prefix, bs, ks)
  }

  /** Leftmost leaf = smallest key in byte order: one O(depth) descent
    * (children are sorted unsigned), no scan. */
  @annotation.tailrec
  def firstLeaf[V](node: TNode[V]): Option[(Array[Byte], V)] = node match {
    case TEmpty => None
    case TLeaf(k, v) => Some((k, v))
    case TBranch(_, _, kids) => firstLeaf(kids(0))
  }

  /** Rightmost leaf = largest key in byte order. */
  @annotation.tailrec
  def lastLeaf[V](node: TNode[V]): Option[(Array[Byte], V)] = node match {
    case TEmpty => None
    case TLeaf(k, v) => Some((k, v))
    case TBranch(_, _, kids) => lastLeaf(kids(kids.length - 1))
  }

  /** Unsigned lexicographic compare of a[0,aLen) vs b[0,bLen). */
  private def cmpBytes(a: Array[Byte], aLen: Int, b: Array[Byte], bLen: Int): Int = {
    val n = math.min(aLen, bLen)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    aLen - bLen
  }

  /** Keys in [from, to) in byte order, pruning whole subtrees whose path
    * prefix falls outside the bounds. */
  def range[V](node: TNode[V], from: Array[Byte], to: Array[Byte]): Iterator[(Array[Byte], V)] = {
    def inRange(k: Array[Byte]): Boolean =
      cmpBytes(k, k.length, from, from.length) >= 0 &&
        cmpBytes(k, k.length, to, to.length) < 0
    def go(n: TNode[V], path: Array[Byte]): Iterator[(Array[Byte], V)] = n match {
      case TEmpty => Iterator.empty
      case TLeaf(k, v) => if (inRange(k)) Iterator((k, v)) else Iterator.empty
      case TBranch(prefix, bytes, kids) =>
        val p = new Array[Byte](path.length + prefix.length)
        System.arraycopy(path, 0, p, 0, path.length)
        System.arraycopy(prefix, 0, p, path.length, prefix.length)
        kids.iterator.zip(bytes.iterator).flatMap { case (kid, b) =>
          val cp = new Array[Byte](p.length + 1)
          System.arraycopy(p, 0, cp, 0, p.length)
          cp(p.length) = b.toByte
          // subtree keys all start with cp: prune if cp-prefixed space
          // cannot intersect [from, to)
          val n2 = cp.length
          val geFrom = cmpBytes(cp, n2, from, math.min(from.length, n2)) >= 0
          val ltTo = cmpBytes(cp, n2, to, math.min(to.length, n2)) <= 0
          if (geFrom && ltTo) go(kid, cp) else Iterator.empty
        }
    }
    go(node, Array.emptyByteArray)
  }

  /** LARGEST key in [from, to), or None: the mirror of
    * `range(...).take(1)` — descend children RIGHT to left with the
    * same subtree pruning, return the first in-range leaf found. One
    * O(depth) descent on the common path (plus backtracking only over
    * pruned-empty siblings). */
  def lastInRange[V](node: TNode[V], from: Array[Byte],
      to: Array[Byte]): Option[(Array[Byte], V)] = {
    def inRange(k: Array[Byte]): Boolean =
      cmpBytes(k, k.length, from, from.length) >= 0 &&
        cmpBytes(k, k.length, to, to.length) < 0
    def go(n: TNode[V], path: Array[Byte]): Option[(Array[Byte], V)] = n match {
      case TEmpty => None
      case TLeaf(k, v) => if (inRange(k)) Some((k, v)) else None
      case TBranch(prefix, bytes, kids) =>
        val p = new Array[Byte](path.length + prefix.length)
        System.arraycopy(path, 0, p, 0, path.length)
        System.arraycopy(prefix, 0, p, path.length, prefix.length)
        var i = kids.length - 1
        while (i >= 0) {
          val cp = new Array[Byte](p.length + 1)
          System.arraycopy(p, 0, cp, 0, p.length)
          cp(p.length) = bytes(i).toByte
          val n2 = cp.length
          val geFrom = cmpBytes(cp, n2, from, math.min(from.length, n2)) >= 0
          val ltTo = cmpBytes(cp, n2, to, math.min(to.length, n2)) <= 0
          if (geFrom && ltTo) {
            val r = go(kids(i), cp)
            if (r.isDefined) return r
          }
          i -= 1
        }
        None
    }
    go(node, Array.emptyByteArray)
  }
}

/**
 * [[IndexedPartition]] backed by the persistent radix tree: ordered
 * byte-wise index with O(key-length) probes, copy-on-write updates, and
 * pruned [[range]] scans. Join kernels come from the contract defaults
 * (scan-and-probe over this index).
 *
 * Serialization (both Java and Kryo) is CUSTOM: a flat DFS stream of
 * (key bytes, value) entries instead of the default node-graph
 * encoding. The graph form pays per-node object/class overhead (and,
 * under Kryo, reference tracking) on every DISK_ONLY partition
 * round-trip — the dominant cost of cold scans over persisted indexes.
 * The flat form writes exactly the leaves and rebuilds the structure
 * with the sorted bulk-builder [[RadixTree.fromSorted]] on read;
 * search/range/iteration semantics are invariant under the rebuild
 * (maximal path compression is unique for a given key set). Fields are
 * vars solely so the two read paths can assign them.
 */
class RadixIndexedPartition[K, V](
    @transient private[partition] var root: RadixTree.TNode[V],
    @transient private var _size: Long,
    @transient private var ser: KeySerializer[K])
    extends IndexedPartition[K, V]
    with com.esotericsoftware.kryo.KryoSerializable {

  import RadixTree._

  override def size: Long = _size

  private def writeEntries(writeInt: Int => Unit, writeKey: Array[Byte] => Unit,
      writeValue: AnyRef => Unit): Unit = {
    require(_size <= Int.MaxValue, s"partition too large to serialize: ${_size}")
    writeInt(_size.toInt)
    RadixTree.foreachLeaf(root) { (kb, v) =>
      writeInt(kb.length)
      writeKey(kb)
      writeValue(v.asInstanceOf[AnyRef])
    }
  }

  private def readEntries(n: Int, readKey: Int => Array[Byte],
      readValue: () => AnyRef): Unit = {
    val keys = new Array[Array[Byte]](n)
    val vals = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      keys(i) = readKey(i)
      vals(i) = readValue()
      i += 1
    }
    root = RadixTree.fromSorted[V](keys, vals, 0, n, 0)
    _size = n.toLong
  }

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeObject(ser)
    writeEntries(out.writeInt, out.write(_: Array[Byte]), out.writeObject)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    ser = in.readObject().asInstanceOf[KeySerializer[K]]
    val n = in.readInt()
    readEntries(n, { _ =>
      val kl = in.readInt()
      val kb = new Array[Byte](kl)
      in.readFully(kb)
      kb
    }, () => in.readObject())
  }

  override def write(kryo: com.esotericsoftware.kryo.Kryo,
      output: com.esotericsoftware.kryo.io.Output): Unit = {
    kryo.writeClassAndObject(output, ser)
    writeEntries(output.writeVarInt(_, true), output.writeBytes,
      kryo.writeClassAndObject(output, _))
  }

  override def read(kryo: com.esotericsoftware.kryo.Kryo,
      input: com.esotericsoftware.kryo.io.Input): Unit = {
    ser = kryo.readClassAndObject(input).asInstanceOf[KeySerializer[K]]
    val n = input.readVarInt(true)
    readEntries(n, { _ =>
      val kl = input.readVarInt(true)
      input.readBytes(kl)
    }, () => kryo.readClassAndObject(input))
  }

  override def apply(k: K): Option[V] = search(root, ser.toBytes(k), 0)

  override def iterator: Iterator[(K, V)] =
    iterate(root).map { case (kb, v) => (ser.fromBytes(kb), v) }

  /** Zero-allocation leaf walk: no tuples, no key decode. */
  override def foreachValue(f: V => Unit): Unit =
    RadixTree.foreachLeaf(root)((_, v) => f(v))

  /** Smallest key in byte order — one O(depth) leftmost descent, no
    * scan (== natural-order minimum for order-preserving serializers). */
  def firstKey: Option[K] =
    RadixTree.firstLeaf(root).map(kv => ser.fromBytes(kv._1))

  /** Largest key in byte order — one O(depth) rightmost descent. */
  def lastKey: Option[K] =
    RadixTree.lastLeaf(root).map(kv => ser.fromBytes(kv._1))

  /** Entries with serialized(from) <= key < serialized(to), in key-byte
    * order (== numeric order for the fixed-width numeric serializers). */
  def range(from: K, to: K): Iterator[(K, V)] =
    RadixTree.range(root, ser.toBytes(from), ser.toBytes(to))
      .map { case (kb, v) => (ser.fromBytes(kb), v) }

  /** Smallest key in [from, to): the range iterator is lazy with
    * subtree pruning, so its head is one bounded O(depth) descent. */
  def firstInRange(from: K, to: K): Option[K] =
    RadixTree.range(root, ser.toBytes(from), ser.toBytes(to))
      .buffered.headOption.map(kv => ser.fromBytes(kv._1))

  /** Largest key in [from, to) — the mirrored bounded descent. */
  def lastInRange(from: K, to: K): Option[K] =
    RadixTree.lastInRange(root, ser.toBytes(from), ser.toBytes(to))
      .map(kv => ser.fromBytes(kv._1))

  override def multiput[U](kvs: Iterator[(K, U)], z: (K, U) => V,
      f: (K, V, U) => V): IndexedPartition[K, V] = {
    var r = root
    var n = size
    kvs.foreach { case (k, u) =>
      val kb = ser.toBytes(k)
      val existing = search(r, kb, 0)
      val v = existing match {
        case Some(old) => f(k, old, u)
        case None      => n += 1; z(k, u)
      }
      r = insert(r, kb, 0, v, (_: V, nw: V) => nw)
    }
    new RadixIndexedPartition(r, n, ser)
  }

  override def delete(ks: Iterator[K]): IndexedPartition[K, V] = {
    var r = root
    var n = size
    ks.foreach { k =>
      val kb = ser.toBytes(k)
      if (search(r, kb, 0).isDefined) { n -= 1; r = RadixTree.delete(r, kb, 0) }
    }
    new RadixIndexedPartition(r, n, ser)
  }

  override def filter(pred: (K, V) => Boolean): IndexedPartition[K, V] =
    RadixIndexedPartition(iterator.filter { case (k, v) => pred(k, v) })(ser)

  override def mapValues[V2](f: (K, V) => V2): IndexedPartition[K, V2] = {
    def go(n: TNode[V]): TNode[V2] = n match {
      case TEmpty => TEmpty
      case TLeaf(kb, v) => TLeaf(kb, f(ser.fromBytes(kb), v))
      case TBranch(p, bs, kids) => TBranch(p, bs, kids.map(go))
    }
    new RadixIndexedPartition(go(root), size, ser)
  }

  override def createUsingIndex[V2](elems: Iterator[(K, V2)]): IndexedPartition[K, V2] =
    RadixIndexedPartition(elems)(ser)

  /** Compaction rebuild in O(n): the leaves already stream in sorted
    * byte order, so the bulk-builder replaces the generic per-key
    * insertion path (O(n·depth) with copy-on-write garbage). Leaf key
    * bytes and value refs are shared — identical to what the generic
    * rebuild kept — while the NODE structure (the thing compaction
    * exists to un-share) is fresh. */
  override def compacted: IndexedPartition[K, V] = {
    require(_size <= Int.MaxValue, s"partition too large to compact: ${_size}")
    val n = _size.toInt
    val keys = new Array[Array[Byte]](n)
    val vals = new Array[AnyRef](n)
    var i = 0
    RadixTree.foreachLeaf(root) { (kb, v) =>
      keys(i) = kb
      vals(i) = v.asInstanceOf[AnyRef]
      i += 1
    }
    new RadixIndexedPartition(
      RadixTree.fromSorted[V](keys, vals, 0, n, 0), _size, ser)
  }
}

object RadixIndexedPartition {
  def empty[K, V](implicit ser: KeySerializer[K]): RadixIndexedPartition[K, V] =
    new RadixIndexedPartition(RadixTree.TEmpty, 0L, ser)

  /** Build with last-write-wins duplicate handling. */
  def apply[K, V](iter: Iterator[(K, V)])(implicit ser: KeySerializer[K]): RadixIndexedPartition[K, V] =
    empty[K, V].multiput[V](iter, (_, v) => v, (_, _, v) => v)
      .asInstanceOf[RadixIndexedPartition[K, V]]

  /** Build resolving duplicates with z/f. */
  def apply[K, U, V](iter: Iterator[(K, U)], z: (K, U) => V, f: (K, V, U) => V)(
      implicit ser: KeySerializer[K]): RadixIndexedPartition[K, V] =
    empty[K, V].multiput(iter, z, f).asInstanceOf[RadixIndexedPartition[K, V]]
}
