package graft.sql

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual, PrunedFilteredScan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType,
  StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.IndexedRDD
import graft.keys.KeySerializer

/**
 * SQL-visible face of an IndexedRDD: a DataSource relation whose
 * pushed-down key predicates route into index-backed access paths
 * instead of full scans.
 *
 * Catalyst cannot prune cached in-memory partitions by key (SURVEY §4
 * — the core reason this engine exists); exposing the index through
 * `PrunedFilteredScan` closes that gap with public API only:
 *
 *  - `EqualTo`/`In` on the key → partition-pruned `multiget` point read;
 *  - `>`/`>=`/`<`/`<=` on the key (ordered handles, integral keys) →
 *    radix-tree range scan (`IndexedRDD.range`), bounds intersected
 *    across predicates — on [[rangePartitioned]] handles the scan also
 *    prunes PARTITIONS to the overlapping key intervals;
 *  - anything else → indexed full scan with Spark re-applying residual
 *    predicates above us.
 *
 * Values are stored as UnsafeRow (converted ONCE at build from the
 * source plan's internal rows), and `needConversion = false`, so scans
 * and the zip join ([[IndexedJoin]]) never round-trip through external
 * Rows. Keys are generic over [[KeySerializer]] — integral and string
 * key columns ship here; the RDD layer accepts any serializable key.
 */
object IndexedFrame {

  /** Extracts the key from a stored internal row / a pushed literal. */
  private[sql] sealed trait KeyCodec[K] extends Serializable {
    def fromRow(r: InternalRow, i: Int): K
    def fromLiteral(v: Any): K
    /** Range pushdown is sound only when the serializer's byte order is
      * the key's natural order AND bounds can be made half-open. */
    def integral: Boolean
    /** true when `fromLiteral` is an exact inverse of the column's
      * string form — if the codec NORMALIZES (e.g. UUID hex case), the
      * relation must keep the filter "unhandled" so Spark re-applies the
      * original predicate above the probe. */
    def exactLiterals: Boolean = true
    /** Key value back in the COLUMN's external Scala form (the inverse
      * of `fromRow`'s normalization) — what a SQL literal of the column
      * type converts from. */
    def toExternalSql(k: Any): Any = k
  }

  private[sql] final class LongCodec(dt: DataType) extends KeyCodec[Long] {
    override def fromRow(r: InternalRow, i: Int): Long = dt match {
      case LongType => r.getLong(i)
      case IntegerType => r.getInt(i).toLong
      case ShortType => r.getShort(i).toLong
    }
    override def fromLiteral(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case other => throw new IllegalArgumentException(
        s"integral key literal required, got ${if (other == null) "null" else other.getClass}")
    }
    override def integral: Boolean = true
    override def toExternalSql(k: Any): Any = dt match {
      case LongType => k
      case IntegerType => k.asInstanceOf[Long].toInt
      case ShortType => k.asInstanceOf[Long].toShort
    }
  }

  private[sql] object StringCodec extends KeyCodec[String] {
    override def fromRow(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    override def fromLiteral(v: Any): String = v match {
      case s: String => s
      case u: UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"string key literal required, got ${if (other == null) "null" else other.getClass}")
    }
    override def integral: Boolean = false
  }

  /** UUID-string key columns probe through the 16-byte UUID serializer
    * (half the key bytes of the 36-char string form). UUID.fromString
    * NORMALIZES hex case, so literal semantics are not exact: the
    * relation keeps the original predicate for Spark to re-apply, and a
    * malformed literal is simply a non-match, never an error. */
  private[sql] object UuidCodec extends KeyCodec[java.util.UUID] {
    override def fromRow(r: InternalRow, i: Int): java.util.UUID =
      java.util.UUID.fromString(r.getUTF8String(i).toString)
    override def fromLiteral(v: Any): java.util.UUID = v match {
      case s: String => java.util.UUID.fromString(s)
      case u: UTF8String => java.util.UUID.fromString(u.toString)
      case u: java.util.UUID => u
      case other => throw new IllegalArgumentException(
        s"uuid key literal required, got ${if (other == null) "null" else other.getClass}")
    }
    override def integral: Boolean = false
    override def exactLiterals: Boolean = false
    override def toExternalSql(k: Any): Any = k.toString
  }

  /** The join surface [[IndexedJoin]] plans against, implemented by
    * single-key AND composite handles: the type-erased index, the key
    * column list (one or two — a zip join must equate EVERY component
    * in order), and a tag two handles must share for their erased key
    * types to zip safely. */
  private[sql] trait JoinableHandle {
    private[sql] def idxAny: IndexedRDD[Any, InternalRow]
    private[sql] def joinKeyCols: Seq[String]
    /** Equal tags ⇒ equal runtime key types (zip/partitioner safe). */
    private[sql] def keyTypeTag: String
  }

  /** The stats surface [[IndexedAgg]] plans against, implemented by
    * single-key AND composite handles: `count(*)` from index sizes and
    * — when the index can answer them in the column's natural order —
    * `min/max` of ONE column from O(depth) radix descents, already
    * converted to the column's external Scala form (a SQL literal of
    * the column type converts from it directly; UUID handles hand back
    * the canonical string, Int/Short keys narrow back from Long). */
  private[sql] trait StatsCapable {
    /** Column whose min/max the index answers in natural order, if any. */
    private[sql] def statsKeyCol: Option[String]
    /** (count, min, max) in ONE job; extrema only when requested AND
      * [[statsKeyCol]] is defined, in external SQL form. */
    private[sql] def statsAll(withExtrema: Boolean): (Long, Option[Any], Option[Any])
    private[sql] def markStats(): Unit
  }

  /** An indexed table handle: the versioned index plus its SQL schema.
    * `lastScanKind` records, for observability and tests, how the most
    * recent scan was served: "point" / "range" / "full"; for point
    * scans `lastPointLookupKeys` is the probed key count. */
  class Handle[K](val idx: IndexedRDD[K, InternalRow], val keyCol: String,
      val schema: StructType, val ordered: Boolean,
      private[sql] val codec: KeyCodec[K])(
      implicit private[sql] val kTag: ClassTag[K],
      private[sql] val kSer: KeySerializer[K]) extends Serializable
      with StatsCapable with JoinableHandle {
    @transient @volatile var lastScanKind: String = ""
    @transient @volatile var lastPointLookupKeys: Int = -1

    private[sql] def keyIndex: Int = schema.fieldIndex(keyCol)

    override private[sql] def idxAny: IndexedRDD[Any, InternalRow] =
      idx.asInstanceOf[IndexedRDD[Any, InternalRow]]
    override private[sql] def joinKeyCols: Seq[String] = Seq(keyCol)
    override private[sql] def keyTypeTag: String = kTag.runtimeClass.getName

    /** Index-answered key extrema (no scan on radix layouts) — natural
      * order only when the serializer is order-preserving, which the
      * stats pushdown checks via [[statsKeyCol]]. */
    private[sql] def minKeyAny(): Option[Any] = idx.minKey()(kSer)
    private[sql] def maxKeyAny(): Option[Any] = idx.maxKey()(kSer)
    private[sql] def keyStatsAny(): (Long, Option[Any], Option[Any]) = idx.keyStats()(kSer)
    private[sql] def orderPreservingKey: Boolean = kSer.isOrderPreserving

    override private[sql] def statsKeyCol: Option[String] =
      if (ordered && kSer.isOrderPreserving) Some(keyCol) else None
    override private[sql] def statsAll(
        withExtrema: Boolean): (Long, Option[Any], Option[Any]) =
      if (withExtrema) {
        val (c, mn, mx) = keyStatsAny()
        (c, mn.map(codec.toExternalSql), mx.map(codec.toExternalSql))
      } else (idx.count(), None, None)
    override private[sql] def markStats(): Unit = { lastScanKind = "stats" }

    /** Copy-on-write upsert of full (external) rows, returning a new
      * handle that shares partition structure with this one. */
    def upsert(rows: Seq[Row]): Handle[K] = {
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      val proj = UnsafeProjection.create(schema)
      val ki = keyIndex
      val kvs = rows.map { r =>
        val ir = proj(conv(r).asInstanceOf[InternalRow]).copy()
        (codec.fromRow(ir, ki), ir: InternalRow)
      }.toMap
      new Handle(idx.multiput(kvs), keyCol, schema, ordered, codec)
    }

    def toDF(implicit spark: SparkSession): DataFrame =
      spark.baseRelationToDataFrame(new IndexedRelation(this)(spark.sqlContext))
  }

  /** Internal rows of `df` keyed+copied once (no external conversion),
    * ready for index build. Null keys are rejected — the index is a
    * key-unique map and NULL never equals anything in SQL. */
  private def pairs[K](df: DataFrame, keyCol: String,
      codec: KeyCodec[K]): RDD[(K, InternalRow)] = {
    val ki = df.schema.fieldIndex(keyCol)
    df.queryExecution.toRdd.mapPartitions(_.map { r =>
      if (r.isNullAt(ki))
        throw new IllegalArgumentException(s"null key in column $keyCol")
      (codec.fromRow(r, ki), r.copy(): InternalRow)
    })
  }

  private def codecFor(schema: StructType, keyCol: String): KeyCodec[_] =
    schema(keyCol).dataType match {
      case dt @ (LongType | IntegerType | ShortType) => new LongCodec(dt)
      case StringType => StringCodec
      case other => throw new IllegalArgumentException(
        s"unsupported key column type ${other.catalogString} (integral or string required)")
    }

  /** Shared build path: key+copy the internal rows, optionally force a
    * partition count (co-partitioned handles zip-join without a
    * shuffle), build hash or radix partitions, pin. */
  private def buildHandle[K: ClassTag: KeySerializer](df: DataFrame, keyCol: String,
      codec: KeyCodec[K], ordered: Boolean, numPartitions: Int): Handle[K] = {
    val raw = pairs(df, keyCol, codec)
    val p =
      if (numPartitions > 0) raw.partitionBy(new org.apache.spark.HashPartitioner(numPartitions))
      else raw
    val idx = if (ordered) IndexedRDD.ordered(p) else IndexedRDD(p)
    new Handle(idx.cached, keyCol, df.schema, ordered, codec)
  }

  private def requireString(df: DataFrame, keyCol: String): Unit =
    require(df.schema(keyCol).dataType == StringType,
      s"string key column required, got ${df.schema(keyCol).dataType.catalogString}")

  /** Index a DataFrame by an integral key column (key uniqueness
    * enforced, last write wins) and pin the built index. `ordered=true`
    * builds radix-tree partitions, enabling pushed range predicates;
    * `numPartitions` forces a partition count so that two handles built
    * with the same count are co-partitioned (their SQL joins plan as
    * narrow zip joins — see [[IndexedJoin]]). */
  def index(df: DataFrame, keyCol: String, ordered: Boolean = false,
      numPartitions: Int = 0): Handle[Long] = {
    val codec = codecFor(df.schema, keyCol) match {
      case lc: LongCodec => lc
      case _ => throw new IllegalArgumentException(
        s"index() requires an integral key column; use indexString for ${df.schema(keyCol).dataType.catalogString}")
    }
    buildHandle(df, keyCol, codec, ordered, numPartitions)
  }

  /** Index by a STRING key column: pushed equality/IN predicates route
    * into partition-pruned point reads exactly like integral keys (the
    * RDD layer is generic over [[KeySerializer]]). `ordered = true`
    * keys the radix tries through
    * [[KeySerializer.StringLexSerializer]], whose byte order IS the
    * UTF8-binary string order Spark and DuckDB compare in — pushed
    * string ranges (`BETWEEN`, `<`, `>=`, ...) become trie range scans
    * and SQL `min/max(keyCol)` becomes O(depth) radix descents. */
  def indexString(df: DataFrame, keyCol: String, ordered: Boolean = false,
      numPartitions: Int = 0): Handle[String] = {
    requireString(df, keyCol)
    if (ordered)
      buildHandle(df, keyCol, StringCodec, ordered = true, numPartitions)(
        implicitly[ClassTag[String]], KeySerializer.StringLexSerializer)
    else buildHandle(df, keyCol, StringCodec, ordered = false, numPartitions)
  }

  /** RANGE-PARTITIONED string handle: keys globally sorted in UTF-8
    * binary order (RangePartitioner under
    * [[KeySerializer.Utf8StringOrdering]] — NOT Java's UTF-16 natural
    * order, which diverges beyond the BMP) with lex-keyed radix tries
    * inside each partition, so a pushed string BETWEEN prunes to only
    * the partitions whose key interval overlaps — the string twin of
    * [[indexRangePartitioned]]. */
  def indexStringRangePartitioned(df: DataFrame, keyCol: String,
      numPartitions: Int): Handle[String] = {
    requireString(df, keyCol)
    implicit val ord: Ordering[String] = KeySerializer.Utf8StringOrdering
    implicit val ser: KeySerializer[String] = KeySerializer.StringLexSerializer
    val idx = IndexedRDD.rangePartitioned(
      pairs(df, keyCol, StringCodec), numPartitions)
    new Handle(idx.cached, keyCol, df.schema, ordered = true, StringCodec)
  }

  /** Index by a STRING column holding canonical UUIDs: keys serialize
    * as 16 bytes (msb‖lsb) instead of 36 chars; pushed equality/IN
    * routes into partition-pruned point reads. Keys ride
    * [[KeySerializer.UuidLexSerializer]] (raw big-endian, byte order ==
    * canonical-string order), so `ordered = true` handles answer SQL
    * `min/max(keyCol)` from radix descents in the STRING column's own
    * order. */
  def indexUuid(df: DataFrame, keyCol: String, ordered: Boolean = false,
      numPartitions: Int = 0): Handle[java.util.UUID] = {
    requireString(df, keyCol)
    buildHandle(df, keyCol, UuidCodec, ordered, numPartitions)(
      implicitly[ClassTag[java.util.UUID]], KeySerializer.UuidLexSerializer)
  }

  /** COMPOSITE two-column key handle (reference treats Tuple2 keys as
    * first-class — Tuple2Serializer, reference KeySerializer.scala:
    * 145-176): rows are indexed by the (leading, second) integral pair
    * through the Tuple2 serializer, and pushed predicates route as
    *
    *  - conjunctive equality/IN on BOTH columns → partition-pruned
    *    `multiget` over the cross product of the pushed key sets;
    *  - equality or range on the LEADING column alone (ordered
    *    handles) → radix-trie range scan over the tuple byte space —
    *    fixed-width components make the tuple encoding's byte order
    *    the lexicographic (a, b) order, so a leading-column interval
    *    is one contiguous byte range;
    *  - anything else → indexed full scan, Spark re-applies residuals.
    */
  class CompositeHandle(val idx: graft.IndexedRDD[(Long, Long), InternalRow],
      val keyColA: String, val keyColB: String, val schema: StructType,
      val ordered: Boolean,
      private[sql] val codecA: LongCodec, private[sql] val codecB: LongCodec)
      extends Serializable with StatsCapable with JoinableHandle {
    @transient @volatile var lastScanKind: String = ""
    @transient @volatile var lastPointLookupKeys: Int = -1

    private[sql] implicit val tupSer: KeySerializer[(Long, Long)] =
      KeySerializer.tuple2Serializer[Long, Long]

    override private[sql] def idxAny: IndexedRDD[Any, InternalRow] =
      idx.asInstanceOf[IndexedRDD[Any, InternalRow]]
    override private[sql] def joinKeyCols: Seq[String] = Seq(keyColA, keyColB)
    override private[sql] def keyTypeTag: String = "composite:long,long"

    /** Fixed-width components give the tuple encoding a CONSTANT length
      * prefix, so unsigned byte order == lexicographic (a, b) order: the
      * byte-extreme tuple's first component IS the leading column's
      * natural extremum. min/max of the SECOND column alone are not
      * index-answerable and fall through to the default planner. */
    override private[sql] def statsKeyCol: Option[String] =
      if (ordered) Some(keyColA) else None
    override private[sql] def statsAll(
        withExtrema: Boolean): (Long, Option[Any], Option[Any]) =
      if (withExtrema) {
        val (c, mn, mx) = idx.keyStats()
        (c, mn.map(t => codecA.toExternalSql(t._1)), mx.map(t => codecA.toExternalSql(t._1)))
      } else (idx.count(), None, None)
    override private[sql] def markStats(): Unit = { lastScanKind = "stats" }

    def toDF(implicit spark: SparkSession): DataFrame =
      spark.baseRelationToDataFrame(new CompositeRelation(this)(spark.sqlContext))
  }

  /** Shared composite build front: codecs + keyed internal-row pairs. */
  private def compositePairs(df: DataFrame, keyColA: String, keyColB: String):
      (LongCodec, LongCodec, RDD[((Long, Long), InternalRow)]) = {
    def longCodec(c: String): LongCodec = codecFor(df.schema, c) match {
      case lc: LongCodec => lc
      case _ => throw new IllegalArgumentException(
        s"composite key requires integral columns, got ${df.schema(c).dataType.catalogString} for $c")
    }
    val (ca, cb) = (longCodec(keyColA), longCodec(keyColB))
    val (ia, ib) = (df.schema.fieldIndex(keyColA), df.schema.fieldIndex(keyColB))
    val raw = df.queryExecution.toRdd.mapPartitions(_.map { r =>
      if (r.isNullAt(ia) || r.isNullAt(ib))
        throw new IllegalArgumentException(
          s"null key in composite ($keyColA, $keyColB)")
      ((ca.fromRow(r, ia), cb.fromRow(r, ib)), r.copy(): InternalRow)
    })
    (ca, cb, raw)
  }

  /** Index a DataFrame by TWO integral key columns (composite key,
    * uniqueness enforced over the pair, last write wins). `ordered=true`
    * builds radix partitions so leading-column ranges push down. */
  def indexComposite(df: DataFrame, keyColA: String, keyColB: String,
      ordered: Boolean = false, numPartitions: Int = 0): CompositeHandle = {
    val (ca, cb, raw) = compositePairs(df, keyColA, keyColB)
    val p =
      if (numPartitions > 0) raw.partitionBy(new org.apache.spark.HashPartitioner(numPartitions))
      else raw
    val idx = if (ordered) graft.IndexedRDD.ordered(p) else graft.IndexedRDD(p)
    new CompositeHandle(idx.cached, keyColA, keyColB, df.schema, ordered, ca, cb)
  }

  /** RANGE-PARTITIONED composite handle: (a, b) pairs globally sorted
    * in lexicographic order across `numPartitions` partitions with a
    * radix tree inside each. The fixed-width tuple serializer is
    * order-preserving, so pushed leading-column intervals AND the
    * a-point × b-range mixed lane prune PARTITIONS
    * (IndexedRDD.range/multiRange under a RangePartitioner) before
    * descending the per-partition tries — O(range) tasks at 100 TB,
    * the composite twin of [[indexRangePartitioned]]. */
  def indexCompositeRangePartitioned(df: DataFrame, keyColA: String,
      keyColB: String, numPartitions: Int): CompositeHandle = {
    val (ca, cb, raw) = compositePairs(df, keyColA, keyColB)
    implicit val tupSer: KeySerializer[(Long, Long)] =
      KeySerializer.tuple2Serializer[Long, Long]
    val idx = graft.IndexedRDD.rangePartitioned(raw, numPartitions)
    new CompositeHandle(idx.cached, keyColA, keyColB, df.schema,
      ordered = true, ca, cb)
  }

  /** Driver-side probe budgets for the composite relation: above
    * [[PointKeyBudget]] cross-product keys the point lane bails (two
    * 10k-element IN lists would otherwise ship 10^8 probe keys to the
    * executors); above [[MixedLeadCap]] distinct leading values the
    * mixed a-point × b-range lane bails. Bailing is always sound —
    * the filters stay "unhandled" and Spark re-applies them above the
    * wider lane that serves instead. */
  private[sql] val PointKeyBudget = 10000L
  private[sql] val MixedLeadCap = 64

  private[sql] class CompositeRelation(private[sql] val h: CompositeHandle)(
      @transient override val sqlContext: SQLContext)
      extends BaseRelation with PrunedFilteredScan {

    override def schema: StructType = h.schema
    override def needConversion: Boolean = false

    private def parsed(codec: LongCodec, v: Any): Option[Long] =
      scala.util.Try(codec.fromLiteral(v)).toOption

    /** Point key set pushed on ONE of the two key columns. */
    private def pointKeysOn(col: String, codec: LongCodec,
        f: Filter): Option[Set[Long]] = f match {
      case EqualTo(`col`, null) => Some(Set.empty)
      case EqualTo(`col`, v) => Some(parsed(codec, v).toSet)
      case In(`col`, vs) =>
        Some(vs.iterator.filter(_ != null).flatMap(parsed(codec, _)).toSet)
      case _ => None
    }

    /** Leading-column interval [from, to) from one pushed filter —
      * EqualTo included (a prefix scan). Empty marker mirrors the
      * single-key relation's overflow guard. */
    private def leadBounds(f: Filter): Option[(Long, Long)] = {
      def lit(v: Any): Long = h.codecA.fromLiteral(v)
      f match {
        case EqualTo(h.keyColA, null) => Some((Long.MaxValue, Long.MinValue)) // empty
        case EqualTo(h.keyColA, v) =>
          val a = lit(v)
          Some((a, if (a == Long.MaxValue) Long.MaxValue else a + 1))
        case GreaterThan(h.keyColA, v) if v != null =>
          if (lit(v) == Long.MaxValue) Some((Long.MaxValue, Long.MinValue))
          else Some((lit(v) + 1, Long.MaxValue))
        case GreaterThanOrEqual(h.keyColA, v) if v != null => Some((lit(v), Long.MaxValue))
        case LessThan(h.keyColA, v) if v != null => Some((Long.MinValue, lit(v)))
        case LessThanOrEqual(h.keyColA, v) if v != null =>
          Some((Long.MinValue, if (lit(v) == Long.MaxValue) Long.MaxValue else lit(v) + 1))
        case _ => None
      }
    }

    /** SECOND-column interval [from, to) from one pushed RANGE filter
      * (equality on b rides the point lane, not this one). Same
      * conventions as [[leadBounds]]: half-open, (MaxValue, MinValue)
      * empty marker, to == MaxValue means unbounded above. */
    private def bBounds(f: Filter): Option[(Long, Long)] = {
      def lit(v: Any): Long = h.codecB.fromLiteral(v)
      f match {
        case GreaterThan(h.keyColB, v) if v != null =>
          if (lit(v) == Long.MaxValue) Some((Long.MaxValue, Long.MinValue))
          else Some((lit(v) + 1, Long.MaxValue))
        case GreaterThanOrEqual(h.keyColB, v) if v != null => Some((lit(v), Long.MaxValue))
        case LessThan(h.keyColB, v) if v != null => Some((Long.MinValue, lit(v)))
        case LessThanOrEqual(h.keyColB, v) if v != null =>
          Some((Long.MinValue, if (lit(v) == Long.MaxValue) Long.MaxValue else lit(v) + 1))
        case _ => None
      }
    }

    /** The access path for one pushed filter set. `unhandledFilters`
      * and `buildScan` both route through this, so the filters the
      * relation CLAIMS are exactly the ones the chosen lane ENFORCES. */
    private sealed trait Lane
    private case class PointLane(as: Set[Long], bs: Set[Long]) extends Lane
    /** a ∈ as (≤ [[MixedLeadCap]]) × b ∈ [bFrom, bTo): one disjoint
      * trie interval per leading value, served in one multiRange pass. */
    private case class MixedLane(as: Seq[Long], bFrom: Long, bTo: Long) extends Lane
    private case class LeadLane(from: Long, to: Long) extends Lane
    private case object FullLane extends Lane

    private def chooseLane(filters: Array[Filter]): Lane = {
      val aSets = filters.flatMap(pointKeysOn(h.keyColA, h.codecA, _))
      val bSets = filters.flatMap(pointKeysOn(h.keyColB, h.codecB, _))
      val bRanges = if (h.ordered) filters.flatMap(bBounds) else Array.empty[(Long, Long)]
      val leads = if (h.ordered) filters.flatMap(leadBounds) else Array.empty[(Long, Long)]
      lazy val as = aSets.reduce(_ intersect _)
      if (aSets.nonEmpty && bSets.nonEmpty) {
        val bs = bSets.reduce(_ intersect _)
        if (as.size.toLong * bs.size <= PointKeyBudget) return PointLane(as, bs)
      }
      if (aSets.nonEmpty && bRanges.nonEmpty && as.size <= MixedLeadCap) {
        val bFrom = bRanges.map(_._1).max
        val bTo = bRanges.map(_._2).min
        return MixedLane(as.toSeq.sorted, bFrom, bTo)
      }
      if (leads.nonEmpty) LeadLane(leads.map(_._1).max, leads.map(_._2).min)
      else FullLane
    }

    override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
      chooseLane(filters) match {
        case _: PointLane =>
          // multiget enforces every pushed point filter exactly (AND
          // semantics via set intersection + cross product); ranges
          // pushed alongside are re-applied by Spark above the probe
          filters.filter(f => pointKeysOn(h.keyColA, h.codecA, f).isEmpty &&
            pointKeysOn(h.keyColB, h.codecB, f).isEmpty)
        case _: MixedLane =>
          // a-point sets (intersected) and b-intervals (intersected)
          // are enforced exactly by the per-leading-value trie scans
          filters.filter(f => pointKeysOn(h.keyColA, h.codecA, f).isEmpty &&
            bBounds(f).isEmpty)
        case _: LeadLane =>
          // leading-column intervals (equality included) are enforced
          // exactly by the trie range scan; everything else re-applies
          filters.filter(f => leadBounds(f).isEmpty)
        case FullLane => filters
      }

    /** Rows of one leading-column tuple interval, corner-completed:
      * range() is half-open, so an unbounded-above second component
      * (bTo == MaxValue) needs the exact (a, MaxValue) probes too. */
    private def emptyInterval(from: Long, to: Long): Boolean =
      from >= to && !(from == Long.MaxValue && to == Long.MaxValue)

    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): RDD[Row] = {
      import h.tupSer
      val rows: RDD[InternalRow] = chooseLane(filters) match {
        case PointLane(as, bs) =>
          val keys = (for (a <- as; b <- bs) yield (a, b)).toArray
          h.lastScanKind = "point"
          h.lastPointLookupKeys = keys.length
          val hit = h.idx.multiget(keys).values.toSeq
          sqlContext.sparkContext.parallelize(hit, 1)
        case MixedLane(as, bFrom, bTo) =>
          h.lastScanKind = "range"
          h.lastPointLookupKeys = -1
          if (emptyInterval(bFrom, bTo) || as.isEmpty) {
            sqlContext.sparkContext.emptyRDD[InternalRow]
          } else {
            // one disjoint tuple interval per leading value — a single
            // multiRange pass, each interval one O(depth) trie descent
            val body = h.idx.multiRange(as.map(a => ((a, bFrom), (a, bTo)))).map(_._2)
            if (bTo == Long.MaxValue) {
              val corner = h.idx.multiget(as.map(a => (a, Long.MaxValue)).toArray)
                .values.toSeq
              if (corner.nonEmpty)
                body.union(sqlContext.sparkContext.parallelize(corner, 1))
              else body
            } else body
          }
        case LeadLane(from, to) =>
          h.lastScanKind = "range"
          h.lastPointLookupKeys = -1
          if (emptyInterval(from, to)) {
            sqlContext.sparkContext.emptyRDD[InternalRow]
          } else {
            // tuple byte range [(from, min), (to, min)) covers every
            // second-column value for leading keys in [from, to)
            val body = h.idx.range((from, Long.MinValue), (to, Long.MinValue))
              .map(_._2)
            if (to == Long.MaxValue) {
              // unbounded above: a = MaxValue rows sit beyond the
              // half-open scan — one bounded range + one exact probe
              // complete the interval
              val tail = h.idx.range(
                (Long.MaxValue, Long.MinValue), (Long.MaxValue, Long.MaxValue))
                .map(_._2)
              val corner = h.idx.multiget(Array((Long.MaxValue, Long.MaxValue)))
                .values.toSeq
              val all = body.union(tail)
              if (corner.nonEmpty) all.union(sqlContext.sparkContext.parallelize(corner, 1))
              else all
            } else body
          }
        case FullLane =>
          h.lastScanKind = "full"
          h.lastPointLookupKeys = -1
          h.idx.map(_._2)
      }
      val fields = requiredColumns.map(h.schema.fieldIndex).map(i =>
        BoundReference(i, h.schema.fields(i).dataType, h.schema.fields(i).nullable))
      rows.mapPartitions { it =>
        val proj = UnsafeProjection.create(fields.toIndexedSeq)
        it.map(r => proj(r))
      }.asInstanceOf[RDD[Row]]
    }
  }

  /** RANGE-PARTITIONED ordered handle: keys are globally sorted across
    * `numPartitions` partitions (RangePartitioner) with a radix tree
    * inside each, so a pushed BETWEEN prunes to only the partitions
    * whose key interval overlaps the bounds — O(range) tasks instead of
    * O(partitions). The layout of choice for range-heavy SQL at scale. */
  def indexRangePartitioned(df: DataFrame, keyCol: String,
      numPartitions: Int): Handle[Long] = {
    val codec = codecFor(df.schema, keyCol) match {
      case lc: LongCodec => lc
      case _ => throw new IllegalArgumentException("integral key column required")
    }
    val idx = IndexedRDD.rangePartitioned(pairs(df, keyCol, codec), numPartitions)
    new Handle(idx.cached, keyCol, df.schema, ordered = true, codec)
  }

  /** Persist a handle: the index itself in [[graft.IndexedRDDIO]]'s
    * one-file-per-partition layout (partitioner included) plus a
    * `_frame` meta file (key column, orderedness, codec tag, schema).
    * Reloading re-attaches everything — point reads, range pushdown,
    * and narrow joins work immediately, with no shuffle or rebuild. */
  def save(h: Handle[_], path: String): Unit = {
    graft.IndexedRDDIO.save(
      h.idx.asInstanceOf[graft.IndexedRDD[Any, InternalRow]], path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      org.apache.spark.graftbridge.ConfBridge.broadcast(
        h.idx.sparkContext).value)
    val out = new java.io.ObjectOutputStream(fs.create(
      new org.apache.hadoop.fs.Path(path, "_frame"), true))
    val tag = h.codec match {
      case _: LongCodec => "long"
      case StringCodec => "string"
      case UuidCodec => "uuid"
    }
    try {
      out.writeObject(h.keyCol); out.writeBoolean(h.ordered)
      out.writeObject(tag); out.writeObject(h.schema.json)
    } finally out.close()
  }

  /** Persist a COMPOSITE handle: same one-file-per-partition index
    * layout as the single-key [[save]], with a `_frame` meta tagged
    * "composite" carrying BOTH key columns + orderedness. Reload with
    * [[loadComposite]] — point, leading-range, and mixed pushdown all
    * work immediately from the reloaded copy, no rebuild. */
  def save(h: CompositeHandle, path: String): Unit = {
    graft.IndexedRDDIO.save(
      h.idx.asInstanceOf[graft.IndexedRDD[Any, InternalRow]], path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      org.apache.spark.graftbridge.ConfBridge.broadcast(
        h.idx.sparkContext).value)
    val out = new java.io.ObjectOutputStream(fs.create(
      new org.apache.hadoop.fs.Path(path, "_frame"), true))
    try {
      out.writeObject(h.keyColA); out.writeBoolean(h.ordered)
      out.writeObject("composite"); out.writeObject(h.schema.json)
      out.writeObject(h.keyColB)
    } finally out.close()
  }

  /** Reload a composite handle saved by [[save(h:CompositeHandle*]]. */
  def loadComposite(spark: SparkSession, path: String): CompositeHandle = {
    val sc = spark.sparkContext
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri, sc.hadoopConfiguration)
    val in = new java.io.ObjectInputStream(fs.open(
      new org.apache.hadoop.fs.Path(path, "_frame")))
    val (keyColA, ordered, tag, schemaJson, keyColB) =
      try (in.readObject().asInstanceOf[String], in.readBoolean(),
        in.readObject().asInstanceOf[String], in.readObject().asInstanceOf[String],
        in.readObject().asInstanceOf[String])
      finally in.close()
    require(tag == "composite", s"not a composite handle at $path (tag '$tag'); use load")
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    def longCodec(c: String): LongCodec = codecFor(schema, c).asInstanceOf[LongCodec]
    implicit val tupSer: KeySerializer[(Long, Long)] =
      KeySerializer.tuple2Serializer[Long, Long]
    new CompositeHandle(
      graft.IndexedRDDIO.load[(Long, Long), InternalRow](sc, path).cached,
      keyColA, keyColB, schema, ordered, longCodec(keyColA), longCodec(keyColB))
  }

  /** Reload a saved handle (see [[save]]); the key type is restored
    * from the saved codec tag. */
  def load(spark: SparkSession, path: String): Handle[_] = {
    val sc = spark.sparkContext
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri, sc.hadoopConfiguration)
    val in = new java.io.ObjectInputStream(fs.open(
      new org.apache.hadoop.fs.Path(path, "_frame")))
    val (keyCol, ordered, tag, schemaJson) =
      try (in.readObject().asInstanceOf[String], in.readBoolean(),
        in.readObject().asInstanceOf[String], in.readObject().asInstanceOf[String])
      finally in.close()
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    tag match {
      case "long" =>
        val codec = codecFor(schema, keyCol).asInstanceOf[LongCodec]
        new Handle[Long](graft.IndexedRDDIO.load[Long, InternalRow](sc, path).cached,
          keyCol, schema, ordered, codec)
      case "string" if ordered =>
        // ordered string handles are keyed by the LEX serializer; the
        // reloaded handle must probe and range with the same encoding
        new Handle[String](graft.IndexedRDDIO.load[String, InternalRow](
          sc, path)(implicitly[ClassTag[String]],
          KeySerializer.StringLexSerializer, implicitly[ClassTag[InternalRow]]).cached,
          keyCol, schema, ordered, StringCodec)(
          implicitly[ClassTag[String]], KeySerializer.StringLexSerializer)
      case "string" =>
        new Handle[String](graft.IndexedRDDIO.load[String, InternalRow](sc, path).cached,
          keyCol, schema, ordered, StringCodec)
      case "uuid" =>
        new Handle[java.util.UUID](
          graft.IndexedRDDIO.load[java.util.UUID, InternalRow](sc, path).cached,
          keyCol, schema, ordered, UuidCodec)(
          implicitly[ClassTag[java.util.UUID]], KeySerializer.UuidLexSerializer)
      case "composite" => throw new IllegalArgumentException(
        s"composite handle at $path: use loadComposite")
    }
  }

  private[sql] class IndexedRelation[K](private[sql] val h: Handle[K])(
      @transient override val sqlContext: SQLContext)
      extends BaseRelation with PrunedFilteredScan {

    override def schema: StructType = h.schema

    /** Rows out of buildScan are already UnsafeRow — no external
      * conversion layer. */
    override def needConversion: Boolean = false

    /** A literal the codec cannot parse (e.g. a non-UUID string against
      * a uuid handle) equals no stored key — a non-match, not an error. */
    private def parsed(v: Any): Option[K] =
      scala.util.Try(h.codec.fromLiteral(v)).toOption

    private def pointKeys(f: Filter): Option[Set[K]] = f match {
      case EqualTo(h.keyCol, null) => Some(Set.empty) // NULL never matches
      case EqualTo(h.keyCol, v) => Some(parsed(v).toSet)
      // NULL/unparseable elements in an IN list never match — drop them
      case In(h.keyCol, vs) =>
        Some(vs.iterator.filter(_ != null).flatMap(parsed).toSet)
      case _ => None
    }

    /** Key range [from, to) implied by one pushed filter, if any —
      * integral keys only. `k > Long.MaxValue` yields an empty range
      * (overflow guard); upper bounds reaching Long.MaxValue are
      * handled inclusively in the scan (see buildScan). */
    private def rangeBounds(f: Filter): Option[(Long, Long)] = {
      def lit(v: Any): Long = h.codec.fromLiteral(v).asInstanceOf[Long]
      f match {
        case GreaterThan(h.keyCol, v) if v != null =>
          if (lit(v) == Long.MaxValue) Some((Long.MaxValue, Long.MinValue)) // empty
          else Some((lit(v) + 1, Long.MaxValue))
        case GreaterThanOrEqual(h.keyCol, v) if v != null => Some((lit(v), Long.MaxValue))
        case LessThan(h.keyCol, v) if v != null => Some((Long.MinValue, lit(v)))
        case LessThanOrEqual(h.keyCol, v) if v != null =>
          Some((Long.MinValue, if (lit(v) == Long.MaxValue) Long.MaxValue else lit(v) + 1))
        case _ => None
      }
    }

    private def rangeCapable: Boolean = h.ordered && h.codec.integral

    /** Ordered STRING handles (lex serializer: byte order == UTF8
      * binary order) serve pushed string ranges from the trie. The
      * normalizing uuid codec is excluded by `exactLiterals`. */
    private def stringRangeCapable: Boolean =
      h.ordered && !h.codec.integral && h.codec.exactLiterals && h.kSer.isOrderPreserving

    /** String interval (from, toExclusive) from one pushed filter —
      * either side None = unbounded. Inclusive bounds convert to
      * half-open via the immediate string successor `s + NUL`. */
    private def strBounds(f: Filter): Option[(Option[String], Option[String])] = {
      def s(v: Any): Option[String] = v match {
        case x: String => Some(x)
        case u: UTF8String => Some(u.toString)
        case _ => None
      }
      f match {
        case GreaterThan(h.keyCol, v) if v != null =>
          s(v).map(x => (Some(x + 0.toChar), None))
        case GreaterThanOrEqual(h.keyCol, v) if v != null =>
          s(v).map(x => (Some(x), None))
        case LessThan(h.keyCol, v) if v != null => s(v).map(x => (None, Some(x)))
        case LessThanOrEqual(h.keyCol, v) if v != null =>
          s(v).map(x => (None, Some(x + 0.toChar)))
        case _ => None
      }
    }

    override def unhandledFilters(filters: Array[Filter]): Array[Filter] = {
      // range filters are fully handled ONLY on ordered handles whose
      // byte order is the column's comparison order (integral keys, or
      // lex-keyed strings) AND when no point filter is pushed alongside
      // them — the point branch of buildScan ignores bounds, so mixed
      // predicates must be re-applied by Spark above the scan. A
      // NORMALIZING codec (uuid) never claims point filters: the probe
      // may return a row whose string form differs from the literal, so
      // Spark must re-check the original predicate.
      val anyPoint = filters.exists(f => pointKeys(f).isDefined)
      filters.filter(f => !(h.codec.exactLiterals && pointKeys(f).isDefined) &&
        !(rangeCapable && !anyPoint && rangeBounds(f).isDefined) &&
        !(stringRangeCapable && !anyPoint && strBounds(f).isDefined))
    }

    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): RDD[Row] = {
      val keySets = filters.flatMap(pointKeys)
      val bounds =
        if (rangeCapable) filters.flatMap(rangeBounds) else Array.empty[(Long, Long)]
      val sBounds =
        if (stringRangeCapable) filters.flatMap(strBounds)
        else Array.empty[(Option[String], Option[String])]
      val rows: RDD[InternalRow] =
        if (keySets.nonEmpty) {
          // AND semantics across pushed filters: intersect every key set
          val keys = keySets.reduce(_ intersect _).toArray(h.kTag)
          h.lastScanKind = "point"
          h.lastPointLookupKeys = keys.length
          val hit = h.idx.multiget(keys).values.toSeq
          sqlContext.sparkContext.parallelize(hit, 1)
        } else if (bounds.nonEmpty) {
          // intersect all pushed bounds into one [from, to)
          val from = bounds.map(_._1).max
          val to = bounds.map(_._2).min
          h.lastScanKind = "range"
          h.lastPointLookupKeys = -1
          val hl = h.asInstanceOf[Handle[Long]]
          if (from >= to && !(from == Long.MaxValue && to == Long.MaxValue)) {
            sqlContext.sparkContext.emptyRDD[InternalRow]
          } else {
            val body = hl.idx.range(from, to)(hl.kSer).map(_._2)
            // range() is half-open, so an upper bound of Long.MaxValue
            // (i.e. unbounded above) must also admit a MaxValue key
            if (to == Long.MaxValue) {
              val maxHit = hl.idx.multiget(Array(Long.MaxValue)).values.toSeq
              if (maxHit.nonEmpty) body.union(sqlContext.sparkContext.parallelize(maxHit, 1))
              else body
            } else body
          }
        } else if (sBounds.nonEmpty) {
          // string interval over the lex-keyed trie: intersect pushed
          // bounds in ENCODED byte order (string order == byte order
          // for the lex serializer; Java String.compareTo is UTF-16
          // order and disagrees beyond the BMP)
          val hs = h.asInstanceOf[Handle[String]]
          def enc(x: String): Array[Byte] = hs.kSer.toBytes(x)
          val from = sBounds.flatMap(_._1).reduceOption { (a, b) =>
            if (java.util.Arrays.compareUnsigned(enc(a), enc(b)) >= 0) a else b
          }.getOrElse("") // the empty string is the global minimum
          // unbounded above closes at succ(maxKey) — one O(depth)
          // descent; an empty index answers with no rows
          val toOpt = sBounds.flatMap(_._2).reduceOption { (a, b) =>
            if (java.util.Arrays.compareUnsigned(enc(a), enc(b)) <= 0) a else b
          }.orElse(hs.idx.maxKey()(hs.kSer).map(_ + 0.toChar))
          h.lastScanKind = "range"
          h.lastPointLookupKeys = -1
          toOpt match {
            case Some(to)
                if java.util.Arrays.compareUnsigned(enc(from), enc(to)) < 0 =>
              hs.idx.range(from, to)(hs.kSer).map(_._2)
            case _ => sqlContext.sparkContext.emptyRDD[InternalRow]
          }
        } else {
          h.lastScanKind = "full"
          h.lastPointLookupKeys = -1
          h.idx.map(_._2)
        }
      // prune columns with one reused per-partition projection; rows are
      // consumed streaming by the scan node (which re-projects), so no
      // per-row copy is needed
      val fields = requiredColumns.map(h.schema.fieldIndex).map(i =>
        BoundReference(i, h.schema.fields(i).dataType, h.schema.fields(i).nullable))
      rows.mapPartitions { it =>
        val proj = UnsafeProjection.create(fields.toIndexedSeq)
        it.map(r => proj(r))
      }.asInstanceOf[RDD[Row]]
    }
  }
}
