package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual, PrunedFilteredScan}
import org.apache.spark.sql.types.StructType

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
 *  - `>`/`>=`/`<`/`<=` on the key (ordered handles) → radix-tree range
 *    scan (`IndexedRDD.range`), bounds intersected across predicates;
 *  - anything else → indexed full scan with Spark re-applying residual
 *    predicates above us.
 */
object IndexedFrame {

  /** An indexed table handle: the versioned index plus its SQL schema.
    * `lastScanKind` records, for observability and tests, how the most
    * recent scan was served: "point" / "range" / "full"; for point
    * scans `lastPointLookupKeys` is the probed key count. */
  class Handle(val idx: IndexedRDD[Long, Row], val keyCol: String,
      val schema: StructType, val ordered: Boolean) extends Serializable {
    @transient @volatile var lastScanKind: String = ""
    @transient @volatile var lastPointLookupKeys: Int = -1

    /** Copy-on-write upsert of full rows, returning a new handle that
      * shares partition structure with this one. */
    def upsert(rows: Seq[Row]): Handle = {
      val ki = schema.fieldIndex(keyCol)
      new Handle(idx.multiput(rows.map(r => (toLongKey(r.get(ki)), r)).toMap),
        keyCol, schema, ordered)
    }

    def toDF(implicit spark: SparkSession): DataFrame =
      spark.baseRelationToDataFrame(new IndexedRelation(this)(spark.sqlContext))
  }

  /** Index a DataFrame by a long-typed key column (key uniqueness
    * enforced, last write wins) and pin the built index. `ordered=true`
    * builds radix-tree partitions, enabling pushed range predicates;
    * `numPartitions` forces a partition count so that two handles built
    * with the same count are co-partitioned (their SQL joins plan as
    * narrow zip joins — see [[IndexedJoin]]). */
  def index(df: DataFrame, keyCol: String, ordered: Boolean = false,
      numPartitions: Int = 0): Handle = {
    val schema = df.schema
    val ki = schema.fieldIndex(keyCol)
    val raw = df.rdd.map(r => (toLongKey(r.get(ki)), r))
    val pairs =
      if (numPartitions > 0)
        raw.partitionBy(new org.apache.spark.HashPartitioner(numPartitions))
      else raw
    val idx = if (ordered) IndexedRDD.ordered(pairs) else IndexedRDD(pairs)
    new Handle(idx.cached, keyCol, schema, ordered)
  }

  private def toLongKey(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case other => throw new IllegalArgumentException(
      s"integral key required, got ${if (other == null) "null" else other.getClass}")
  }

  private[sql] class IndexedRelation(private[sql] val h: Handle)(
      @transient override val sqlContext: SQLContext)
      extends BaseRelation with PrunedFilteredScan {

    override def schema: StructType = h.schema

    override def needConversion: Boolean = true

    private def pointKeys(f: Filter): Option[Set[Long]] = f match {
      case EqualTo(h.keyCol, null) => Some(Set.empty) // NULL never matches
      case EqualTo(h.keyCol, v) => Some(Set(toLongKey(v)))
      // NULL elements in an IN list never match — drop them
      case In(h.keyCol, vs) => Some(vs.filter(_ != null).map(toLongKey).toSet)
      case _ => None
    }

    /** Key range [from, to) implied by one pushed filter, if any.
      * `k > Long.MaxValue` yields an empty range (overflow guard);
      * upper bounds reaching Long.MaxValue are handled inclusively in
      * the scan (see buildScan). */
    private def rangeBounds(f: Filter): Option[(Long, Long)] = f match {
      case GreaterThan(h.keyCol, v) if v != null =>
        if (toLongKey(v) == Long.MaxValue) Some((Long.MaxValue, Long.MinValue)) // empty
        else Some((toLongKey(v) + 1, Long.MaxValue))
      case GreaterThanOrEqual(h.keyCol, v) if v != null => Some((toLongKey(v), Long.MaxValue))
      case LessThan(h.keyCol, v) if v != null => Some((Long.MinValue, toLongKey(v)))
      case LessThanOrEqual(h.keyCol, v) if v != null =>
        Some((Long.MinValue, if (toLongKey(v) == Long.MaxValue) Long.MaxValue else toLongKey(v) + 1))
      case _ => None
    }

    override def unhandledFilters(filters: Array[Filter]): Array[Filter] = {
      // range filters are fully handled ONLY on ordered handles AND when
      // no point filter is pushed alongside them — the point branch of
      // buildScan ignores bounds, so mixed predicates must be re-applied
      // by Spark above the scan
      val anyPoint = filters.exists(f => pointKeys(f).isDefined)
      filters.filter(f => pointKeys(f).isEmpty &&
        !(h.ordered && !anyPoint && rangeBounds(f).isDefined))
    }

    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): RDD[Row] = {
      val keySets = filters.flatMap(pointKeys)
      val bounds = if (h.ordered) filters.flatMap(rangeBounds) else Array.empty[(Long, Long)]
      val rows: RDD[Row] =
        if (keySets.nonEmpty) {
          // AND semantics across pushed filters: intersect every key set
          val keys = keySets.reduce(_ intersect _).toArray
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
          if (from >= to && !(from == Long.MaxValue && to == Long.MaxValue)) {
            sqlContext.sparkContext.emptyRDD[Row]
          } else {
            val body = h.idx.range(from, to).map(_._2)
            // range() is half-open, so an upper bound of Long.MaxValue
            // (i.e. unbounded above) must also admit a MaxValue key
            if (to == Long.MaxValue) {
              val maxHit = h.idx.multiget(Array(Long.MaxValue)).values.toSeq
              if (maxHit.nonEmpty) body.union(sqlContext.sparkContext.parallelize(maxHit, 1))
              else body
            } else body
          }
        } else {
          h.lastScanKind = "full"
          h.lastPointLookupKeys = -1
          h.idx.map(_._2)
        }
      val idxs = requiredColumns.map(h.schema.fieldIndex)
      rows.map(r => Row.fromSeq(idxs.toSeq.map(r.get)))
    }
  }
}
