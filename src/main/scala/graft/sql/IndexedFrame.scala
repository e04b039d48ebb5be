package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, In, PrunedFilteredScan}
import org.apache.spark.sql.types.StructType

import graft.IndexedRDD

/**
 * SQL-visible face of an IndexedRDD: a DataSource relation whose
 * pushed-down key predicates route into partition-pruned `multiget`
 * point reads instead of a full scan.
 *
 * Catalyst cannot prune cached in-memory partitions by key (SURVEY §4
 * — the core reason this engine exists); exposing the index through
 * `PrunedFilteredScan` closes that gap with public API only: the
 * optimizer hands us `EqualTo`/`In` filters on the key column and a
 * required-column list, and we answer `WHERE key IN (...)` queries
 * with a targeted job over only the owning partitions. All other
 * predicates fall back to the indexed full scan, with Spark
 * re-applying the residual filters above us.
 */
object IndexedFrame {

  /** An indexed table handle: the versioned index plus its SQL schema.
    * `lastPointLookupKeys` records, for observability and tests, how
    * many keys the most recent scan served via multiget (-1 = full
    * scan). */
  class Handle(val idx: IndexedRDD[Long, Row], val keyCol: String,
      val schema: StructType) extends Serializable {
    @transient @volatile var lastPointLookupKeys: Int = -1

    /** Copy-on-write upsert of full rows, returning a new handle that
      * shares partition structure with this one. */
    def upsert(rows: Seq[Row]): Handle = {
      val ki = schema.fieldIndex(keyCol)
      new Handle(idx.multiput(rows.map(r => (toLongKey(r.get(ki)), r)).toMap),
        keyCol, schema)
    }

    def toDF(implicit spark: SparkSession): DataFrame =
      spark.baseRelationToDataFrame(new IndexedRelation(this)(spark.sqlContext))
  }

  /** Index a DataFrame by a long-typed key column (key uniqueness
    * enforced, last write wins) and pin the built index. */
  def index(df: DataFrame, keyCol: String): Handle = {
    val schema = df.schema
    val ki = schema.fieldIndex(keyCol)
    val pairs = df.rdd.map(r => (toLongKey(r.get(ki)), r))
    new Handle(IndexedRDD(pairs).cached, keyCol, schema)
  }

  private def toLongKey(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case other => throw new IllegalArgumentException(
      s"integral key required, got ${if (other == null) "null" else other.getClass}")
  }

  private[sql] class IndexedRelation(h: Handle)(
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

    override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
      filters.filter(f => pointKeys(f).isEmpty)

    override def buildScan(requiredColumns: Array[String],
        filters: Array[Filter]): RDD[Row] = {
      // AND semantics across pushed filters: intersect every key set
      val keySets = filters.flatMap(pointKeys)
      val rows: RDD[Row] =
        if (keySets.nonEmpty) {
          val keys = keySets.reduce(_ intersect _).toArray
          h.lastPointLookupKeys = keys.length
          val hit = h.idx.multiget(keys).values.toSeq
          sqlContext.sparkContext.parallelize(hit, 1)
        } else {
          h.lastPointLookupKeys = -1
          h.idx.map(_._2)
        }
      val idxs = requiredColumns.map(h.schema.fieldIndex)
      rows.map(r => Row.fromSeq(idxs.toSeq.map(r.get)))
    }
  }
}
