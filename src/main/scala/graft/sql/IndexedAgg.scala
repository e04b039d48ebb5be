package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference,
  GenericInternalRow, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count,
  Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType}

/**
 * No-scan aggregate STATS through SQL: on an indexed handle,
 * `count(*)` is the O(partitions) sum of per-partition INDEX SIZES
 * (mirroring the reference's O(partitions) `count`, reference
 * IndexedRDD.scala:66-68), and — on an ORDERED handle — `min(key)` /
 * `max(key)` are one O(depth) leftmost/rightmost radix descent per
 * partition. Catalyst's own plan scans every cached row into a
 * partial + final hash aggregate; the index already knows.
 *
 * The strategy claims exactly `Aggregate([], stats, relation)` where
 * every aggregate is count(*), min(key) or max(key) — optionally under
 * attribute-only Projects — and nothing else: any Filter, grouping,
 * distinct, or non-key min/max falls through to the default planner.
 */
object IndexedAgg {

  /** Register the strategy on a session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(IndexedCountStrategy))
      spark.experimental.extraStrategies = cur :+ IndexedCountStrategy
  }

  sealed trait Stat extends Serializable
  case object CountStat extends Stat
  case object MinStat extends Stat
  case object MaxStat extends Stat

  object IndexedCountStrategy extends SparkStrategy {

    /** A bare indexed relation under attribute-only Projects — a
      * Filter anywhere disqualifies (rows would need inspection). */
    private def bareRelation(p: LogicalPlan): Option[IndexedFrame.Handle[_]] = p match {
      case lr: LogicalRelation => lr.relation match {
        case rel: IndexedFrame.IndexedRelation[_] => Some(rel.h)
        case _ => None
      }
      case Project(projs, child) if projs.forall(_.isInstanceOf[Attribute]) =>
        bareRelation(child)
      case _ => None
    }

    /** Key types whose external value converts to a catalyst literal
      * directly (UUID handles carry a non-catalyst driver type). */
    private def keyTypeSupported(h: IndexedFrame.Handle[_]): Boolean =
      h.schema(h.keyCol).dataType match {
        case LongType | IntegerType | ShortType | StringType => true
        case _ => false
      }

    private def statOf(a: Alias, h: IndexedFrame.Handle[_]): Option[Stat] = a.child match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => Some(CountStat)
          case Min(k: AttributeReference)
              if k.name == h.keyCol && h.ordered && h.orderPreservingKey &&
                keyTypeSupported(h) => Some(MinStat)
          case Max(k: AttributeReference)
              if k.name == h.keyCol && h.ordered && h.orderPreservingKey &&
                keyTypeSupported(h) => Some(MaxStat)
          case _ => None
        }
      case _ => None
    }

    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Aggregate(Nil, aggs, child, _) if aggs.nonEmpty &&
          aggs.forall(_.isInstanceOf[Alias]) =>
        bareRelation(child) match {
          case Some(h) =>
            val stats = aggs.map(a => statOf(a.asInstanceOf[Alias], h))
            if (stats.forall(_.isDefined))
              IndexedStatsExec(aggs.map(_.toAttribute), h,
                stats.map(_.get)) :: Nil
            else Nil
          case None => Nil
        }
      case _ => Nil
    }
  }

  /** One row of index-answered stats: count = Σ partition sizes
    * (partition objects only, O(1) each); min/max key = one O(depth)
    * radix descent per partition, combined on the driver. */
  case class IndexedStatsExec(output: Seq[Attribute],
      h: IndexedFrame.Handle[_], stats: Seq[Stat]) extends LeafExecNode {

    override protected def doExecute(): RDD[InternalRow] = {
      h.lastScanKind = "stats"
      val keyType = h.schema(h.keyCol).dataType
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(keyType)
      // ONE job answers every requested stat (4 jobs/query measured 2x
      // the whole micro's latency when issued separately)
      val (count, mn, mx) =
        if (stats.exists(s => s == MinStat || s == MaxStat)) h.keyStatsAny()
        else (h.idx.count(), None, None)
      val values: Seq[Any] = stats.map {
        case CountStat => count
        case MinStat => mn.map(toCatalyst).orNull
        case MaxStat => mx.map(toCatalyst).orNull
      }
      val types = output.map(_.dataType)
      sparkContext.parallelize(Seq(values), 1).mapPartitions { it =>
        val proj = UnsafeProjection.create(types.toArray)
        it.map(vs => proj(new GenericInternalRow(vs.toArray)): InternalRow)
      }
    }

    override def simpleString(maxFields: Int): String =
      s"IndexedStats ${stats.mkString("[", ", ", "]")} [no-scan: index sizes + O(depth) key descents]"
  }
}
