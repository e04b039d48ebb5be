package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/**
 * No-scan COUNT through SQL: `SELECT count(*) FROM indexed_handle`
 * plans as a sum of per-partition INDEX SIZES — O(partitions) with no
 * row scan, no aggregation exchange — mirroring the reference's
 * O(partitions) `count` (reference IndexedRDD.scala:66-68) at the SQL
 * surface. Catalyst's own plan would scan every cached row into a
 * partial + final hash aggregate; the index already knows its size.
 *
 * The strategy claims exactly `Aggregate([], [count(1)], relation)` —
 * optionally under attribute-only Projects (what column pruning
 * leaves) — and nothing else: any Filter or grouping falls through to
 * the default planner (a filtered count must inspect rows).
 */
object IndexedAgg {

  /** Register the strategy on a session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(IndexedCountStrategy))
      spark.experimental.extraStrategies = cur :+ IndexedCountStrategy
  }

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

    private def isCountStar(a: Alias): Boolean = a.child match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => true
          case _ => false
        }
      case _ => false
    }

    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Aggregate(Nil, Seq(a: Alias), child, _) if isCountStar(a) =>
        bareRelation(child)
          .map(h => IndexedCountExec(a.toAttribute :: Nil, h) :: Nil)
          .getOrElse(Nil)
      case _ => Nil
    }
  }

  /** One row, one long: Σ per-partition index sizes. The job launched
    * at execution touches only the partition OBJECTS (each answers
    * `size` in O(1)), never the entries. */
  case class IndexedCountExec(output: Seq[Attribute],
      h: IndexedFrame.Handle[_]) extends LeafExecNode {

    override protected def doExecute(): RDD[InternalRow] = {
      h.lastScanKind = "count"
      val n = h.idx.count() // O(partitions) job, no row scan
      sparkContext.parallelize(Seq(n), 1).mapPartitions { it =>
        it.map { v =>
          val w = new UnsafeRowWriter(1)
          w.reset()
          w.write(0, v)
          w.getRow: InternalRow
        }
      }
    }

    override def simpleString(maxFields: Int): String =
      s"IndexedCount [no-scan, O(partitions) index-size sum]"
  }
}
