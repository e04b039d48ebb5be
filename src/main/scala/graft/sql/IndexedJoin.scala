package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * SQL-visible INDEXED JOIN: a planner strategy that routes an inner
 * equi-join on the key columns of two [[IndexedFrame]] relations into
 * the engine's zip join — co-partitioned handles join with ZERO
 * shuffle and no hash-build phase (the per-partition indexes ARE the
 * build side); mismatched handles shuffle only the right side.
 *
 * Catalyst cannot do this itself: a cached/in-memory relation exposes
 * no partitioner to SQL, so the default plan is scan + Exchange both
 * sides + sort-merge or hash join. This is the reference engine's
 * signature capability (index-aware joins, reference
 * IndexedRDD.scala:277-283) surfaced through public planner API
 * (`ExperimentalMethods.extraStrategies` — no session-restart or
 * extensions config needed).
 */
object IndexedJoin {

  /** Register the strategy on a session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(IndexedJoinStrategy))
      spark.experimental.extraStrategies = cur :+ IndexedJoinStrategy
  }

  object IndexedJoinStrategy extends SparkStrategy {

    /** Accept a bare indexed relation or an attribute-only Project of
      * one (what column pruning leaves); bail on anything else. */
    private def unwrap(p: LogicalPlan)
        : Option[(Seq[Attribute], Seq[Attribute], IndexedFrame.Handle)] = p match {
      case lr: LogicalRelation => lr.relation match {
        case rel: IndexedFrame.IndexedRelation => Some((lr.output, lr.output, rel.h))
        case _ => None
      }
      case Project(projs, lr: LogicalRelation)
          if projs.forall(_.isInstanceOf[AttributeReference]) =>
        lr.relation match {
          case rel: IndexedFrame.IndexedRelation =>
            Some((projs.map(_.asInstanceOf[AttributeReference]), lr.output, rel.h))
          case _ => None
        }
      case _ => None
    }

    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case j: Join if j.joinType == Inner =>
        (j.condition, unwrap(j.left), unwrap(j.right)) match {
          case (Some(EqualTo(la: AttributeReference, ra: AttributeReference)),
              Some((lOut, lAll, lh)), Some((rOut, rAll, rh))) =>
            val lKey = lAll.find(_.name == lh.keyCol).map(_.exprId)
            val rKey = rAll.find(_.name == rh.keyCol).map(_.exprId)
            val keysMatch =
              (lKey.contains(la.exprId) && rKey.contains(ra.exprId)) ||
                (lKey.contains(ra.exprId) && rKey.contains(la.exprId))
            if (keysMatch)
              Seq(IndexedZipJoinExec(lOut ++ rOut, lh, rh, lAll, rAll))
            else Nil
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** Physical zip join over two indexed handles (leaf: the data comes
    * from the handles' cached indexes, not from child plans). */
  case class IndexedZipJoinExec(output: Seq[Attribute],
      lh: IndexedFrame.Handle, rh: IndexedFrame.Handle,
      lAll: Seq[Attribute], rAll: Seq[Attribute]) extends LeafExecNode {

    override protected def doExecute(): RDD[InternalRow] = {
      val lMap = lAll.map(_.exprId).zipWithIndex.toMap
      val rMap = rAll.map(_.exprId).zipWithIndex.toMap
      // each output attribute reads from the left or the right row
      val sources: Array[Either[Int, Int]] = output.map { a =>
        lMap.get(a.exprId).map(Left(_): Either[Int, Int])
          .getOrElse(Right(rMap(a.exprId)))
      }.toArray
      val schema = StructType(output.map(a =>
        StructField(a.name, a.dataType, a.nullable)))
      // narrow when co-partitioned; otherwise only the right side shuffles
      val joined = lh.idx.innerJoin(rh.idx)((_, a, b) => (a, b))
      joined.mapPartitions { it =>
        val conv = CatalystTypeConverters.createToCatalystConverter(schema)
        val proj = UnsafeProjection.create(schema)
        it.map { case (_, (a, b)) =>
          val vals = sources.map {
            case Left(i) => a.get(i)
            case Right(i) => b.get(i)
          }
          proj(conv(Row.fromSeq(vals.toIndexedSeq)).asInstanceOf[InternalRow]).copy()
        }
      }
    }
  }
}
