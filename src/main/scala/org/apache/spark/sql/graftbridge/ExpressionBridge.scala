package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column expression-agnostic and hid the
  * Expression<->Column conversions behind `private[sql]`
  * ExpressionUtils; this in-package bridge re-exposes exactly those two
  * conversions for graft's custom Catalyst expressions. */
object ExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DEEP Column → Expression: [[expression]] leaves node-backed
    * subtrees as lazy `ColumnNodeExpression` placeholders, which the
    * DataFrame plan-conversion path substitutes — but an expression
    * embedded directly into an analyzer plan (a SQL function builder)
    * never passes through that path, and a placeholder nested inside a
    * custom expression fails its type check ("got void"). This variant
    * converts the whole node tree eagerly, recursing through any
    * placeholders custom-expression factories buried inside. */
  def expressionDeep(c: Column): Expression = {
    val conv = org.apache.spark.sql.classic.GraftColumnConverter
    def deep(e: Expression): Expression = e.transformUp {
      case cne if conv.unwrapPlaceholder(cne).isDefined =>
        deep(conv.toExpression(conv.unwrapPlaceholder(cne).get))
    }
    deep(conv.toExpression(c.node))
  }

  /** Catalyst predicate → datasource filter, for planning aggregate
    * pushdown with EXACTLY the translation the scan path uses
    * (DataSourceStrategy.translateFilter is protected[sql]). */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** DataFrame over an analyzed logical plan (`Dataset.ofRows` is
    * private[sql]) — for the SQL-text DML rewrite, which re-wraps the
    * MERGE/INSERT source subtree as a DataFrame to feed the frame-level
    * DML methods. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over already-catalyst rows (`internalCreateDataFrame`
    * is private[sql]) — for operators that assemble InternalRow output
    * directly, e.g. the batch as-of join. */
  def internalDF(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** STREAMING-flagged DataFrame over catalyst rows — what a v1
    * streaming Source's getBatch must return (the incremental planner
    * rejects batch-flagged children). */
  def internalStreamingDF(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
