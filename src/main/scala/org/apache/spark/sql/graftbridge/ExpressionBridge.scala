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
}
