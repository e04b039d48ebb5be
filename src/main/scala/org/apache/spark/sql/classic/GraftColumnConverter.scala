package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.internal.ColumnNode

/** In-package shim over the `private[classic]` column-node converter:
  * the graftbridge deep Column→Expression conversion needs to (a) run
  * the node converter and (b) recognize/unwrap the lazy
  * `ColumnNodeExpression` placeholders it leaves behind. Same pattern
  * as `graftbridge.ExpressionBridge` for the `private[sql]` surface. */
private[sql] object GraftColumnConverter {
  def toExpression(node: ColumnNode): Expression =
    ColumnNodeToExpressionConverter(node)

  def unwrapPlaceholder(e: Expression): Option[ColumnNode] = e match {
    case c: ColumnNodeExpression => Some(c.node)
    case _ => None
  }
}
