package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft code outside the spark package
  * (ExpressionUtils is private[sql]); used to wrap custom codegen'd
  * expressions as Columns. */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager Column → Catalyst conversion via the active session's node
    * converter. [[toExpr]] wraps lazily (fine inside DataFrame plans,
    * where analysis converts it); a FunctionRegistry builder must hand
    * the analyzer a REAL expression tree — the lazy wrapper reports no
    * data type and fails type checks (VOID). */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
