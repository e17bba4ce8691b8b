package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ catalyst Expression bridge. Spark 4's Column wraps a ColumnNode
 * (Spark Connect refactor) and the converter lives in the sql-private
 * `org.apache.spark.sql.classic.ExpressionUtils`; this sub-package of
 * org.apache.spark.sql re-exports just the two conversions graft's native
 * expressions need (standard extension pattern for catalyst-level code).
 */
object ColumnBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
