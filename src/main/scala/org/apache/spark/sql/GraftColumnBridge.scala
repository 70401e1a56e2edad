package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 made the conversion `private[sql]`
  * (classic.ExpressionUtils), so libraries defining their own
  * expressions host this two-liner inside the org.apache.spark.sql
  * package — the standard pattern for custom-expression libraries. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
