package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column constructor so graft's native
  * Catalyst expressions (graft.plans.*) can be exposed as Columns without
  * a round-trip through the SQL parser. This is the standard extension
  * hook used by Spark connector libraries; it touches no internals beyond
  * Expression -> Column wrapping.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
