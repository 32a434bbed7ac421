package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column<->Expression conversions so
  * graft's custom Catalyst expressions (e.g.
  * [[graft.functions.DotProduct]]) can be exposed as `Column`s. This is
  * the standard extension-library shim for Spark 4's encapsulated Column
  * API.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
