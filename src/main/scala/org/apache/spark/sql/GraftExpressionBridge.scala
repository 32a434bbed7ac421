package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` Column<->Expression and
  * Dataset<->LogicalPlan conversions so graft's custom Catalyst
  * expressions (e.g. [[graft.functions.DotProduct]]) and plans
  * ([[graft.plans.AsOfJoin]]) can be exposed through the public API.
  * This is the standard extension-library shim for Spark 4's
  * encapsulated Column/Dataset API.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan behind a DataFrame (attributes resolved). */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** DataFrame over an already-constructed logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
