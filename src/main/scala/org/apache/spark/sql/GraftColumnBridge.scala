package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Column ⇄ Expression converters and the
  * plan→DataFrame constructor of the classic (non-Connect) API, needed to
  * expose graft's custom Catalyst expressions and logical operators through
  * the public DataFrame DSL. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzedPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
