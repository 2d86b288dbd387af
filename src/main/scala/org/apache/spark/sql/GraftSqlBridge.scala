package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge into `private[sql]` constructors (Dataset.ofRows,
  * Column↔Expression conversion), used by graft.plans to materialize
  * custom logical plans as DataFrames. Lives in the org.apache.spark.sql
  * package solely to satisfy the access modifier — the standard pattern
  * for third-party Catalyst extensions.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
