package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can wrap a custom
  * logical plan node as a DataFrame. Standard extension-library shim: the
  * only privileged call is plan→DataFrame construction; planning,
  * execution, and optimization all flow through public extension points
  * (SparkSessionExtensions.injectPlannerStrategy).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst→data-source filter translation (protected[sql]): the exact
    * translation parquet pushdown runs, reused by graft's manifest file
    * index so its pruning sees the same filter algebra the engine does.
    */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)
}
