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
}
