package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can wrap its own
  * logical nodes (graft.plans.AsOfJoinPlan) as DataFrames — the one hook
  * SparkSessionExtensions does not expose. Standard extension-library
  * technique (a package-scoped shim, no behavior of its own). */
object GraftPlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan):
      org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
