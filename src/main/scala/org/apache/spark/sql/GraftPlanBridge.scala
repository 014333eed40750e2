package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard way a
  * SparkSessionExtensions library materializes a DataFrame from a custom
  * LogicalPlan node (the public API has no entry point for third-party
  * logical operators; every extension that adds one uses this package
  * doorway). Kept to the single call the graft planner needs. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
