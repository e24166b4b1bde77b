package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` Dataset construction from a resolved
  * LogicalPlan — used by the window-grain audit to EXECUTE a window's
  * child subplan (cardinality probe) without re-deriving it from the
  * public API. Lives under `org.apache.spark.sql` solely to satisfy
  * the access qualifier — no Spark internals are modified. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
