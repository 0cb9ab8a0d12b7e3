package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine uses: constructing a
  * DataFrame from a custom logical plan ([[graft.plans.AsofJoinPlan]]).
  * Spark's extension points cover expressions, optimizer rules, and
  * planner STRATEGIES, but deliberately not plan construction — every
  * engine that ships its own operators (Iceberg, Delta) hosts exactly
  * this shim in `org.apache.spark.sql` for the same reason. Nothing is
  * overridden or monkey-patched; this is one forwarding call.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
