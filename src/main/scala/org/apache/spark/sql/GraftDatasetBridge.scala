package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door a library-level custom operator needs:
  * turning a hand-built [[LogicalPlan]] node back into a DataFrame.
  * Spark exposes plan CONSUMPTION extension points publicly
  * (`SparkSessionExtensions.injectPlannerStrategy` & co.) but plan
  * CONSTRUCTION only via `Dataset.ofRows`, which is `private[sql]` —
  * so this bridge lives in `org.apache.spark.sql` (the standard
  * technique for Spark-native libraries) and contains nothing else. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
