package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` seam a whole-operator Catalyst extension
  * needs: turning a custom [[LogicalPlan]] node into a `DataFrame`.
  * `classic.Dataset.ofRows` is `private[sql]`, so this bridge lives in
  * the `org.apache.spark.sql` namespace — the standard extension-library
  * pattern (Delta Lake, Iceberg and friends ship the same shim). It
  * contains no logic: one forwarding call, nothing else from the
  * private surface.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
