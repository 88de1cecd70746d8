package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's private[sql] Dataset constructor so graft can wrap
  * its custom logical plans (graft.plans.*) into public DataFrames. This
  * is the same mechanism third-party Spark extensions (Sedona, Frameless,
  * Delta) use to surface custom plan nodes. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
