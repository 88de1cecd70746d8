package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's private[sql] Dataset constructor so graft can wrap
  * its custom logical plans (graft.plans.*) into public DataFrames. This
  * is the same mechanism third-party Spark extensions (Sedona, Frameless,
  * Delta) use to surface custom plan nodes. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst expression into a public Column — the direct-
    * construction path for graft's custom expressions when the registered
    * SQL builder (and its implicit casts) is bypassed. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The reverse bridge: the Catalyst expression behind a public Column
    * (Spark 4 Columns wrap ColumnNodes; `.expr` is gone). */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
