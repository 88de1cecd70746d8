package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization over the events stream (batch form; the
  * streaming mirror with flatMapGroupsWithState lives in
  * graft.streaming.StreamOps).
  *
  * Classic two-window formulation: boundary flag via lag, session index via
  * running sum of boundaries — both over the same user_id×time sort, so
  * Catalyst plans ONE shuffle + one sort, then a partial-aggregated groupBy
  * on (user_id, session_idx) which reuses the same partitioning.
  */
object Sessionize {

  val DefaultGapUs: Long = 30L * 60 * 1000000 // 30 min

  /** Assign a session index per user; events within `gapUs` of the previous
    * event share a session. */
  def assignSessions(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .withColumn("is_boundary",
        (col("prev_ts_us").isNull || (col("ts_us") - col("prev_ts_us") > gapUs)).cast("long"))
      .withColumn("session_idx",
        sum(col("is_boundary")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts_us")
  }

  /** Per-session rollup: bounds, duration, event mix, value sum. */
  def sessionStats(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame =
    assignSessions(events, gapUs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("event_count"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .withColumn("duration_us", col("session_end_us") - col("session_start_us"))
}
