package graft.gold

import graft.util.Cols._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold fraud-intelligence tables, re-expressing fraud_summary_daily and
  * user_fraud_scores (weighted composite risk + label).
  * Ref: /root/reference/spark_jobs/gold/fraud_summary.py.
  */
object FraudSummary {

  /** Daily fraud/error KPIs over the events stream (reference groups by
    * day × country × method; our dims are day × event mix). */
  def fraudSummaryDaily(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("event_date"), col("event_type"),
        col("value"), col("user_id"))
      .groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_events"),
        sumMoney(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"),
        sumMoney(when(col("event_type") === "error", col("value")).otherwise(lit(0.0)))
          .as("error_value"),
        countDistinct(col("user_id")).as("active_users"))
      .withColumn("error_rate",
        col("error_events").cast("double") / col("total_events"))
      .withColumn("error_value_rate",
        col("error_value") / (col("purchase_value") + col("error_value")))

  /** Per-user composite risk profile: weighted blend of error rate, value
    * deviation and recency mix, plus a serving-style risk label.
    * Mirrors the reference's composite_risk_score weighting pattern. */
  def userRiskScores(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("events_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors_total"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases_total"),
        sumMoney(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"),
        avgMoney(col("value")).as("avg_event_value"))
      .withColumn("error_rate",
        col("errors_total").cast("double") / col("events_total"))
      .withColumn("purchase_rate",
        col("purchases_total").cast("double") / col("events_total"))
      .withColumn("composite_risk_score",
        col("error_rate") * lit(0.55)
          + (lit(1.0) - col("purchase_rate")) * lit(0.25)
          + (col("avg_event_value") / lit(1000.0)) * lit(0.20))
      .withColumn("risk_label",
        when(col("composite_risk_score") >= 0.50, lit("high"))
          .when(col("composite_risk_score") >= 0.30, lit("medium"))
          .otherwise(lit("low")))
}
