package graft.gold

import graft.util.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's Grafana dashboard SQL panels re-expressed as queries
  * over the same gold semantics — the serving-side query surface a user
  * of the platform actually sees.
  * Ref: /root/reference/monitoring/grafana/dashboards/fraud_platform.json
  * (Today's GMV / Today's Fraud Rate / Total Orders Today / High Risk
  * Users / 7-Day Fraud Rate Trend / Daily GMV vs Fraud Amount).
  *
  * "Today" is the corpus' latest date (a deterministic CURRENT_DATE —
  * the panels are point-in-time reads of the newest gold partition).
  * Every KPI reduces a bounded gold-grain frame (days or users), so each
  * is one partial-agg pass + a 1-row cut; the union output is |kpis| rows.
  */
object Dashboard {

  /** Top-line KPI tiles as (kpi, value) rows. */
  def kpis(events: DataFrame, cleanOrders: DataFrame): DataFrame = {
    val daily = cleanOrders.groupBy(col("order_date")).agg(
      Cols.sumMoney(col("o_totalprice")).as("gmv"),
      count(lit(1)).cast("double").as("orders"))
    val latestDaily = daily.orderBy(col("order_date").desc).limit(1)

    val fraudDaily = FraudSummary.fraudSummaryDaily(events)
    val latestFraud = fraudDaily.orderBy(col("event_date").desc).limit(1)

    val highRisk = FraudSummary.userRiskScores(events)
      .filter(col("composite_risk_score") >= 0.50)
      .agg(count(lit(1)).cast("double").as("value"))

    latestDaily.select(lit("todays_gmv").as("kpi"), col("gmv").as("value"))
      .unionAll(latestDaily.select(lit("todays_orders").as("kpi"), col("orders").as("value")))
      .unionAll(latestFraud.select(lit("todays_error_rate").as("kpi"), col("error_rate").as("value")))
      .unionAll(highRisk.select(lit("high_risk_users").as("kpi"), col("value")))
  }

  /** The 7-day trend panels: per-day purchase volume (the event-sourced
    * GMV the reference's revenue_daily carries), error volume and error
    * rate over the trailing week of the newest event date. */
  def trend(events: DataFrame, days: Int = 7): DataFrame = {
    val fraudDaily = FraudSummary.fraudSummaryDaily(events)
    val maxDate = fraudDaily.agg(max(col("event_date")).as("d"))
    fraudDaily.join(broadcast(maxDate),
        col("event_date") >= date_sub(col("d"), days - 1))
      .select(col("event_date"), col("purchase_value").as("gmv"),
        col("error_value").as("fraud_amount"), col("error_rate"))
  }
}
