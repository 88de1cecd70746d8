package graft.gold

import graft.util.Cols._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer revenue aggregations, re-expressing the reference's
  * revenue_daily / revenue_hourly / product_metrics / top-customer KPIs.
  * Ref: /root/reference/spark_jobs/gold/revenue_aggregations.py
  *
  * All sums are exact decimal partial-aggregates (map-side combine), so a
  * single shuffle per groupBy; medians/p95s are exact rank-based
  * percentiles (operators.RankPercentile: window sort with spillable
  * per-group buffering instead of the built-in percentile's unbounded
  * in-memory agg buffer — the group whose daily volume grows 100x no
  * longer grows an executor heap structure), still bit-identical to
  * DuckDB quantile_cont for the oracle.
  */
object Revenue {

  /** Daily revenue KPIs at reference dimensionality: order date × region ×
    * status × amount tier, with conditional revenue splits and ratio KPIs
    * (reference: revenue_daily by event_date × shipping_country × currency
    * × payment_method × amount_tier with net_revenue / fraud_amount /
    * fraud_rate / payment_failure_rate, revenue_aggregations.py:46–91).
    * Mapping: region ↔ shipping_country, status F/P ↔ payment success/
    * failure, the high-risk-region flag ↔ the is_fraud label. Ratio
    * denominators use the reference's +0.001 guard; no round() on computed
    * doubles (determinism contract, SURVEY.md §4). */
  def revenueDaily(enrichedOrders: DataFrame): DataFrame =
    graft.operators.RankPercentile.ranked(enrichedOrders,
        Seq("order_date", "region_name", "status_normalized", "amount_tier"),
        col("o_totalprice"))
      .groupBy(col("order_date"), col("region_name"),
        col("status_normalized"), col("amount_tier"))
      .agg(
        count(lit(1)).as("total_orders"),
        sumMoney(col("o_totalprice")).as("gmv"),
        sumMoney(when(col("status_normalized") === "F", col("o_totalprice"))
          .otherwise(lit(0))).as("net_revenue"),
        sumMoney(when(col("is_high_risk_region"), col("o_totalprice"))
          .otherwise(lit(0))).as("fraud_amount"),
        sum(when(col("is_high_risk_region"), 1L).otherwise(0L)).as("fraud_orders"),
        sum(when(col("status_normalized") === "P", 1L).otherwise(0L)).as("failed_payments"),
        avgMoney(col("o_totalprice")).as("avg_order_value"),
        graft.operators.RankPercentile.pct(0.5).as("median_order_value"),
        graft.operators.RankPercentile.pct(0.95).as("p95_order_value"),
        countDistinct(col("o_custkey")).as("unique_customers"))
      .withColumn("fraud_rate",
        col("fraud_orders") / (col("total_orders") + lit(0.001)))
      .withColumn("payment_failure_rate",
        col("failed_payments") / (col("total_orders") + lit(0.001)))

  /** Hourly event-revenue rollup (reference: revenue_hourly via
    * date_trunc('hour')) over the events stream's purchase values. */
  def revenueHourly(events: DataFrame): DataFrame =
    events
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
      .filter(col("event_type") === "purchase")
      .withColumn("event_hour", date_trunc("hour", col("ts")))
      .groupBy(col("event_hour"))
      .agg(
        count(lit(1)).as("purchase_count"),
        sumMoney(col("value")).as("hourly_gmv"),
        avgMoney(col("value")).as("avg_purchase"),
        countDistinct(col("user_id")).as("active_users"))
      .withColumn("hour_ts", unix_timestamp(col("event_hour")))
      .drop("event_hour")

  /** Product/category metrics (reference: product_metrics explodes order
    * items; here lineitem IS the exploded item table — join part dim). */
  def productMetrics(cleanLineitem: DataFrame, part: DataFrame): DataFrame =
    cleanLineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_type"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(
        count(lit(1)).as("line_count"),
        sumExact6(col("net_price")).as("type_revenue"),
        sumMoney(col("l_quantity")).as("units_sold"),
        avgMoney(col("l_extendedprice")).as("avg_line_price"),
        sum(when(col("is_refund"), 1L).otherwise(0L)).as("refund_lines"))
      .withColumn("refund_rate",
        col("refund_lines").cast("double") / col("line_count"))

  /** Top-N customers by lifetime revenue with ranking.
    *
    * Two-phase top-N: `orderBy().limit(n)` plans as TakeOrderedAndProject
    * (per-partition top-n, then a merge of only partitions×n rows) — never
    * a global sort or a single-partition window over the full per-customer
    * aggregate. The customer dim joins AFTER the cut, so only n rows are
    * broadcast against it; the ranking window's input is bounded at n. */
  /** Month-over-month and year-over-year revenue growth per priority
    * band — the BI trend panel every revenue mart ships. The corpus
    * collapses to (priority, month) grain FIRST (one partial-agged
    * exchange of exact decimal sums), so the LAG-1/LAG-12 windows run
    * over dimension-bounded frames (bands × months), never data-sized
    * partitions. Growth rates are single IEEE chains on identically
    * derived doubles; months without a comparison row report NULL (the
    * LAG semantics — a calendar gap would silently compare to the wrong
    * month if LAG counted rows, so the prior month/year is looked up by
    * EXPLICIT month key self-equality through the lag month arithmetic).
    */
  def growthTrend(cleanOrders: DataFrame): DataFrame = {
    val monthly = cleanOrders
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("order_date")).cast("date").as("month"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("orders"))
    // explicit calendar lookups: self-joins at (priority, month) grain on
    // shifted keys — a row-LAG would mispair across calendar gaps
    val prevM = monthly.select(col("o_orderpriority"),
      add_months(col("month"), 1).as("month"), col("revenue").as("prev_month_rev"))
    val prevY = monthly.select(col("o_orderpriority"),
      add_months(col("month"), 12).as("month"), col("revenue").as("prev_year_rev"))
    monthly
      .join(prevM, Seq("o_orderpriority", "month"), "left")
      .join(prevY, Seq("o_orderpriority", "month"), "left")
      .withColumn("mom_growth",
        (col("revenue") - col("prev_month_rev")) / col("prev_month_rev"))
      .withColumn("yoy_growth",
        (col("revenue") - col("prev_year_rev")) / col("prev_year_rev"))
      .select("o_orderpriority", "month", "orders", "revenue",
        "prev_month_rev", "mom_growth", "prev_year_rev", "yoy_growth")
  }

  def topCustomers(cleanOrders: DataFrame, customer: DataFrame, n: Int): DataFrame = {
    val perCust = cleanOrders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_count"),
        sumMoney(col("o_totalprice")).as("revenue"))
    val top = perCust.orderBy(col("revenue").desc, col("o_custkey").asc).limit(n)
    val w = Window.orderBy(col("revenue").desc, col("o_custkey").asc)
    broadcast(top)
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("revenue_rank", row_number().over(w))
      .select("revenue_rank", "o_custkey", "c_name", "c_mktsegment",
        "order_count", "revenue")
  }

  /** Share-of-total per market segment via window-over-aggregate
    * (reference: fraud_gmv_rate / share ratios). */
  def marketShare(cleanOrders: DataFrame, customer: DataFrame): DataFrame = {
    val seg = cleanOrders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sumMoney(col("o_totalprice")).as("segment_revenue"),
        count(lit(1)).as("segment_orders"))
    seg.withColumn("revenue_share",
      col("segment_revenue") / sum(col("segment_revenue").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
        .over(Window.partitionBy()).cast("double"))
  }
}
