package graft.gold

import graft.util.Cols._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt star-schema re-expression: staging → marts (facts + dims) with
  * md5 surrogate keys.
  * Ref: /root/reference/dbt/models/marts/{dim_users,dim_dates,fact_orders,
  * fact_fraud_events}.sql and macros/generate_surrogate_key.sql.
  *
  * Facts keep their natural grain and pre-aggregate the child table
  * (lineitem) before the join, so the fact-side shuffle is one exchange on
  * the join key; dims are produced once and reused.
  */
object StarSchema {

  /** dim_users equivalent: customer + geo dims + surrogate key. */
  def dimCustomers(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(
        surrogateKey(col("c_custkey")).as("customer_sk"),
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        col("c_acctbal").as("account_balance"),
        col("c_mktsegment").as("market_segment"),
        (col("c_acctbal") < 0).as("negative_balance"))

  /** dim_dates: calendar spine derived from the orders fact, carrying the
    * reference's calendar attributes and relative flags (ref
    * dbt/models/marts/dim_dates.sql:20-44 — month name, ISO week,
    * year-month, holiday season, is_today/yesterday/last_7d/30d/90d).
    * "Today" is the spine's newest date — the same deterministic
    * CURRENT_DATE analog the dashboard KPIs use — joined in as a
    * broadcast 1-row frame, so the trailing flags cost one scan plus a
    * row-local comparison at any scale. */
  def dimDates(orders: DataFrame): DataFrame = {
    val spine = orders
      .select(col("o_orderdate").cast("date").as("date_day"))
      .distinct()
    val anchor = broadcast(spine.agg(max(col("date_day")).as("today")))
    spine.crossJoin(anchor)
      .select(
        surrogateKey(col("date_day")).as("date_sk"),
        col("date_day"),
        year(col("date_day")).cast("long").as("year"),
        quarter(col("date_day")).cast("long").as("quarter"),
        month(col("date_day")).cast("long").as("month"),
        date_format(col("date_day"), "MMMM").as("month_name"),
        weekofyear(col("date_day")).cast("long").as("week_of_year"),
        dayofmonth(col("date_day")).cast("long").as("day_of_month"),
        dayofweek(col("date_day")).cast("long").as("day_of_week"),
        date_format(col("date_day"), "yyyy-MM").as("year_month"),
        (dayofweek(col("date_day")).isin(1, 7)).as("is_weekend"),
        month(col("date_day")).isin(11, 12, 1).as("is_holiday_season"),
        (col("date_day") === col("today")).as("is_today"),
        (col("date_day") === date_sub(col("today"), 1)).as("is_yesterday"),
        (col("date_day") >= date_sub(col("today"), 6)).as("is_last_7d"),
        (col("date_day") >= date_sub(col("today"), 29)).as("is_last_30d"),
        (col("date_day") >= date_sub(col("today"), 89)).as("is_last_90d"))
  }

  /** fact_orders: order grain + lineitem rollup + FK surrogate keys. */
  def factOrders(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lineRollup = lineitem
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("line_count"),
        sumMoney(col("l_quantity")).as("total_quantity"),
        sumMoneyTimes(col("l_extendedprice"), lit(1) - col("l_discount")).as("net_revenue"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("returned_lines"))
    orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .join(lineRollup, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        surrogateKey(col("o_orderkey")).as("order_sk"),
        surrogateKey(col("o_custkey")).as("customer_sk"),
        surrogateKey(col("o_orderdate").cast("date")).as("date_sk"),
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderstatus").as("order_status"),
        col("o_totalprice").as("order_amount"),
        coalesce(col("line_count"), lit(0L)).as("line_count"),
        coalesce(col("total_quantity"), lit(0.0)).as("total_quantity"),
        coalesce(col("net_revenue"), lit(0.0)).as("net_revenue"),
        coalesce(col("returned_lines"), lit(0L)).as("returned_lines"),
        (coalesce(col("returned_lines"), lit(0L)) > 0).as("has_return"))
  }

  /** fact_events equivalent of fact_fraud_events: event grain + FK keys +
    * parsed props. */
  def factEvents(events: DataFrame): DataFrame =
    events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(
        surrogateKey(col("event_id")).as("event_sk"),
        surrogateKey(col("user_id")).as("user_sk"),
        col("event_id"),
        col("user_id"),
        col("ts").cast("date").as("event_date"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ts_second"),
        col("event_type"),
        col("value").as("value"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
        (col("event_type") === "error").as("is_error"),
        (col("event_type") === "purchase").as("is_purchase"))
}
