package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Great-Expectations-style data-quality suite, re-expressing the
  * reference's validation gates as aggregation queries returning one row
  * per check (violation count + pass flag).
  * Ref: /root/reference/data_quality/validate.py,
  * /root/reference/dbt/tests/assert_positive_amounts.sql,
  * assert_fraud_rate_bounds.sql, and the 34 dbt schema tests.
  *
  * Each check is a single filtered aggregate over one table — partial
  * aggregation means one number per partition travels to the final stage,
  * so the whole suite is scan-bound (and columns are pruned per check).
  */
object DataQuality {

  private def check(name: String, table: String, violations: DataFrame): DataFrame =
    violations.select(
      lit(name).as("check_name"),
      lit(table).as("table_name"),
      col("violation_count"),
      (col("violation_count") === 0).as("passed"))

  private def cnt(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("violation_count"))

  /** One fused aggregation per table: every check is a conditional sum in
    * a single scan (4 scans total instead of one per check — the only
    * plan shape that survives a 100 TB fact table), then unpivoted to one
    * row per check.
    *
    * `uniqueCheck` fuses a surrogate-key uniqueness test
    * (count − countDistinct, exact) into the SAME aggregate: a separate
    * uniqueness aggregate would re-execute the whole mart subtree (the
    * fact-orders rollup join, the fraud-score feature pipeline) a second
    * time per table — the distinct's Expand doubles rows through this one
    * agg, which is far cheaper than recomputing the mart. */
  private def fused(table: String, df: DataFrame,
                    checks: Seq[(String, org.apache.spark.sql.Column)],
                    uniqueCheck: Option[(String, String)] = None): DataFrame = {
    val rowAggs = checks.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }
    val uniqAggs = uniqueCheck.map { case (n, c) =>
      (count(col(c)) - countDistinct(col(c))).as(n) }.toSeq
    val aggs = rowAggs ++ uniqAggs
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val names = checks.map(_._1) ++ uniqueCheck.map(_._1)
    val stackExpr = names.map(n => s"'$n', $n").mkString(", ")
    agged.selectExpr(
        s"stack(${names.size}, $stackExpr) as (check_name, violation_count)")
      .select(col("check_name"), lit(table).as("table_name"),
        col("violation_count"), (col("violation_count") === 0).as("passed"))
  }

  /** Schema/value checks (dbt: not_null, accepted_values, bounds, unique). */
  def suite(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
            events: DataFrame): DataFrame = {
    val orderChecks = fused("orders", orders, Seq(
      "orders_orderkey_not_null" -> col("o_orderkey").isNull,
      "orders_amount_positive" -> (col("o_totalprice") <= 0),
      "orders_amount_upper_bound" -> (col("o_totalprice") >= 10000000),
      "orders_status_domain" -> !col("o_orderstatus").isin("O", "F", "P")))
    val lineChecks = fused("lineitem", lineitem, Seq(
      "lineitem_quantity_positive" -> (col("l_quantity") <= 0),
      "lineitem_discount_range" -> (col("l_discount") < 0 || col("l_discount") > 1),
      "lineitem_returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R")))
    val custChecks = fused("customer", customer, Seq(
      "customer_acctbal_not_null" -> col("c_acctbal").isNull))
    val eventChecks = fused("events", events, Seq(
      "events_type_domain" -> !col("event_type").isin(
        "click", "view", "signup", "purchase", "error"),
      "events_value_not_negative" -> (col("value") < 0)))
    // uniqueness needs its own grouped aggregation (not a row predicate)
    val unique = check("orders_orderkey_unique", "orders",
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).agg(count(lit(1)).as("violation_count")))
    Seq(orderChecks, lineChecks, custChecks, eventChecks, unique)
      .reduce(_.unionByName(_))
  }

  /** dbt-marts-parity suite over graft's OWN gold outputs (not the inputs):
    * not_null / unique / accepted_values / bounds / consistency checks on
    * the star-schema tables, mirroring the reference's
    * dbt/models/marts/schema.yml test list. Row-predicate checks fuse into
    * one scan per mart; surrogate-key uniqueness is count − countDistinct
    * (one exact-distinct aggregate per mart). */
  def martsSuite(dimCustomers: DataFrame, dimDates: DataFrame,
                 factOrders: DataFrame, factEvents: DataFrame): DataFrame = {
    val dimCustChecks = fused("dim_customers", dimCustomers, Seq(
      "dim_customers_sk_not_null" -> col("customer_sk").isNull,
      "dim_customers_id_not_null" -> col("customer_id").isNull,
      "dim_customers_segment_domain" -> !col("market_segment").isin(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
      "dim_customers_region_domain" -> !col("region_name").isin(
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")),
      uniqueCheck = Some("dim_customers_sk_unique" -> "customer_sk"))
    val dimDateChecks = fused("dim_dates", dimDates, Seq(
      "dim_dates_sk_not_null" -> col("date_sk").isNull,
      "dim_dates_year_bounds" -> (col("year") < 1990 || col("year") > 2010),
      "dim_dates_weekend_consistent" ->
        (col("is_weekend") =!= col("day_of_week").isin(1, 7))),
      uniqueCheck = Some("dim_dates_sk_unique" -> "date_sk"))
    val factOrderChecks = fused("fact_orders", factOrders, Seq(
      "fact_orders_sk_not_null" -> col("order_sk").isNull,
      "fact_orders_date_not_null" -> col("order_date").isNull,
      "fact_orders_amount_nonneg" -> (col("order_amount") < 0),
      "fact_orders_net_revenue_nonneg" -> (col("net_revenue") < 0),
      "fact_orders_status_domain" -> !col("order_status").isin("O", "F", "P"),
      "fact_orders_returns_bounded" -> (col("returned_lines") > col("line_count"))),
      uniqueCheck = Some("fact_orders_sk_unique" -> "order_sk"))
    val factEventChecks = fused("fact_events", factEvents, Seq(
      "fact_events_sk_not_null" -> col("event_sk").isNull,
      "fact_events_date_not_null" -> col("event_date").isNull,
      "fact_events_flags_exclusive" -> (col("is_error") && col("is_purchase"))),
      uniqueCheck = Some("fact_events_sk_unique" -> "event_sk"))
    Seq(dimCustChecks, dimDateChecks, factOrderChecks, factEventChecks)
      .reduce(_.unionByName(_))
  }

  /** The fraud-side dbt tests the star-schema suite doesn't cover —
    * completing parity with the reference's 34 schema tests + 2 singular
    * data tests (ref: dbt/models/staging/schema.yml gold-source checks,
    * dbt/models/marts/schema.yml dim_users/fact_fraud_events
    * accepted_values + accepted_range, dbt/tests/assert_fraud_rate_bounds
    * .sql, assert_positive_amounts.sql). Same fused one-scan-per-table
    * shape as martsSuite. */
  def fraudMartsSuite(revenueDaily: DataFrame, fraudSummary: DataFrame,
                      userRisk: DataFrame, fraudScores: DataFrame): DataFrame = {
    val revenueChecks = fused("revenue_daily", revenueDaily, Seq(
      "revenue_daily_date_not_null" -> col("order_date").isNull,
      "revenue_daily_orders_not_null" -> col("total_orders").isNull,
      "revenue_daily_gmv_not_null" -> col("gmv").isNull,
      "revenue_daily_fraud_rate_range" ->
        (col("fraud_rate") < 0 || col("fraud_rate") > 1)))
    val summaryChecks = fused("fraud_summary", fraudSummary, Seq(
      "fraud_summary_date_not_null" -> col("event_date").isNull,
      "fraud_summary_error_rate_range" ->
        (col("error_rate") < 0 || col("error_rate") > 1),
      "fraud_summary_error_value_rate_range" ->
        (col("error_value_rate") < 0 || col("error_value_rate") > 1),
      // the singular data test: days above 50% error are suspicious even
      // when formally in bounds (assert_fraud_rate_bounds.sql)
      "fraud_summary_error_rate_suspicious" -> (col("error_rate") > 0.5)))
    val userRiskChecks = fused("user_risk_scores", userRisk, Seq(
      "user_risk_user_not_null" -> col("user_id").isNull,
      "user_risk_score_range" ->
        (col("composite_risk_score") < 0 || col("composite_risk_score") > 1),
      "user_risk_label_domain" ->
        !col("risk_label").isin("low", "medium", "high")),
      uniqueCheck = Some("user_risk_user_unique" -> "user_id"))
    val scoreChecks = fused("fraud_scores", fraudScores, Seq(
      "fraud_scores_key_not_null" -> col("o_orderkey").isNull,
      "fraud_scores_score_range" ->
        (col("fraud_score") < 0 || col("fraud_score") > 1),
      "fraud_scores_risk_label_domain" ->
        !col("risk_label").isin("low", "medium", "high"),
      "fraud_scores_predicted_domain" -> !col("predicted_fraud").isin(0L, 1L),
      // assert_positive_amounts.sql on the scored mart's amount column
      "fraud_scores_amount_positive" -> (col("total_amount") < 0)),
      uniqueCheck = Some("fraud_scores_key_unique" -> "o_orderkey"))
    Seq(revenueChecks, summaryChecks, userRiskChecks, scoreChecks)
      .reduce(_.unionByName(_))
  }

  /** Referential-integrity orphan counts (dbt: relationships tests).
    * Anti-joins with the small side broadcast. */
  def referential(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
                  events: DataFrame): DataFrame = {
    val orphanLines = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanOrders = orders.select(col("o_custkey"))
      .join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
    val orphanEvents = events.select(col("user_id"))
      .join(broadcast(customer.select(col("c_custkey"))),
        col("user_id") === col("c_custkey"), "left_anti")
    Seq(
      check("lineitem_orderkey_in_orders", "lineitem", cnt(orphanLines)),
      check("orders_custkey_in_customer", "orders", cnt(orphanOrders)),
      check("events_userid_in_customer", "events", cnt(orphanEvents))
    ).reduce(_.unionByName(_))
  }
}
