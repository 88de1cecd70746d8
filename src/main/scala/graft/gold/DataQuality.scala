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
    * row per check. */
  private def fused(table: String, df: DataFrame,
                    checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val agged = df.agg(
      sum(when(checks.head._2, 1L).otherwise(0L)).as(checks.head._1),
      checks.tail.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*)
    val stackExpr = checks.map { case (n, _) => s"'$n', $n" }.mkString(", ")
    agged.selectExpr(
        s"stack(${checks.size}, $stackExpr) as (check_name, violation_count)")
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
