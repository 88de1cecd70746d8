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

  /** Schema/value checks (dbt: not_null, accepted_values, bounds, unique). */
  def suite(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
            events: DataFrame): DataFrame = {
    val checks = Seq(
      check("orders_orderkey_not_null", "orders",
        cnt(orders.filter(col("o_orderkey").isNull))),
      check("orders_amount_positive", "orders",
        cnt(orders.filter(col("o_totalprice") <= 0))),
      check("orders_amount_upper_bound", "orders",
        cnt(orders.filter(col("o_totalprice") >= 10000000))),
      check("orders_status_domain", "orders",
        cnt(orders.filter(!col("o_orderstatus").isin("O", "F", "P")))),
      check("orders_orderkey_unique", "orders",
        orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).agg(count(lit(1)).as("violation_count"))),
      check("lineitem_quantity_positive", "lineitem",
        cnt(lineitem.filter(col("l_quantity") <= 0))),
      check("lineitem_discount_range", "lineitem",
        cnt(lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1))),
      check("lineitem_returnflag_domain", "lineitem",
        cnt(lineitem.filter(!col("l_returnflag").isin("A", "N", "R")))),
      check("customer_acctbal_not_null", "customer",
        cnt(customer.filter(col("c_acctbal").isNull))),
      check("events_type_domain", "events",
        cnt(events.filter(!col("event_type").isin(
          "click", "view", "signup", "purchase", "error")))),
      check("events_value_not_negative", "events",
        cnt(events.filter(col("value") < 0))))
    checks.reduce(_.unionByName(_))
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
