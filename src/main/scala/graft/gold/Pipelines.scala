package graft.gold

import graft.util.Cols._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-table join pipelines (TPC-H Q3/Q5 shapes) exercising the
  * join-heavy end of the reference's silver denormalization.
  * Plan discipline: dims broadcast, facts pre-filtered before the join,
  * aggregates decimal-exact.
  */
object Pipelines {

  /** Shipping-priority revenue (Q3 shape): top revenue orders in a
    * segment/date slice. */
  def shipPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                   segment: String = "BUILDING", asOf: String = "1998-01-01"): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val ord = orders.filter(col("o_orderdate") < lit(asOf).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = lineitem.filter(col("l_shipdate") > lit(asOf).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumMoneyTimes(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .select("l_orderkey", "order_date", "o_orderpriority", "revenue")
  }

  /** Local-supplier volume (Q5 shape): revenue where supplier and customer
    * share a nation, rolled up by nation. */
  def localVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val geo = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name").as("region_name"))
    val cust = customer.select("c_custkey", "c_nationkey")
    val supp = supplier.select("s_suppkey", "s_nationkey")
    lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("region_name"))
      .agg(
        sumMoneyTimes(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"),
        count(lit(1)).as("line_count"))
  }

  /** Denormalized order+line join (reference: build_orders_enriched's
    * order×payment denormalization), line grain. */
  def orderDenorm(cleanOrders: DataFrame, cleanLineitem: DataFrame): DataFrame =
    cleanLineitem
      .select("l_orderkey", "l_linenumber", "l_quantity", "net_price", "charge", "is_refund")
      .join(cleanOrders.select("o_orderkey", "o_custkey", "status_normalized",
        "amount_tier", "order_date"), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey", "status_normalized",
        "amount_tier", "order_date", "l_quantity", "net_price", "charge", "is_refund")
}
