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

  /** Order→ship cycle-time mart per priority band — the accumulating-
    * snapshot view of fulfillment: how long lines take to ship, with the
    * full dispersion (exact p50/p95, not just the mean) that SLA
    * dashboards need.
    *
    * Exactness: delays are integer days; the mean is one IEEE division
    * of an exact integer sum; percentiles are exact rank-interpolated
    * (the quantile_cont contract shared with q_user_percentiles), built
    * on RankPercentile's interpolation aggregates.
    *
    * Scale shape: priority bands are FEW and corpus-spanning, so ranks
    * come from ScalableRank's grouped prefix sum — NOT
    * Window.partitionBy(priority), which would funnel a fifth of the
    * fact table into one task (the trimmedStats contract). Only the
    * ≤ 4 needed ranks per (band, percentile) survive to the final
    * aggregate. */
  def cycleTime(cleanOrders: DataFrame, cleanLineitem: DataFrame): DataFrame = {
    import graft.operators.{RankPercentile, ScalableRank}
    val j = cleanLineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("ship_date"))
      .join(cleanOrders.select(col("o_orderkey").as("l_orderkey"),
        col("order_date"), col("o_orderpriority")), Seq("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("ship_date"), col("order_date")).cast("long").as("delay_days"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = ScalableRank.withGroupedPrefixSum(j, col("o_orderpriority"),
        Seq(col("delay_days").asc, col("l_orderkey").asc, col("l_linenumber").asc),
        lit(1L), "_ct_r0")
      .withColumn(RankPercentile.RankCol, col("_ct_r0") + lit(1L))
    val totals = j.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n_lines"),
      sum(col("delay_days")).as("_sum_delay"),
      min(col("delay_days")).as("min_delay"),
      max(col("delay_days")).as("max_delay"))
    val frame = ranked
      .join(totals.select(col("o_orderpriority"),
        col("n_lines").as(RankPercentile.CountCol)), Seq("o_orderpriority"))
      .withColumn(RankPercentile.ValueCol, col("delay_days").cast("double"))
    val pcts = RankPercentile.atNeededRanks(frame, Seq(0.5, 0.95))
      .groupBy("o_orderpriority")
      .agg(RankPercentile.pct(0.5).as("p50_delay"),
        RankPercentile.pct(0.95).as("p95_delay"))
    totals.join(pcts, Seq("o_orderpriority"))
      .withColumn("avg_delay",
        col("_sum_delay").cast("double") / col("n_lines").cast("double"))
      .select("o_orderpriority", "n_lines", "avg_delay", "p50_delay",
        "p95_delay", "min_delay", "max_delay")
      .orderBy("o_orderpriority")
  }
}
