package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueriesShared._

/** Registry slice: core relational, cleaning, gold revenue, star schema, bronze.
  * Split from the monolithic Queries.scala (r11) — a pure move with zero
  * behavior change; shared oracle CTE fragments live in [[QueriesShared]].
  */
private[graft] object QueriesCore {
  private[graft] lazy val defs: Seq[QueryDef] = Seq(

    QueryDef("q_pricing_summary",
      (s, d) => {
        import graft.util.Cols._
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2000-09-01 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumMoney(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sumMoneyTimes(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
            sumMoneyTimes(col("l_extendedprice"),
              (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            avgMoney(col("l_quantity")).as("avg_qty"),
            avgMoney(col("l_extendedprice")).as("avg_price"),
            (sum(col("l_discount").cast(org.apache.spark.sql.types.DecimalType(18, 8)))
              .cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q_clean_orders",
      (s, d) => Cleaning.cleanOrders(Tables.orders(s, d))
        .select("o_orderkey", "o_custkey", "o_totalprice", "status_normalized",
          "amount_tier", "order_date", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some(CleanOrdersCte +
        """
        |SELECT o_orderkey, o_custkey, o_totalprice, status_normalized, amount_tier, order_date, o_orderpriority
        |FROM clean_orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_clean_lineitem",
      (s, d) => Cleaning.cleanLineitem(Tables.lineitem(s, d))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "net_price", "charge", "is_refund", "ship_date")
        .orderBy("l_orderkey", "l_linenumber"),
      Some(CleanLineitemCte +
        """
        |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, net_price, charge, is_refund, ship_date
        |FROM clean_lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef("q_enrich_orders",
      (s, d) => Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        .select("o_orderkey", "o_custkey", "o_totalprice", "status_normalized",
          "amount_tier", "order_date", "c_name", "c_acctbal", "c_mktsegment",
          "nation_name", "region_name", "region_risk", "is_high_risk_region",
          "negative_balance_flag")
        .orderBy("o_orderkey"),
      Some(CleanOrdersCte +
        s"""
        |SELECT co.o_orderkey, co.o_custkey, co.o_totalprice, co.status_normalized, co.amount_tier, co.order_date,
        |  c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name AS nation_name, r.r_name AS region_name,
        |  CAST(${Enrichment.riskCaseSql("r.r_name")} AS DOUBLE) AS region_risk,
        |  (CAST(${Enrichment.riskCaseSql("r.r_name")} AS DOUBLE) > 0.05) AS is_high_risk_region,
        |  (c.c_acctbal < 0) AS negative_balance_flag
        |FROM clean_orders co
        |JOIN customer c ON co.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY co.o_orderkey""".stripMargin)),

    QueryDef("q_revenue_daily",
      (s, d) => Revenue.revenueDaily(Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)))
        .select("order_date", "region_name", "status_normalized", "amount_tier",
          "total_orders", "gmv", "net_revenue", "fraud_amount", "fraud_orders",
          "failed_payments", "avg_order_value", "median_order_value",
          "p95_order_value", "unique_customers", "fraud_rate", "payment_failure_rate")
        .orderBy("order_date", "region_name", "status_normalized", "amount_tier"),
      Some(CleanOrdersCte +
        s"""
        |, enr AS (
        |  SELECT co.*, r.r_name AS region_name,
        |    (${Enrichment.riskCaseSql("r.r_name")}) > 0.05 AS is_high_risk
        |  FROM clean_orders co
        |  JOIN customer c ON co.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |)
        |SELECT order_date, region_name, status_normalized, amount_tier,
        |  count(*) AS total_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |  CAST(sum(CAST(CASE WHEN status_normalized = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS net_revenue,
        |  CAST(sum(CAST(CASE WHEN is_high_risk THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS fraud_amount,
        |  CAST(sum(CASE WHEN is_high_risk THEN 1 ELSE 0 END) AS BIGINT) AS fraud_orders,
        |  CAST(sum(CASE WHEN status_normalized = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS failed_payments,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_value,
        |  quantile_cont(o_totalprice, 0.5) AS median_order_value,
        |  quantile_cont(o_totalprice, 0.95) AS p95_order_value,
        |  count(DISTINCT o_custkey) AS unique_customers,
        |  CAST(sum(CASE WHEN is_high_risk THEN 1 ELSE 0 END) AS BIGINT) / (count(*) + CAST(0.001 AS DOUBLE)) AS fraud_rate,
        |  CAST(sum(CASE WHEN status_normalized = 'P' THEN 1 ELSE 0 END) AS BIGINT) / (count(*) + CAST(0.001 AS DOUBLE)) AS payment_failure_rate
        |FROM enr
        |GROUP BY order_date, region_name, status_normalized, amount_tier
        |ORDER BY order_date, region_name, status_normalized, amount_tier""".stripMargin)),

    // MoM/YoY growth per priority band: (band, month)-grain decimal sums
    // first, then EXPLICIT calendar self-joins on shifted month keys —
    // a row-LAG would mispair across calendar gaps (Revenue.growthTrend).
    QueryDef("q_growth_trend",
      (s, d) => Revenue.growthTrend(Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("o_orderpriority", "month"),
      Some(CleanOrdersCte +
        """
        |, m AS (
        |  SELECT o_orderpriority,
        |    CAST(date_trunc('month', order_date) AS DATE) AS month,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    CAST(count(*) AS BIGINT) AS orders
        |  FROM clean_orders GROUP BY 1, 2
        |)
        |SELECT m.o_orderpriority, m.month, m.orders, m.revenue,
        |  pm.revenue AS prev_month_rev,
        |  (m.revenue - pm.revenue) / pm.revenue AS mom_growth,
        |  py.revenue AS prev_year_rev,
        |  (m.revenue - py.revenue) / py.revenue AS yoy_growth
        |FROM m
        |LEFT JOIN m pm ON pm.o_orderpriority = m.o_orderpriority
        |  AND CAST(pm.month + INTERVAL 1 MONTH AS DATE) = m.month
        |LEFT JOIN m py ON py.o_orderpriority = m.o_orderpriority
        |  AND CAST(py.month + INTERVAL 12 MONTH AS DATE) = m.month
        |ORDER BY 1, 2""".stripMargin)),

    QueryDef("q_revenue_hourly",
      (s, d) => Revenue.revenueHourly(Tables.events(s, d))
        .select("hour_ts", "purchase_count", "hourly_gmv", "avg_purchase", "active_users")
        .orderBy("hour_ts"),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
        |  count(*) AS purchase_count,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hourly_gmv,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_purchase,
        |  count(DISTINCT user_id) AS active_users
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q_product_metrics",
      (s, d) => Revenue.productMetrics(
          Cleaning.cleanLineitem(Tables.lineitem(s, d)), Tables.part(s, d))
        .select("p_type", "line_count", "type_revenue", "units_sold",
          "avg_line_price", "refund_lines", "refund_rate")
        .orderBy("p_type"),
      Some(CleanLineitemCte +
        """
        |SELECT p_type, count(*) AS line_count,
        |  CAST(sum(CAST(net_price AS DECIMAL(18,6))) AS DOUBLE) AS type_revenue,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS units_sold,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_line_price,
        |  CAST(sum(CASE WHEN is_refund THEN 1 ELSE 0 END) AS BIGINT) AS refund_lines,
        |  CAST(sum(CASE WHEN is_refund THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS refund_rate
        |FROM clean_lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin)),

    QueryDef("q_top_customers",
      (s, d) => Revenue.topCustomers(
          Cleaning.cleanOrders(Tables.orders(s, d)), Tables.customer(s, d), 25)
        .orderBy("revenue_rank"),
      Some(CleanOrdersCte +
        """
        |, per_cust AS (
        |  SELECT o_custkey, count(*) AS order_count,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM clean_orders GROUP BY o_custkey
        |)
        |SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY revenue DESC, o_custkey) AS revenue_rank,
        |         o_custkey, c_name, c_mktsegment, order_count, revenue
        |  FROM per_cust JOIN customer ON o_custkey = c_custkey
        |) t WHERE revenue_rank <= 25 ORDER BY revenue_rank""".stripMargin)),

    QueryDef("q_market_share",
      (s, d) => Revenue.marketShare(
          Cleaning.cleanOrders(Tables.orders(s, d)), Tables.customer(s, d))
        .select("c_mktsegment", "segment_revenue", "segment_orders", "revenue_share")
        .orderBy("c_mktsegment"),
      Some(CleanOrdersCte +
        """
        |, seg AS (
        |  SELECT c_mktsegment,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue,
        |    count(*) AS segment_orders
        |  FROM clean_orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment
        |)
        |SELECT c_mktsegment, segment_revenue, segment_orders,
        |  segment_revenue / CAST(sum(CAST(segment_revenue AS DECIMAL(28,2))) OVER () AS DOUBLE) AS revenue_share
        |FROM seg ORDER BY c_mktsegment""".stripMargin)),

    QueryDef("q_dim_customers",
      (s, d) => StarSchema.dimCustomers(
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        .orderBy("customer_id"),
      Some("""SELECT md5(CAST(c_custkey AS VARCHAR)) AS customer_sk,
        |  c_custkey AS customer_id, c_name AS customer_name,
        |  n_name AS nation_name, r_name AS region_name,
        |  c_acctbal AS account_balance, c_mktsegment AS market_segment,
        |  (c_acctbal < 0) AS negative_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY customer_id""".stripMargin)),

    QueryDef("q_dim_dates",
      (s, d) => StarSchema.dimDates(Tables.orders(s, d)).orderBy("date_day"),
      Some("""WITH spine AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders),
        |anch AS (SELECT max(date_day) AS today FROM spine)
        |SELECT md5(CAST(date_day AS VARCHAR)) AS date_sk, date_day,
        |  CAST(year(date_day) AS BIGINT) AS year,
        |  CAST(quarter(date_day) AS BIGINT) AS quarter,
        |  CAST(month(date_day) AS BIGINT) AS month,
        |  monthname(date_day) AS month_name,
        |  CAST(weekofyear(date_day) AS BIGINT) AS week_of_year,
        |  CAST(dayofmonth(date_day) AS BIGINT) AS day_of_month,
        |  CAST(dayofweek(date_day) + 1 AS BIGINT) AS day_of_week,
        |  strftime(date_day, '%Y-%m') AS year_month,
        |  (dayofweek(date_day) IN (0, 6)) AS is_weekend,
        |  (month(date_day) IN (11, 12, 1)) AS is_holiday_season,
        |  (date_day = today) AS is_today,
        |  (date_day = today - 1) AS is_yesterday,
        |  (date_day >= today - 6) AS is_last_7d,
        |  (date_day >= today - 29) AS is_last_30d,
        |  (date_day >= today - 89) AS is_last_90d
        |FROM spine CROSS JOIN anch
        |ORDER BY date_day""".stripMargin)),

    QueryDef("q_fact_orders",
      (s, d) => StarSchema.factOrders(Tables.orders(s, d), Tables.lineitem(s, d))
        .orderBy("order_id"),
      Some("""WITH line_rollup AS (
        |  SELECT l_orderkey, count(*) AS line_count,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS net_revenue,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT md5(CAST(o_orderkey AS VARCHAR)) AS order_sk,
        |  md5(CAST(o_custkey AS VARCHAR)) AS customer_sk,
        |  md5(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS date_sk,
        |  o_orderkey AS order_id, o_custkey AS customer_id,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  o_orderstatus AS order_status, o_totalprice AS order_amount,
        |  COALESCE(line_count, 0) AS line_count,
        |  COALESCE(total_quantity, 0.0) AS total_quantity,
        |  COALESCE(net_revenue, 0.0) AS net_revenue,
        |  COALESCE(returned_lines, 0) AS returned_lines,
        |  (COALESCE(returned_lines, 0) > 0) AS has_return
        |FROM orders LEFT JOIN line_rollup ON o_orderkey = l_orderkey
        |ORDER BY order_id""".stripMargin)),

    QueryDef("q_fact_events",
      (s, d) => StarSchema.factEvents(Tables.events(s, d)).orderBy("event_id"),
      Some("""SELECT md5(CAST(event_id AS VARCHAR)) AS event_sk,
        |  md5(CAST(user_id AS VARCHAR)) AS user_sk,
        |  event_id, user_id,
        |  CAST(ts AS DATE) AS event_date,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_second,
        |  event_type, value,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |  (event_type = 'error') AS is_error,
        |  (event_type = 'purchase') AS is_purchase
        |FROM events ORDER BY event_id""".stripMargin)),

    QueryDef("q_bronze_events",
      (s, d) => Bronze.bronzeEvents(Tables.events(s, d))
        .select("event_id", "user_id", "event_type", "value", "props", "prop_k",
          "event_date", "ts_second", "_source_system", "_pipeline_version")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type, value, props,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
        |  CAST(ts AS DATE) AS event_date,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_second,
        |  'file-stream' AS _source_system,
        |  '1.0.0' AS _pipeline_version
        |FROM events ORDER BY event_id""".stripMargin))
  )
}
