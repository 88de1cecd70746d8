package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One definition per operator from SURVEY.md §2: the Spark query plus its
  * DuckDB oracle (None → driver records rows-only).
  * Oracle-compat rules: SURVEY.md §4.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  // Shared by q_dedup_clusters and q_dedup_clusters_star: both algorithms
  // contract every component to its minimum doc_id, so one recursive-CTE
  // oracle gates both.
  private val DedupClusterCtes =
    "WITH RECURSIVE " + text.MinHash.candidatePairsSqlCtes.stripPrefix("WITH ") +
      """
      |, edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), walk(node, reach) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
      |), lab AS (
      |  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
      |), sz AS (
      |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
      |)""".stripMargin

  private val DedupClustersOracle = DedupClusterCtes +
    """
      |SELECT l.doc_id, l.cluster_id, sz.cluster_size,
      |  l.doc_id = l.cluster_id AS is_canonical
      |FROM lab l JOIN sz USING (cluster_id) ORDER BY l.doc_id""".stripMargin

  // Fixed retrieval probe for q_bm25_rank: terms known to appear across the
  // synthetic corpus vocabulary.
  private val Bm25QueryTerms = Seq("spark", "hash", "join", "stream")

  // ---- shared oracle CTE fragments (mirror graft.operators.Cleaning) ----

  private val CleanOrdersCte =
    """WITH clean_orders AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |         CASE WHEN o_orderstatus IN ('O','F','P') THEN o_orderstatus ELSE 'unknown' END AS status_normalized,
      |         CASE WHEN o_totalprice < 50000 THEN 'micro'
      |              WHEN o_totalprice < 100000 THEN 'low'
      |              WHEN o_totalprice < 200000 THEN 'medium'
      |              WHEN o_totalprice < 400000 THEN 'high'
      |              ELSE 'premium' END AS amount_tier,
      |         CAST(o_orderdate AS DATE) AS order_date
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_custkey, o_totalprice) AS _rn
      |    FROM orders
      |    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      |      AND o_totalprice > 0 AND o_totalprice < 10000000
      |  ) t WHERE _rn = 1
      |)""".stripMargin

  private val CleanLineitemCte =
    """WITH clean_lineitem AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
      |         l_discount, l_tax, l_returnflag, l_linestatus,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4)) AS DOUBLE) AS charge,
      |         (l_returnflag = 'R') AS is_refund,
      |         CAST(l_shipdate AS DATE) AS ship_date
      |  FROM lineitem
      |  WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_discount >= 0 AND l_discount <= 1
      |)""".stripMargin

  // Enriched orders + window features, shared by q_feature_vector/q_fraud_score.
  private val EnrichedFeaturesCte = CleanOrdersCte +
    s"""
    |, enr AS (
    |  SELECT co.o_orderkey, co.o_custkey, co.o_totalprice, co.amount_tier, co.order_date,
    |    c.c_acctbal,
    |    CAST(${Enrichment.riskCaseSql("r.r_name")} AS DOUBLE) AS region_risk
    |  FROM clean_orders co
    |  JOIN customer c ON co.o_custkey = c.c_custkey
    |  JOIN nation n ON c.c_nationkey = n.n_nationkey
    |  JOIN region r ON n.n_regionkey = r.r_regionkey
    |), fx AS (
    |  SELECT o_orderkey, o_custkey, o_totalprice, amount_tier, region_risk, c_acctbal,
    |    CAST(ln(1.0 + o_totalprice) AS FLOAT) AS amount_log,
    |    CAST(month(order_date) AS BIGINT) AS order_month,
    |    CAST(dayofweek(order_date) + 1 AS BIGINT) AS order_dow,
    |    CAST(dayofweek(order_date) IN (0, 6) AS BIGINT) AS is_weekend,
    |    count(*) OVER w AS user_order_count,
    |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS user_avg_amount,
    |    o_totalprice / (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w) AS amount_vs_user_avg
    |  FROM enr WINDOW w AS (PARTITION BY o_custkey)
    |), fv AS (
    |  SELECT o_orderkey, o_custkey, o_totalprice AS total_amount, amount_log, order_month, order_dow,
    |    is_weekend, user_order_count, user_avg_amount, amount_vs_user_avg, region_risk,
    |    CAST(region_risk > 0.05 AS BIGINT) AS is_high_risk_region,
    |    CAST(c_acctbal < 0 AS BIGINT) AS negative_balance,
    |    c_acctbal AS account_balance,
    |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
    |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
    |  FROM fx
    |)""".stripMargin

  private val EventsUsCte =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
      |)""".stripMargin

  // Literal-scorer output (mirrors FraudScore.score), shared by the
  // model-evaluation oracles (q_roc_auc, q_calibration).
  private val ScoredCte = EnrichedFeaturesCte +
    """
    |, zed AS (
    |  SELECT o_orderkey, label,
    |    CAST(CAST(-4.0 AS DOUBLE) + amount_vs_user_avg * CAST(0.9 AS DOUBLE)
    |         + region_risk * CAST(11.0 AS DOUBLE)
    |         + CAST(is_high_risk_region AS DOUBLE) * CAST(0.8 AS DOUBLE)
    |         + CAST(negative_balance AS DOUBLE) * CAST(0.6 AS DOUBLE)
    |         + CAST(is_weekend AS DOUBLE) * CAST(0.15 AS DOUBLE)
    |         + CAST(amount_log AS DOUBLE) * CAST(0.12 AS DOUBLE) AS FLOAT) AS z
    |  FROM fv
    |), scored AS (
    |  SELECT o_orderkey, label, CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) AS fraud_score FROM zed
    |)""".stripMargin

  // ---- registry ----

  val registry: Seq[QueryDef] = batch1 ++ batch2 ++ batch3 ++ batch4 ++ batch5 ++ batch6 ++ batch7 ++ batch8

  private lazy val batch1: Seq[QueryDef] = Seq(

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
      Some("""SELECT md5(CAST(date_day AS VARCHAR)) AS date_sk, date_day,
        |  CAST(year(date_day) AS BIGINT) AS year,
        |  CAST(quarter(date_day) AS BIGINT) AS quarter,
        |  CAST(month(date_day) AS BIGINT) AS month,
        |  CAST(dayofmonth(date_day) AS BIGINT) AS day_of_month,
        |  CAST(dayofweek(date_day) + 1 AS BIGINT) AS day_of_week,
        |  (dayofweek(date_day) IN (0, 6)) AS is_weekend
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders) t
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

  private lazy val batch2: Seq[QueryDef] = Seq(

    QueryDef("q_txn_features",
      (s, d) => Features.txnFeatures(Cleaning.cleanOrders(Tables.orders(s, d)))
        .select("o_orderkey", "o_custkey", "o_totalprice", "amount_log",
          "order_month", "order_dow", "is_weekend", "user_order_count",
          "user_avg_amount", "user_max_amount", "user_min_amount", "amount_vs_user_avg")
        .orderBy("o_orderkey"),
      Some(CleanOrdersCte +
        """
        |SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(ln(1.0 + o_totalprice) AS FLOAT) AS amount_log,
        |  CAST(month(order_date) AS BIGINT) AS order_month,
        |  CAST(dayofweek(order_date) + 1 AS BIGINT) AS order_dow,
        |  (dayofweek(order_date) IN (0, 6)) AS is_weekend,
        |  count(*) OVER w AS user_order_count,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS user_avg_amount,
        |  max(o_totalprice) OVER w AS user_max_amount,
        |  min(o_totalprice) OVER w AS user_min_amount,
        |  o_totalprice / (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w) AS amount_vs_user_avg
        |FROM clean_orders WINDOW w AS (PARTITION BY o_custkey)
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_user_percentiles",
      (s, d) => Features.userPercentiles(Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("o_custkey"),
      Some(CleanOrdersCte +
        """
        |SELECT o_custkey, count(*) AS order_count,
        |  quantile_cont(o_totalprice, 0.5) AS p50_amount,
        |  quantile_cont(o_totalprice, 0.95) AS p95_amount,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM clean_orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    QueryDef("q_velocity",
      (s, d) => Features.velocity(Tables.events(s, d))
        .select("event_id", "user_id", "event_type", "value", "ts_us",
          "velocity_1h", "velocity_24h", "velocity_7d", "value_sum_24h")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us,
        |  count(*) OVER w1 AS velocity_1h,
        |  count(*) OVER w24 AS velocity_24h,
        |  count(*) OVER w7d AS velocity_7d,
        |  COALESCE(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w24 AS DOUBLE), 0.0) AS value_sum_24h
        |FROM events
        |WINDOW
        |  w1 AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING),
        |  w24 AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING),
        |  w7d AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin)),

    QueryDef("q_lag_lead",
      (s, d) => Features.lagLead(Tables.events(s, d))
        .select("event_id", "user_id", "event_type", "ts_us", "prev_ts_us",
          "prev_event_type", "next_event_type", "micros_since_prev", "seq_in_user")
        .orderBy("event_id"),
      Some(EventsUsCte +
        """
        |SELECT event_id, user_id, event_type, ts_us,
        |  lag(ts_us, 1) OVER w AS prev_ts_us,
        |  lag(event_type, 1) OVER w AS prev_event_type,
        |  lead(event_type, 1) OVER w AS next_event_type,
        |  ts_us - lag(ts_us, 1) OVER w AS micros_since_prev,
        |  CAST(row_number() OVER w AS BIGINT) AS seq_in_user
        |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin)),

    QueryDef("q_rank_ntile",
      (s, d) => Features.spendRanking(Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("o_custkey"),
      Some(CleanOrdersCte +
        """
        |, per_cust AS (
        |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM clean_orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, revenue,
        |  CAST(ntile(10) OVER wt AS BIGINT) AS revenue_decile,
        |  CAST(rank() OVER wv AS BIGINT) AS revenue_rank,
        |  CAST(dense_rank() OVER wv AS BIGINT) AS revenue_dense_rank,
        |  CAST(row_number() OVER wt AS BIGINT) AS revenue_row
        |FROM per_cust
        |WINDOW wv AS (ORDER BY revenue DESC),
        |       wt AS (ORDER BY revenue DESC, o_custkey ASC)
        |ORDER BY o_custkey""".stripMargin)),

    // Remaining analytic-window breadth: percent_rank/cume_dist + value
    // navigation, all over PARTITIONED windows (per-customer — scale-safe).
    QueryDef("q_window_suite",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Cleaning.cleanOrders(Tables.orders(s, d))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume_dist", cume_dist().over(w))
          .withColumn("largest_amount", first(col("o_totalprice")).over(wf))
          .withColumn("smallest_amount", last(col("o_totalprice")).over(wf))
          .withColumn("second_amount", nth_value(col("o_totalprice"), 2).over(wf))
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |SELECT o_orderkey, o_custkey, o_totalprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume_dist,
        |  first_value(o_totalprice) OVER wf AS largest_amount,
        |  last_value(o_totalprice) OVER wf AS smallest_amount,
        |  nth_value(o_totalprice, 2) OVER wf AS second_amount
        |FROM clean_orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_running_totals",
      (s, d) => Features.runningTotals(Cleaning.cleanOrders(Tables.orders(s, d)))
        .select("status_normalized", "order_date", "daily_orders", "gmv",
          "cumulative_gmv", "cumulative_orders")
        .orderBy("status_normalized", "order_date"),
      Some(CleanOrdersCte +
        """
        |, daily AS (
        |  SELECT status_normalized, order_date,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS gmv_dec,
        |    count(*) AS daily_orders
        |  FROM clean_orders GROUP BY 1, 2
        |)
        |SELECT status_normalized, order_date, daily_orders,
        |  CAST(gmv_dec AS DOUBLE) AS gmv,
        |  CAST(sum(gmv_dec) OVER w AS DOUBLE) AS cumulative_gmv,
        |  CAST(sum(daily_orders) OVER w AS BIGINT) AS cumulative_orders
        |FROM daily
        |WINDOW w AS (PARTITION BY status_normalized ORDER BY order_date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY status_normalized, order_date""".stripMargin)),

    // Time-series resampling: 6-hour OHLC bars of purchase values per
    // user. One (user, bucket) exchange shared by the open/close window
    // and the bar aggregation.
    QueryDef("q_ohlc_bars",
      (s, d) => Resample.ohlcBars(Tables.events(s, d), 21600000000L)
        .orderBy("user_id", "bucket"),
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase'
        |), b AS (
        |  SELECT *, ts_us // 21600000000 AS bucket,
        |    first_value(value) OVER w AS open,
        |    last_value(value) OVER w AS close
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id, ts_us // 21600000000
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, bucket, max(open) AS open, max(close) AS close,
        |  max(value) AS high, min(value) AS low,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
        |  bucket * 21600000000 AS bucket_start_us
        |FROM b GROUP BY user_id, bucket
        |ORDER BY user_id, bucket""".stripMargin)),

    // Gap-filled daily series with forward-filled close: the dense
    // time-axis every dashboard needs; spine bounded by buckets/key.
    QueryDef("q_gap_fill",
      (s, d) => Resample.gapFill(Resample.ohlcBars(Tables.events(s, d), 86400000000L))
        .orderBy("user_id", "bucket"),
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase'
        |), b AS (
        |  SELECT *, ts_us // 86400000000 AS bucket,
        |    first_value(value) OVER w AS open,
        |    last_value(value) OVER w AS close
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id, ts_us // 86400000000
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |), bars AS (
        |  SELECT user_id, bucket, max(close) AS close, count(*) AS n_events
        |  FROM b GROUP BY user_id, bucket
        |), spans AS (
        |  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM bars GROUP BY user_id
        |), spine AS (
        |  SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM spans
        |)
        |SELECT s.user_id, s.bucket, bars.n_events IS NULL AS is_gap,
        |  last_value(bars.close IGNORE NULLS)
        |    OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS close_ff,
        |  COALESCE(bars.n_events, 0) AS n_events
        |FROM spine s LEFT JOIN bars USING (user_id, bucket)
        |ORDER BY user_id, bucket""".stripMargin)),

    // Bad-record audit over the bronze parse path: per-reason counts of
    // the quarantine split (null/invalid/bad-key/ok) — the explicit form
    // of from_json's silent nulling. Rich cases covered in OperatorsSpec
    // on synthetic malformed payloads.
    QueryDef("q_bronze_quarantine",
      (s, d) => Bronze.withQuarantineReason(Tables.events(s, d))
        .groupBy("quarantine_reason").agg(count(lit(1)).as("n"))
        .orderBy("quarantine_reason"),
      Some("""SELECT quarantine_reason, count(*) AS n FROM (
        |  SELECT CASE
        |    WHEN props IS NULL THEN 'null_props'
        |    WHEN NOT json_valid(props) THEN 'invalid_json'
        |    WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL THEN 'bad_k'
        |    ELSE 'ok' END AS quarantine_reason
        |  FROM events) t
        |GROUP BY quarantine_reason ORDER BY quarantine_reason""".stripMargin)),

    // Per-user EWMA drift baseline + spike flags (batch mirror of the
    // transformWithState StatefulProcessor — StreamingSpec asserts stream
    // parity; rows-only: the EWMA recursion has no stable closed SQL form).
    QueryDef("q_ewma_drift",
      (s, d) => {
        import s.implicits._
        graft.streaming.StatefulDrift.driftBatch(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"),
              expr("ts_ns div 1000").as("ts_us"), col("event_type"), col("value"))
            .as[graft.streaming.StreamOps.Ev])
          .toDF().orderBy("event_id")
      },
      None),

    QueryDef("q_sessionize",
      (s, d) => Sessionize.sessionStats(Tables.events(s, d))
        .select("user_id", "session_idx", "event_count", "session_start_us",
          "session_end_us", "duration_us", "session_value", "purchases", "errors")
        .orderBy("user_id", "session_idx"),
      Some(EventsUsCte +
        """
        |, b AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS is_boundary
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sx AS (
        |  SELECT *, sum(is_boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS event_count,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us,
        |  max(ts_us) - min(ts_us) AS duration_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        |FROM sx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin)),

    // Interval-overlap join via bin blocking (operators.IntervalJoin):
    // co-active session pairs — an interval×interval predicate joined as
    // an EQUI-join on exploded time bins, never a nested-loop cross
    // product. Oracle = DuckDB's native IEJoin over the same sessions.
    QueryDef("q_interval_join",
      (s, d) => operators.IntervalJoin.coActiveSessions(
          Sessionize.sessionStats(Tables.events(s, d)))
        .orderBy("user_a", "user_b"),
      Some(EventsUsCte +
        """
        |, b AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS is_boundary
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sx AS (
        |  SELECT *, sum(is_boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b
        |), sessions AS (
        |  SELECT user_id, session_idx, min(ts_us) AS s_start, max(ts_us) AS s_end
        |  FROM sx GROUP BY user_id, session_idx
        |)
        |SELECT x.user_id AS user_a, y.user_id AS user_b, count(*) AS overlap_count
        |FROM sessions x JOIN sessions y
        |  ON x.user_id < y.user_id AND x.s_start <= y.s_end AND y.s_start <= x.s_end
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            expr("ts_ns div 1000").as("ts_us"))
        AsOfJoin.asOf(
          ev.filter(col("event_type") === "error").drop("event_type"),
          ev.filter(col("event_type") === "purchase").drop("event_type"))
          .select("event_id", "user_id", "ts_us", "value", "asof_value",
            "asof_ts_us", "micros_since_match")
          .orderBy("event_id")
      },
      Some(EventsUsCte +
        """
        |, e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.value,
        |  p.value AS asof_value, p.ts_us AS asof_ts_us,
        |  e.ts_us - p.ts_us AS micros_since_match
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    QueryDef("q_asof_native",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            expr("ts_ns div 1000").as("ts_us"))
        graft.plans.NativeAsOf.asOf(
            ev.filter(col("event_type") === "error").drop("event_type"),
            ev.filter(col("event_type") === "purchase").drop("event_type"),
            "user_id", "ts_us", "value")
          .withColumn("micros_since_match", col("ts_us") - col("asof_ts_us"))
          .select("event_id", "user_id", "ts_us", "value", "asof_value",
            "asof_ts_us", "micros_since_match")
          .orderBy("event_id")
      },
      Some(EventsUsCte +
        """
        |, e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.value,
        |  p.value AS asof_value, p.ts_us AS asof_ts_us,
        |  e.ts_us - p.ts_us AS micros_since_match
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    // The same as-of join through SQL TEXT (graft.plans.GraftSqlParser,
    // Snowflake MATCH_CONDITION grammar) — the reference's consumers are
    // SQL-first, so the custom operator must be reachable from spark.sql.
    // Oracle identical to q_asof_native: the parser is pure surface.
    QueryDef("q_asof_sql",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            expr("ts_ns div 1000").as("ts_us"))
        ev.filter(col("event_type") === "error").drop("event_type")
          .createOrReplaceTempView("asof_errors")
        ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts_us", "value")
          .createOrReplaceTempView("asof_purchases")
        s.sql("""
          SELECT e.event_id, e.user_id, e.ts_us, e.value, e.asof_value,
                 e.asof_ts_us, e.ts_us - e.asof_ts_us AS micros_since_match
          FROM asof_errors e ASOF JOIN asof_purchases p
          MATCH_CONDITION(e.ts_us >= p.ts_us)
          ON e.user_id = p.user_id
          ORDER BY e.event_id""")
      },
      Some(EventsUsCte +
        """
        |, e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.value,
        |  p.value AS asof_value, p.ts_us AS asof_ts_us,
        |  e.ts_us - p.ts_us AS micros_since_match
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    // Generalized-type as-of through the same exec: STRING key (the
    // Catalyst-ordering compare path) and STRING payload (the
    // copyValue path for buffer-backed values).
    QueryDef("q_asof_typed",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id").cast("string").as("user_key"),
            col("event_type"), col("props"), expr("ts_ns div 1000").as("ts_us"))
        graft.plans.NativeAsOf.asOf(
            ev.filter(col("event_type") === "error").drop("event_type"),
            ev.filter(col("event_type") === "purchase").drop("event_type"),
            "user_key", "ts_us", "props")
          .select(col("event_id"), col("user_key"), col("ts_us"),
            col("asof_value").as("matched_props"), col("asof_ts_us"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, CAST(user_id AS VARCHAR) AS user_key, event_type, props,
        |         epoch_us(ts) AS ts_us FROM events
        |), e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_key, e.ts_us,
        |  p.props AS matched_props, p.ts_us AS asof_ts_us
        |FROM e ASOF LEFT JOIN p ON e.user_key = p.user_key AND e.ts_us >= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    // Forward as-of: each error joined to the user's EARLIEST purchase
    // at-or-after it (same custom exec, direction flipped).
    QueryDef("q_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            expr("ts_ns div 1000").as("ts_us"))
        graft.plans.NativeAsOf.asOf(
            ev.filter(col("event_type") === "error").drop("event_type"),
            ev.filter(col("event_type") === "purchase").drop("event_type"),
            "user_id", "ts_us", "value", forward = true)
          .withColumn("micros_to_match", col("asof_ts_us") - col("ts_us"))
          .select("event_id", "user_id", "ts_us", "value", "asof_value",
            "asof_ts_us", "micros_to_match")
          .orderBy("event_id")
      },
      Some(EventsUsCte +
        """
        |, e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.value,
        |  p.value AS asof_value, p.ts_us AS asof_ts_us,
        |  p.ts_us - e.ts_us AS micros_to_match
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us <= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    // Tolerance as-of: backward match nulled when older than 1 hour
    // (pandas merge_asof tolerance semantics, same single-pass merge).
    QueryDef("q_asof_tolerance",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
            expr("ts_ns div 1000").as("ts_us"))
        graft.plans.NativeAsOf.asOf(
            ev.filter(col("event_type") === "error").drop("event_type"),
            ev.filter(col("event_type") === "purchase").drop("event_type"),
            "user_id", "ts_us", "value", toleranceUs = 3600000000L)
          .select("event_id", "user_id", "ts_us", "value", "asof_value", "asof_ts_us")
          .orderBy("event_id")
      },
      Some(EventsUsCte +
        """
        |, e AS (SELECT * FROM ev WHERE event_type = 'error'),
        |  p AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.value,
        |  CASE WHEN e.ts_us - p.ts_us <= 3600000000 THEN p.value END AS asof_value,
        |  CASE WHEN e.ts_us - p.ts_us <= 3600000000 THEN p.ts_us END AS asof_ts_us
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
        |ORDER BY e.event_id""".stripMargin)),

    QueryDef("q_range_join",
      (s, d) => RangeJoin.partPriceBands(s, Tables.part(s, d)).orderBy("p_partkey"),
      Some("""WITH bands(band_name, band_lo, band_hi) AS (VALUES
        |  ('p0_cheap', 0.0, 500.0), ('p1_low', 500.0, 900.0), ('p2_mid', 900.0, 1300.0),
        |  ('p3_high', 1300.0, 1700.0), ('p4_premium', 1700.0, 1e308))
        |SELECT p_partkey, p_type, p_retailprice, band_name
        |FROM part JOIN bands ON p_retailprice >= band_lo AND p_retailprice < band_hi
        |ORDER BY p_partkey""".stripMargin)),

    QueryDef("q_dq_checks",
      (s, d) => DataQuality.suite(Tables.orders(s, d), Tables.lineitem(s, d),
          Tables.customer(s, d), Tables.events(s, d))
        .orderBy("check_name"),
      Some("""SELECT * FROM (
        |  SELECT 'orders_orderkey_not_null' AS check_name, 'orders' AS table_name,
        |    count(*) AS violation_count, count(*) = 0 AS passed FROM orders WHERE o_orderkey IS NULL
        |  UNION ALL
        |  SELECT 'orders_amount_positive', 'orders', count(*), count(*) = 0 FROM orders WHERE o_totalprice <= 0
        |  UNION ALL
        |  SELECT 'orders_amount_upper_bound', 'orders', count(*), count(*) = 0 FROM orders WHERE o_totalprice >= 10000000
        |  UNION ALL
        |  SELECT 'orders_status_domain', 'orders', count(*), count(*) = 0 FROM orders WHERE o_orderstatus NOT IN ('O','F','P')
        |  UNION ALL
        |  SELECT 'orders_orderkey_unique', 'orders', count(*), count(*) = 0 FROM
        |    (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t
        |  UNION ALL
        |  SELECT 'lineitem_quantity_positive', 'lineitem', count(*), count(*) = 0 FROM lineitem WHERE l_quantity <= 0
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', 'lineitem', count(*), count(*) = 0 FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |  UNION ALL
        |  SELECT 'lineitem_returnflag_domain', 'lineitem', count(*), count(*) = 0 FROM lineitem WHERE l_returnflag NOT IN ('A','N','R')
        |  UNION ALL
        |  SELECT 'customer_acctbal_not_null', 'customer', count(*), count(*) = 0 FROM customer WHERE c_acctbal IS NULL
        |  UNION ALL
        |  SELECT 'events_type_domain', 'events', count(*), count(*) = 0 FROM events WHERE event_type NOT IN ('click','view','signup','purchase','error')
        |  UNION ALL
        |  SELECT 'events_value_not_negative', 'events', count(*), count(*) = 0 FROM events WHERE value < 0
        |) t ORDER BY check_name""".stripMargin)),

    QueryDef("q_dq_referential",
      (s, d) => DataQuality.referential(Tables.orders(s, d), Tables.lineitem(s, d),
          Tables.customer(s, d), Tables.events(s, d))
        .orderBy("check_name"),
      Some("""SELECT * FROM (
        |  SELECT 'lineitem_orderkey_in_orders' AS check_name, 'lineitem' AS table_name,
        |    count(*) AS violation_count, count(*) = 0 AS passed
        |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_custkey_in_customer', 'orders', count(*), count(*) = 0
        |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'events_userid_in_customer', 'events', count(*), count(*) = 0
        |  FROM events e WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
        |) t ORDER BY check_name""".stripMargin)),

    // Z-order layout key: sorting the fact by the interleaved code
    // co-locates rows close in BOTH (date, customer) — the reference's
    // Delta Z-ORDER BY re-expressed as a native codegen expression + sort.
    QueryDef("q_zorder_orders",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Cleaning.cleanOrders(Tables.orders(s, d))
          .select(col("o_orderkey"), col("o_custkey"),
            datediff(col("order_date"), lit("1970-01-01").cast("date"))
              .cast("long").as("day_key"))
          .withColumn("z_key", expr("morton2(day_key, o_custkey)"))
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        s"""
        |SELECT o_orderkey, o_custkey, day_key,
        |  ${// the spread chain textually duplicates its input ~32×, so bind
           // short aliases in a subquery instead of inlining the CAST
           graft.functions.MortonSql.morton2Sql("sa", "sb")} AS z_key
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(order_date - DATE '1970-01-01' AS BIGINT) AS day_key,
        |    CAST(order_date - DATE '1970-01-01' AS BIGINT) AS sa,
        |    o_custkey AS sb
        |  FROM clean_orders
        |) t ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_profile_lineitem",
      (s, d) => operators.Profiling.profileNumeric(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("column_name"),
      Some {
        // text-path decimal→double (exact text, one correctly-rounded
        // parse) — second moments exceed the 2^53 direct-cast bound
        def one(c: String) =
          s"""SELECT '$c' AS column_name, count(*) AS row_count, count($c) AS value_count,
             |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
             |    count(DISTINCT $c) AS distinct_count,
             |    CAST(min($c) AS DOUBLE) AS min_value, CAST(max($c) AS DOUBLE) AS max_value,
             |    CAST(CAST(sum(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
             |    CAST(CAST(sum(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sumsq_value
             |  FROM lineitem""".stripMargin
        val union = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(one).mkString("\n  UNION ALL ")
        s"""SELECT column_name, row_count, value_count, null_count, distinct_count, min_value,
           |  max_value, sum_value,
           |  sum_value / value_count AS mean,
           |  (sumsq_value - sum_value * sum_value / value_count) / value_count AS variance,
           |  sqrt((sumsq_value - sum_value * sum_value / value_count) / value_count) AS stddev
           |FROM (
           |  $union
           |) t ORDER BY column_name""".stripMargin
      }),

    QueryDef("q_corr_lineitem",
      (s, d) => operators.Profiling.correlation(Tables.lineitem(s, d),
        "l_quantity", "l_extendedprice"),
      Some("""SELECT 'l_quantity' AS x_column, 'l_extendedprice' AS y_column, n,
        |  sum_xy / n - (sum_x / n) * (sum_y / n) AS covariance,
        |  (sum_xy / n - (sum_x / n) * (sum_y / n))
        |    / (sqrt(sum_x2 / n - (sum_x / n) * (sum_x / n))
        |     * sqrt(sum_y2 / n - (sum_y / n) * (sum_y / n))) AS corr
        |FROM (
        |  SELECT count(*) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_x,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_y,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_xy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_x2,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_y2
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |) t""".stripMargin)),

    QueryDef("q_dq_marts",
      (s, d) => DataQuality.martsSuite(
          StarSchema.dimCustomers(Tables.customer(s, d), Tables.nation(s, d),
            Tables.region(s, d)),
          StarSchema.dimDates(Tables.orders(s, d)),
          StarSchema.factOrders(Tables.orders(s, d), Tables.lineitem(s, d)),
          StarSchema.factEvents(Tables.events(s, d)))
        .orderBy("check_name"),
      Some("""WITH dim_customers AS (
        |  SELECT md5(CAST(c_custkey AS VARCHAR)) AS customer_sk, c_custkey AS customer_id,
        |    r_name AS region_name, c_mktsegment AS market_segment
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |), dim_dates AS (
        |  SELECT md5(CAST(date_day AS VARCHAR)) AS date_sk,
        |    CAST(year(date_day) AS BIGINT) AS year,
        |    CAST(dayofweek(date_day) + 1 AS BIGINT) AS day_of_week,
        |    (dayofweek(date_day) IN (0, 6)) AS is_weekend
        |  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_day FROM orders) t
        |), line_rollup AS (
        |  SELECT l_orderkey, count(*) AS line_count,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS net_revenue,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines
        |  FROM lineitem GROUP BY l_orderkey
        |), fact_orders AS (
        |  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS order_sk,
        |    CAST(o_orderdate AS DATE) AS order_date, o_orderstatus AS order_status,
        |    o_totalprice AS order_amount,
        |    COALESCE(line_count, 0) AS line_count,
        |    COALESCE(net_revenue, 0.0) AS net_revenue,
        |    COALESCE(returned_lines, 0) AS returned_lines
        |  FROM orders LEFT JOIN line_rollup ON o_orderkey = l_orderkey
        |), fact_events AS (
        |  SELECT md5(CAST(event_id AS VARCHAR)) AS event_sk, CAST(ts AS DATE) AS event_date,
        |    (event_type = 'error') AS is_error, (event_type = 'purchase') AS is_purchase
        |  FROM events
        |), checks AS (
        |  SELECT 'dim_customers_sk_not_null' AS check_name, 'dim_customers' AS table_name,
        |    CAST(sum(CASE WHEN customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violation_count FROM dim_customers
        |  UNION ALL SELECT 'dim_customers_id_not_null', 'dim_customers',
        |    CAST(sum(CASE WHEN customer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dim_customers
        |  UNION ALL SELECT 'dim_customers_segment_domain', 'dim_customers',
        |    CAST(sum(CASE WHEN market_segment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT) FROM dim_customers
        |  UNION ALL SELECT 'dim_customers_region_domain', 'dim_customers',
        |    CAST(sum(CASE WHEN region_name NOT IN ('AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST') THEN 1 ELSE 0 END) AS BIGINT) FROM dim_customers
        |  UNION ALL SELECT 'dim_dates_sk_not_null', 'dim_dates',
        |    CAST(sum(CASE WHEN date_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM dim_dates
        |  UNION ALL SELECT 'dim_dates_year_bounds', 'dim_dates',
        |    CAST(sum(CASE WHEN year < 1990 OR year > 2010 THEN 1 ELSE 0 END) AS BIGINT) FROM dim_dates
        |  UNION ALL SELECT 'dim_dates_weekend_consistent', 'dim_dates',
        |    CAST(sum(CASE WHEN is_weekend != (day_of_week IN (1, 7)) THEN 1 ELSE 0 END) AS BIGINT) FROM dim_dates
        |  UNION ALL SELECT 'fact_orders_sk_not_null', 'fact_orders',
        |    CAST(sum(CASE WHEN order_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_orders_date_not_null', 'fact_orders',
        |    CAST(sum(CASE WHEN order_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_orders_amount_nonneg', 'fact_orders',
        |    CAST(sum(CASE WHEN order_amount < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_orders_net_revenue_nonneg', 'fact_orders',
        |    CAST(sum(CASE WHEN net_revenue < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_orders_status_domain', 'fact_orders',
        |    CAST(sum(CASE WHEN order_status NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_orders_returns_bounded', 'fact_orders',
        |    CAST(sum(CASE WHEN returned_lines > line_count THEN 1 ELSE 0 END) AS BIGINT) FROM fact_orders
        |  UNION ALL SELECT 'fact_events_sk_not_null', 'fact_events',
        |    CAST(sum(CASE WHEN event_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fact_events
        |  UNION ALL SELECT 'fact_events_date_not_null', 'fact_events',
        |    CAST(sum(CASE WHEN event_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fact_events
        |  UNION ALL SELECT 'fact_events_flags_exclusive', 'fact_events',
        |    CAST(sum(CASE WHEN is_error AND is_purchase THEN 1 ELSE 0 END) AS BIGINT) FROM fact_events
        |  UNION ALL SELECT 'dim_customers_sk_unique', 'dim_customers',
        |    count(customer_sk) - count(DISTINCT customer_sk) FROM dim_customers
        |  UNION ALL SELECT 'dim_dates_sk_unique', 'dim_dates',
        |    count(date_sk) - count(DISTINCT date_sk) FROM dim_dates
        |  UNION ALL SELECT 'fact_orders_sk_unique', 'fact_orders',
        |    count(order_sk) - count(DISTINCT order_sk) FROM fact_orders
        |  UNION ALL SELECT 'fact_events_sk_unique', 'fact_events',
        |    count(event_sk) - count(DISTINCT event_sk) FROM fact_events
        |)
        |SELECT check_name, table_name, violation_count, violation_count = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin)),

    // Fraud-side dbt parity: gold-source checks + fraud-mart
    // accepted_values/accepted_range + the two singular data tests.
    QueryDef("q_dq_fraud_marts",
      (s, d) => {
        val enriched = Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        DataQuality.fraudMartsSuite(
            Revenue.revenueDaily(enriched),
            FraudSummary.fraudSummaryDaily(Tables.events(s, d)),
            FraudSummary.userRiskScores(Tables.events(s, d)),
            FraudScore.score(FraudScore.featureVector(enriched)))
          .orderBy("check_name")
      },
      Some(EnrichedFeaturesCte +
        s"""
        |, enr2 AS (
        |  SELECT co.*, r.r_name AS region_name,
        |    (${Enrichment.riskCaseSql("r.r_name")}) > 0.05 AS is_high_risk
        |  FROM clean_orders co
        |  JOIN customer c ON co.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), rev AS (
        |  SELECT order_date, region_name, status_normalized, amount_tier,
        |    count(*) AS total_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |    CAST(sum(CASE WHEN is_high_risk THEN 1 ELSE 0 END) AS BIGINT) / (count(*) + CAST(0.001 AS DOUBLE)) AS fraud_rate
        |  FROM enr2 GROUP BY 1, 2, 3, 4
        |), fsum AS (
        |  SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS error_rate,
        |    CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |      / (CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |         + CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)) AS error_value_rate
        |  FROM events GROUP BY 1
        |), ur AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 0.55
        |      + (1.0 - CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.25
        |      + (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 1000.0) * 0.20 AS composite_risk_score
        |  FROM events GROUP BY user_id
        |), ur2 AS (
        |  SELECT user_id, composite_risk_score,
        |    CASE WHEN composite_risk_score >= 0.50 THEN 'high'
        |         WHEN composite_risk_score >= 0.30 THEN 'medium'
        |         ELSE 'low' END AS risk_label
        |  FROM ur
        |), zed AS (
        |  SELECT o_orderkey, total_amount,
        |    CAST(CAST(-4.0 AS DOUBLE) + amount_vs_user_avg * CAST(0.9 AS DOUBLE)
        |         + region_risk * CAST(11.0 AS DOUBLE)
        |         + CAST(is_high_risk_region AS DOUBLE) * CAST(0.8 AS DOUBLE)
        |         + CAST(negative_balance AS DOUBLE) * CAST(0.6 AS DOUBLE)
        |         + CAST(is_weekend AS DOUBLE) * CAST(0.15 AS DOUBLE)
        |         + CAST(amount_log AS DOUBLE) * CAST(0.12 AS DOUBLE) AS FLOAT) AS z
        |  FROM fv
        |), fsc AS (
        |  SELECT o_orderkey, total_amount,
        |    CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) AS fraud_score FROM zed
        |), fsc2 AS (
        |  SELECT o_orderkey, total_amount, fraud_score,
        |    CASE WHEN fraud_score >= 0.50 THEN 'high'
        |         WHEN fraud_score >= 0.20 THEN 'medium'
        |         ELSE 'low' END AS risk_label,
        |    CAST(fraud_score >= 0.5 AS BIGINT) AS predicted_fraud
        |  FROM fsc
        |), checks AS (
        |  SELECT 'revenue_daily_date_not_null' AS check_name, 'revenue_daily' AS table_name,
        |    CAST(sum(CASE WHEN order_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violation_count FROM rev
        |  UNION ALL SELECT 'revenue_daily_orders_not_null', 'revenue_daily',
        |    CAST(sum(CASE WHEN total_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM rev
        |  UNION ALL SELECT 'revenue_daily_gmv_not_null', 'revenue_daily',
        |    CAST(sum(CASE WHEN gmv IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM rev
        |  UNION ALL SELECT 'revenue_daily_fraud_rate_range', 'revenue_daily',
        |    CAST(sum(CASE WHEN fraud_rate < 0 OR fraud_rate > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM rev
        |  UNION ALL SELECT 'fraud_summary_date_not_null', 'fraud_summary',
        |    CAST(sum(CASE WHEN event_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fsum
        |  UNION ALL SELECT 'fraud_summary_error_rate_range', 'fraud_summary',
        |    CAST(sum(CASE WHEN error_rate < 0 OR error_rate > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM fsum
        |  UNION ALL SELECT 'fraud_summary_error_value_rate_range', 'fraud_summary',
        |    CAST(sum(CASE WHEN error_value_rate < 0 OR error_value_rate > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM fsum
        |  UNION ALL SELECT 'fraud_summary_error_rate_suspicious', 'fraud_summary',
        |    CAST(sum(CASE WHEN error_rate > 0.5 THEN 1 ELSE 0 END) AS BIGINT) FROM fsum
        |  UNION ALL SELECT 'user_risk_user_not_null', 'user_risk_scores',
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM ur2
        |  UNION ALL SELECT 'user_risk_score_range', 'user_risk_scores',
        |    CAST(sum(CASE WHEN composite_risk_score < 0 OR composite_risk_score > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM ur2
        |  UNION ALL SELECT 'user_risk_label_domain', 'user_risk_scores',
        |    CAST(sum(CASE WHEN risk_label NOT IN ('low','medium','high') THEN 1 ELSE 0 END) AS BIGINT) FROM ur2
        |  UNION ALL SELECT 'fraud_scores_key_not_null', 'fraud_scores',
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM fsc2
        |  UNION ALL SELECT 'fraud_scores_score_range', 'fraud_scores',
        |    CAST(sum(CASE WHEN fraud_score < 0 OR fraud_score > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM fsc2
        |  UNION ALL SELECT 'fraud_scores_risk_label_domain', 'fraud_scores',
        |    CAST(sum(CASE WHEN risk_label NOT IN ('low','medium','high') THEN 1 ELSE 0 END) AS BIGINT) FROM fsc2
        |  UNION ALL SELECT 'fraud_scores_predicted_domain', 'fraud_scores',
        |    CAST(sum(CASE WHEN predicted_fraud NOT IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) FROM fsc2
        |  UNION ALL SELECT 'fraud_scores_amount_positive', 'fraud_scores',
        |    CAST(sum(CASE WHEN total_amount < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM fsc2
        |  UNION ALL SELECT 'user_risk_user_unique', 'user_risk_scores',
        |    count(user_id) - count(DISTINCT user_id) FROM ur2
        |  UNION ALL SELECT 'fraud_scores_key_unique', 'fraud_scores',
        |    count(o_orderkey) - count(DISTINCT o_orderkey) FROM fsc2
        |)
        |SELECT check_name, table_name, violation_count, violation_count = 0 AS passed
        |FROM checks ORDER BY check_name""".stripMargin)),

    QueryDef("q_feature_vector",
      (s, d) => FraudScore.featureVector(Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)))
        .orderBy("o_orderkey"),
      Some(EnrichedFeaturesCte +
        """
        |SELECT * FROM fv ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_feature_vector_full",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d)))
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte + ", " + CleanLineitemCte.stripPrefix("WITH ") +
        s"""
        |, enr2 AS (
        |  SELECT co.o_orderkey, co.o_custkey, co.o_totalprice, co.amount_tier, co.order_date,
        |    co.o_orderpriority, c.c_acctbal,
        |    CAST(${Enrichment.riskCaseSql("r.r_name")} AS DOUBLE) AS region_risk
        |  FROM clean_orders co
        |  JOIN customer c ON co.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), fx2 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, amount_tier, o_orderpriority, region_risk, c_acctbal,
        |    CAST(ln(1.0 + o_totalprice) AS FLOAT) AS amount_log,
        |    CAST(month(order_date) AS BIGINT) AS order_month,
        |    CAST(dayofweek(order_date) + 1 AS BIGINT) AS order_dow,
        |    CAST(dayofweek(order_date) IN (0, 6) AS BIGINT) AS is_weekend,
        |    count(*) OVER w AS user_order_count,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS user_avg_amount,
        |    max(o_totalprice) OVER w AS user_max_amount,
        |    min(o_totalprice) OVER w AS user_min_amount,
        |    quantile_cont(o_totalprice, 0.95) OVER w AS user_p95_amount,
        |    o_totalprice / (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w) AS amount_vs_user_avg,
        |    o_totalprice / (quantile_cont(o_totalprice, 0.95) OVER w + CAST(0.01 AS DOUBLE)) AS amount_vs_user_p95,
        |    CAST(order_date - min(order_date) OVER w AS BIGINT) AS account_age_days
        |  FROM enr2 WINDOW w AS (PARTITION BY o_custkey)
        |), tall AS (
        |  SELECT o_custkey AS uid, order_date - DATE '1970-01-01' AS day,
        |    CAST(1 AS BIGINT) AS w_order, CAST(0 AS BIGINT) AS w_refund, o_orderkey AS v_okey
        |  FROM clean_orders
        |  UNION ALL
        |  SELECT co.o_custkey, cl.ship_date - DATE '1970-01-01',
        |    CAST(0 AS BIGINT), CAST(1 AS BIGINT), NULL
        |  FROM clean_lineitem cl JOIN clean_orders co ON cl.l_orderkey = co.o_orderkey
        |  WHERE cl.is_refund
        |), vel AS (
        |  SELECT v_okey,
        |    CAST(COALESCE(sum(w_order) OVER (PARTITION BY uid ORDER BY day RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS velocity_7d,
        |    CAST(COALESCE(sum(w_order) OVER (PARTITION BY uid ORDER BY day RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS velocity_30d,
        |    CAST(COALESCE(sum(w_order) OVER (PARTITION BY uid ORDER BY day RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS velocity_90d,
        |    CAST(COALESCE(sum(w_refund) OVER (PARTITION BY uid ORDER BY day RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS refund_count_30d,
        |    CAST(sum(w_refund) OVER (PARTITION BY uid) AS BIGINT) AS user_refund_count
        |  FROM tall
        |)
        |SELECT fx2.o_orderkey, fx2.o_custkey,
        |  COALESCE(o_totalprice, CAST(0.0 AS DOUBLE)) AS total_amount,
        |  COALESCE(amount_log, CAST(0.0 AS FLOAT)) AS amount_log,
        |  order_month, order_dow, is_weekend, user_order_count,
        |  COALESCE(user_avg_amount, CAST(0.0 AS DOUBLE)) AS user_avg_amount,
        |  user_max_amount, user_min_amount,
        |  COALESCE(amount_vs_user_avg, CAST(1.0 AS DOUBLE)) AS amount_vs_user_avg,
        |  user_p95_amount,
        |  COALESCE(amount_vs_user_p95, CAST(1.0 AS DOUBLE)) AS amount_vs_user_p95,
        |  account_age_days,
        |  velocity_7d, velocity_30d, velocity_90d, refund_count_30d, user_refund_count,
        |  CAST(user_refund_count AS DOUBLE) / CAST(user_order_count + 1 AS DOUBLE) AS refund_rate,
        |  CAST(CASE amount_tier WHEN 'micro' THEN 0 WHEN 'low' THEN 1 WHEN 'medium' THEN 2
        |       WHEN 'high' THEN 3 ELSE 4 END AS BIGINT) AS tier_encoded,
        |  CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT) AS is_priority_order,
        |  COALESCE(region_risk, CAST(0.05 AS DOUBLE)) AS region_risk,
        |  CAST(region_risk > 0.05 AS BIGINT) AS is_high_risk_region,
        |  CAST(c_acctbal < 0 AS BIGINT) AS negative_balance,
        |  COALESCE(c_acctbal, CAST(0.0 AS DOUBLE)) AS account_balance,
        |  CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
        |       OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
        |FROM fx2 JOIN vel ON fx2.o_orderkey = vel.v_okey
        |ORDER BY fx2.o_orderkey""".stripMargin)),

    QueryDef("q_fraud_score",
      (s, d) => FraudScore.score(FraudScore.featureVector(Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))))
        .select("o_orderkey", "z", "fraud_score", "risk_label", "predicted_fraud", "label")
        .orderBy("o_orderkey"),
      Some(EnrichedFeaturesCte +
        """
        |, zed AS (
        |  SELECT o_orderkey, label,
        |    CAST(CAST(-4.0 AS DOUBLE) + amount_vs_user_avg * CAST(0.9 AS DOUBLE)
        |         + region_risk * CAST(11.0 AS DOUBLE)
        |         + CAST(is_high_risk_region AS DOUBLE) * CAST(0.8 AS DOUBLE)
        |         + CAST(negative_balance AS DOUBLE) * CAST(0.6 AS DOUBLE)
        |         + CAST(is_weekend AS DOUBLE) * CAST(0.15 AS DOUBLE)
        |         + CAST(amount_log AS DOUBLE) * CAST(0.12 AS DOUBLE) AS FLOAT) AS z
        |  FROM fv
        |), scored AS (
        |  SELECT o_orderkey, label, z, CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) AS fraud_score FROM zed
        |)
        |SELECT o_orderkey, z, fraud_score,
        |  CASE WHEN fraud_score >= 0.50 THEN 'high'
        |       WHEN fraud_score >= 0.20 THEN 'medium'
        |       ELSE 'low' END AS risk_label,
        |  CAST(fraud_score >= 0.5 AS BIGINT) AS predicted_fraud,
        |  label
        |FROM scored ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_model_eval",
      (s, d) => FraudScore.evaluate(FraudScore.score(FraudScore.featureVector(
          Enrichment.enrichOrders(
            Cleaning.cleanOrders(Tables.orders(s, d)),
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))))),
      Some(EnrichedFeaturesCte +
        """
        |, zed AS (
        |  SELECT o_orderkey, label,
        |    CAST(CAST(-4.0 AS DOUBLE) + amount_vs_user_avg * CAST(0.9 AS DOUBLE)
        |         + region_risk * CAST(11.0 AS DOUBLE)
        |         + CAST(is_high_risk_region AS DOUBLE) * CAST(0.8 AS DOUBLE)
        |         + CAST(negative_balance AS DOUBLE) * CAST(0.6 AS DOUBLE)
        |         + CAST(is_weekend AS DOUBLE) * CAST(0.15 AS DOUBLE)
        |         + CAST(amount_log AS DOUBLE) * CAST(0.12 AS DOUBLE) AS FLOAT) AS z
        |  FROM fv
        |), scored AS (
        |  SELECT o_orderkey, label,
        |    CAST(CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) >= 0.5 AS BIGINT) AS predicted_fraud
        |  FROM zed
        |), test AS (
        |  SELECT * FROM scored WHERE o_orderkey % 5 = 0
        |), cm AS (
        |  SELECT count(*) AS n_test,
        |    CAST(sum(CASE WHEN predicted_fraud = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN predicted_fraud = 1 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN predicted_fraud = 0 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN predicted_fraud = 0 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM test
        |)
        |SELECT n_test, tp, fp, fn, tn,
        |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
        |  CAST(tp AS DOUBLE) / (tp + fn) AS recall,
        |  CAST(tp + tn AS DOUBLE) / n_test AS accuracy
        |FROM cm""".stripMargin)),

    // Trained-model metrics: learned LR weights aren't cross-engine
    // reproducible → rows-only for the driver; MlSpec asserts the trained
    // metrics beat the literal-weight scorer on the same held-out split.
    QueryDef("q_model_trained_eval",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        TrainedModel.trainEval(FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d))))
      },
      None),

    // GBT fraud model: the XGBoost analog (tree ensemble on the same 25
    // features). Learned trees aren't cross-engine portable -> rows-only;
    // MlSpec asserts it beats the literal scorer on the same split.
    QueryDef("q_model_gbt_eval",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        // maxIter 10: boosting is sequential (each tree level is a full
        // distributed pass), so iteration count is the wall-clock axis; the
        // rule label saturates well inside 10 trees (MlSpec holds at 5)
        GbtModel.trainEval(FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d))), maxIter = 10)
      },
      None),

    // Seeded 3-fold CrossValidator grid over the GBT (the deterministic
    // Optuna mirror). Reports the winning grid point + its CV AUC alongside
    // the held-out confusion matrix -> rows-only.
    QueryDef("q_model_tuned_eval",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        // maxIter 5 per candidate: the search ranks grid points, it does
        // not need converged ensembles (reference Optuna trials are equally
        // truncated); 12 seeded CV fits run 8-way parallel
        GbtModel.tunedEval(FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d))), maxIter = 5)
      },
      None),

    // Train -> versioned registry save -> reload "latest" -> score with the
    // RELOADED model (the reference's decoupled train/serve loop). The
    // reload_mismatches column must be 0; learned trees are engine-local
    // -> rows-only. Registry root is a per-run temp dir (the query's write
    // side effect, like Medallion's warehouse).
    QueryDef("q_model_reload_eval",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        val root = java.nio.file.Files.createTempDirectory("graft-registry").toString
        val feats = FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d)))
        // shared seeded fit: q_model_importance reads the SAME trees, so
        // the two queries cost one training pass total per run. Bench
        // caveat: whichever of the two runs first absorbs the training
        // cost — only their SUM is comparable across rounds.
        GbtModel.reloadEval(feats, root, maxIter = 5,
          pretrained = Some(GbtModel.fittedShared(feats, d, maxIter = 5)))
      },
      None),

    // Per-feature importances of the trained GBT, ranked (serving API's
    // explainability surface). Learned split gains are engine-local ->
    // rows-only; MlSpec pins sum==1 and signal-over-noise ordering.
    QueryDef("q_model_importance",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
        val feats = FraudScore.fullFeatureVector(
          Enrichment.enrichOrders(clean,
            Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)),
          clean,
          Cleaning.cleanLineitem(Tables.lineitem(s, d)))
        // importances come off the shared fit (trained once per run,
        // reused by q_model_reload_eval) — zero extra training passes
        GbtModel.featureImportance(feats, maxIter = 5,
          pretrained = Some(GbtModel.fittedShared(feats, d, maxIter = 5)))
      },
      None),

    // Learned document-quality classifier (fastText/CCNet shape): hashed
    // n-gram features + LR against the Gopher weak label, scoring every
    // doc. Rows-only: learned weights are engine-local (SURVEY §4);
    // MlSpec binds held-out AUC, determinism, and structure.
    QueryDef("q_quality_classifier",
      (s, d) => ml.QualityClassifier.trainScore(Tables.documents(s, d))
        .orderBy("doc_id"),
      None),

    QueryDef("q_fraud_summary",
      (s, d) => FraudSummary.fraudSummaryDaily(Tables.events(s, d))
        .select("event_date", "total_events", "error_events", "purchase_events",
          "purchase_value", "error_value", "active_users", "error_rate", "error_value_rate")
        .orderBy("event_date"),
      Some("""SELECT CAST(ts AS DATE) AS event_date,
        |  count(*) AS total_events,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
        |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value,
        |  CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS error_value,
        |  count(DISTINCT user_id) AS active_users,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS error_rate,
        |  CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |    / (CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |       + CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)) AS error_value_rate
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q_user_risk_scores",
      (s, d) => FraudSummary.userRiskScores(Tables.events(s, d))
        .select("user_id", "events_total", "errors_total", "purchases_total",
          "purchase_value", "avg_event_value", "error_rate", "purchase_rate",
          "composite_risk_score", "risk_label")
        .orderBy("user_id"),
      Some("""SELECT user_id,
        |  count(*) AS events_total,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors_total,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases_total,
        |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_event_value,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS error_rate,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS purchase_rate,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 0.55
        |    + (1.0 - CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.25
        |    + (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 1000.0) * 0.20 AS composite_risk_score,
        |  CASE WHEN CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 0.55
        |    + (1.0 - CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.25
        |    + (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 1000.0) * 0.20 >= 0.50 THEN 'high'
        |       WHEN CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 0.55
        |    + (1.0 - CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.25
        |    + (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 1000.0) * 0.20 >= 0.30 THEN 'medium'
        |       ELSE 'low' END AS risk_label
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // The reference's Grafana KPI tiles (Today's GMV / Orders / Fraud
    // Rate / High-Risk Users) as one (kpi, value) frame; "today" = the
    // corpus' newest date, a deterministic CURRENT_DATE.
    QueryDef("q_dashboard_kpis",
      (s, d) => gold.Dashboard.kpis(Tables.events(s, d),
        Cleaning.cleanOrders(Tables.orders(s, d))).orderBy("kpi"),
      Some(CleanOrdersCte +
        """
        |, daily AS (
        |  SELECT order_date,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |    CAST(count(*) AS DOUBLE) AS orders
        |  FROM clean_orders GROUP BY 1),
        |latest AS (SELECT * FROM daily WHERE order_date = (SELECT max(order_date) FROM daily)),
        |fs AS (
        |  SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS error_rate
        |  FROM events GROUP BY 1),
        |fsl AS (SELECT * FROM fs WHERE event_date = (SELECT max(event_date) FROM fs)),
        |risk AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 0.55
        |    + (1.0 - CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 0.25
        |    + (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 1000.0) * 0.20 AS c
        |  FROM events GROUP BY user_id)
        |SELECT kpi, value FROM (
        |  SELECT 'todays_gmv' AS kpi, gmv AS value FROM latest
        |  UNION ALL SELECT 'todays_orders', orders FROM latest
        |  UNION ALL SELECT 'todays_error_rate', error_rate FROM fsl
        |  UNION ALL SELECT 'high_risk_users', CAST(count(*) AS DOUBLE) FROM risk WHERE c >= 0.50
        |) t ORDER BY kpi""".stripMargin)),

    // The two 7-day trend panels: per-day event-sourced GMV vs fraud
    // amount and the fraud-rate trend over the trailing week.
    QueryDef("q_dashboard_trend",
      (s, d) => gold.Dashboard.trend(Tables.events(s, d)).orderBy("event_date"),
      Some("""WITH fs AS (
        |  SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS gmv,
        |    CAST(sum(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS fraud_amount,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS error_rate
        |  FROM events GROUP BY 1)
        |SELECT event_date, gmv, fraud_amount, error_rate FROM fs
        |WHERE event_date >= (SELECT max(event_date) FROM fs) - 6
        |ORDER BY event_date""".stripMargin))
  )

  // ---- DuckDB helpers for similarity oracles (sequential double fold —
  //      mirrors Similarity.dot exactly) ----

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Shared by q_decontaminate and q_decontaminate_sketch: the sketch
    * path's CMS gate is pruning-only (no false negatives, survivors
    * exact-confirmed), so both queries answer the same oracle. */
  private lazy val decontaminateOracle = """WITH g AS (
    |  SELECT doc_id, source,
    |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 3, 1) + 1),
    |      j -> array_to_string(string_split(text, ' ')[j:j+3], ' '))) AS grams
    |  FROM documents
    |), ev AS (
    |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = 'src0'
    |), tr AS (
    |  SELECT doc_id, source, grams FROM g WHERE source <> 'src0'
    |), tg AS (
    |  SELECT doc_id, unnest(grams) AS gram FROM tr
    |), hits AS (
    |  SELECT doc_id, count(*) AS n_hit_grams FROM tg JOIN ev USING (gram) GROUP BY 1
    |)
    |SELECT tr.doc_id, tr.source, CAST(len(tr.grams) AS BIGINT) AS n_grams,
    |  CAST(COALESCE(hits.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
    |  CAST(COALESCE(hits.n_hit_grams, 0) AS DOUBLE) / len(tr.grams) AS hit_ratio,
    |  COALESCE(hits.n_hit_grams, 0) > 0 AS is_contaminated,
    |  CASE WHEN CAST(COALESCE(hits.n_hit_grams, 0) AS DOUBLE) / len(tr.grams) >= CAST(0.2 AS DOUBLE) THEN 'high'
    |       WHEN COALESCE(hits.n_hit_grams, 0) > 0 THEN 'low'
    |       ELSE 'clean' END AS severity
    |FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
    |ORDER BY tr.doc_id""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  private def bucketSql(v: String): String =
    "CAST(" + (0 until 8).map(i => s"(CASE WHEN $v[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ") + " AS BIGINT)"

  private lazy val batch3: Seq[QueryDef] = Seq(

    QueryDef("q_ship_priority",
      (s, d) => Pipelines.shipPriority(Tables.customer(s, d), Tables.orders(s, d),
          Tables.lineitem(s, d)).orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY l_orderkey""".stripMargin)),

    QueryDef("q_local_volume",
      (s, d) => Pipelines.localVolume(Tables.region(s, d), Tables.nation(s, d),
          Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d),
          Tables.lineitem(s, d)).orderBy("n_name"),
      Some("""SELECT n_name, r_name AS region_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name
        |ORDER BY n_name""".stripMargin)),

    QueryDef("q_order_denorm",
      (s, d) => Pipelines.orderDenorm(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Cleaning.cleanLineitem(Tables.lineitem(s, d)))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(CleanOrdersCte + ", " + CleanLineitemCte.stripPrefix("WITH ") +
        """
        |SELECT l_orderkey, l_linenumber, o_custkey, status_normalized, amount_tier, order_date,
        |  l_quantity, net_price, charge, is_refund
        |FROM clean_lineitem JOIN clean_orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef("q_merge_upsert",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
          .select("o_orderkey", "o_custkey", "o_totalprice", "status_normalized")
        val target = clean.filter(col("o_orderkey") % 2 === 0)
        val source = clean.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
          .withColumn("status_normalized", lit("P"))
        MergeUpsert.merge(target, source, Seq("o_orderkey")).orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |, tgt AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, status_normalized
        |  FROM clean_orders WHERE o_orderkey % 2 = 0
        |), src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |    'P' AS status_normalized
        |  FROM clean_orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT t.*, 'kept' AS _merge_action FROM tgt t
        |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
        |UNION ALL
        |SELECT s.*, 'updated' FROM src s
        |  WHERE EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
        |UNION ALL
        |SELECT s.*, 'inserted' FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_dedup_exact",
      (s, d) => Dedup.exactDups(Tables.documents(s, d)).orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
        |  count(*) AS doc_count, count(*) - 1 AS dup_count
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    QueryDef("q_dedup_norm",
      (s, d) => Dedup.normalizedDups(Tables.documents(s, d)).orderBy("norm_hash"),
      Some("""SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_hash,
        |  min(doc_id) AS canonical_doc_id,
        |  count(*) AS doc_count, count(*) - 1 AS dup_count
        |FROM documents GROUP BY 1 ORDER BY norm_hash""".stripMargin)),

    QueryDef("q_multimodal_frames",
      (s, d) => Multimodal.frameSamplePlan(Tables.documents(s, d))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH m AS (
        |  SELECT doc_id,
        |    64 + CAST(octet_length(encode(text)) AS BIGINT) % 1024 AS w,
        |    64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 1024 AS h,
        |    1 + CAST(octet_length(encode(text)) AS BIGINT) % 16 AS frame_count
        |  FROM documents
        |), x AS (
        |  SELECT doc_id, w, h, frame_count,
        |    unnest(range(0, frame_count, 4)) AS frame_idx
        |  FROM m
        |)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_count AS BIGINT) AS frame_count,
        |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        |  CAST(w * 224 // greatest(w, h) AS BIGINT) AS out_w,
        |  CAST(h * 224 // greatest(w, h) AS BIGINT) AS out_h
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin)),

    // Audio windowing (whisper-style fixed windows + hop overlap): the
    // 1-D analog of frame sampling; typed stub-decoder twin parity-tested
    // in OperatorsSpec.
    QueryDef("q_multimodal_audio",
      (s, d) => Multimodal.audioSegmentPlan(Tables.documents(s, d))
        .orderBy("doc_id", "seg_idx"),
      Some("""WITH m AS (
        |  SELECT doc_id,
        |    1000 + CAST(octet_length(encode(text)) AS BIGINT) % 60000 AS dur_ms
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, dur_ms,
        |    CASE WHEN dur_ms <= 5000 THEN 1
        |         ELSE (dur_ms - 5000) // 2500 + 1 END AS n_seg
        |  FROM m
        |), x AS (
        |  SELECT doc_id, dur_ms, unnest(range(0, n_seg)) AS seg_idx FROM n
        |)
        |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
        |  CAST(seg_idx * 2500 AS BIGINT) AS start_ms,
        |  CAST(least(seg_idx * 2500 + 5000, dur_ms) AS BIGINT) AS end_ms,
        |  dur_ms
        |FROM x ORDER BY doc_id, seg_idx""".stripMargin)),

    QueryDef("q_chunk_documents",
      (s, d) => graft.text.Chunking.chunkDocuments(Tables.documents(s, d))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, toks, n_tokens,
        |    greatest(1, (n_tokens - 16 + 47) // 48) AS n_chunks
        |  FROM t
        |), x AS (
        |  SELECT doc_id, lang, toks, n_tokens,
        |    unnest(range(0, n_chunks)) AS chunk_idx
        |  FROM c
        |)
        |SELECT doc_id, lang, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ') AS chunk_text,
        |  CAST(len(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS BIGINT) AS chunk_tokens,
        |  n_tokens
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Sequence-grain rollup of the packed stream (q_pack_sequences is the
    // slice grain): docs per training sequence, docs starting in it, token
    // fill, and carryover (cross-contaminated) tokens — the contamination
    // metric whole-doc bin packing (q_pack_bins) drives to zero.
    QueryDef("q_pack_seq_stats",
      (s, d) => text.Packing.packSequences(Tables.documents(s, d), 128,
          docsPerBucket = 100L)
        .groupBy(col("lang"), col("seq_idx"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("doc_offset") === 0L, 1L).otherwise(0L)).as("n_starts"),
          sum(col("tokens_in_seq")).as("fill_tokens"),
          sum(when(col("doc_offset") > 0L, col("tokens_in_seq")).otherwise(0L))
            .as("carryover_tokens"))
        .orderBy("lang", "seq_idx"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end
        |  FROM t
        |), s AS (
        |  SELECT *, tok_end - n_tokens AS tok_start,
        |    (tok_end - n_tokens) // 128 AS first_seq, (tok_end - 1) // 128 AS last_seq
        |  FROM c
        |), e AS (
        |  SELECT lang, tok_start, tok_end,
        |    unnest(range(first_seq, last_seq + 1)) AS seq_idx
        |  FROM s
        |)
        |SELECT lang, CAST(seq_idx AS BIGINT) AS seq_idx,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN tok_start >= seq_idx * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |  CAST(sum(least(tok_end, seq_idx * 128 + 128)
        |    - greatest(tok_start, seq_idx * 128)) AS BIGINT) AS fill_tokens,
        |  CAST(sum(CASE WHEN tok_start < seq_idx * 128
        |    THEN least(tok_end, seq_idx * 128 + 128) - seq_idx * 128
        |    ELSE 0 END) AS BIGINT) AS carryover_tokens
        |FROM e GROUP BY 1, 2 ORDER BY lang, seq_idx""".stripMargin)),

    // Whole-document bin packing (SFT packing without cross-contamination):
    // bounded length histogram → driver-side greedy templates → distributed
    // rank-to-slot assignment. Rows-only: the packer is a custom algorithm
    // with no SQL counterpart; CurationSpec binds capacity, bijectivity,
    // determinism and a bin-count optimality bound (SURVEY §4).
    QueryDef("q_pack_bins",
      (s, d) => text.BinPacking.packBins(Tables.documents(s, d))
        .orderBy("doc_id"),
      None),

    QueryDef("q_pack_bin_stats",
      (s, d) => text.BinPacking.packBinStats(Tables.documents(s, d))
        .orderBy("bin_id"),
      None),

    // Deterministic 80/10/10 train/val/test assignment: pure function of
    // doc_id (append-stable — growing the corpus never reassigns a row).
    QueryDef("q_data_split",
      (s, d) => operators.Sampling.hashSplit(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("doc_id"), trainBp = 8000, valBp = 1000)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS split_bp,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q_sample_stratified",
      (s, d) => operators.Sampling.sampleStratified(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"),
          Map("en" -> 3000, "zh" -> 5000), defaultBp = 1000)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        |  < (CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 5000 ELSE 1000 END)
        |ORDER BY doc_id""".stripMargin)),

    QueryDef("q_sample_fixed",
      (s, d) => operators.Sampling.sampleFixedPerStratum(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), 20)
        .orderBy("lang", "sample_rank"),
      Some("""SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY
        |      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 ASC,
        |      doc_id ASC) AS BIGINT) AS sample_rank
        |  FROM documents
        |) t WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin)),

    // Same per-stratum uniform sample computed in ONE aggregation pass by
    // the bottomk_sample TypedImperativeAggregate (size-k mergeable
    // max-heap per group): the window path shuffles every row; this path's
    // exchange carries <= k pairs per group per task. md5 priorities are
    // engine-portable, so the custom aggregate is DuckDB-hash-gated —
    // FunctionsSpec additionally proves bit-equality with the
    // ScalableRank window path on the same quota.
    QueryDef("q_sample_group_agg",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(expr("bottomk_sample(md5(cast(doc_id AS string)), doc_id, 20)")
            .as("sample"))
          .select(col("lang"), posexplode(col("sample")))
          .select(col("lang"), (col("pos") + 1).cast("long").as("sample_rank"),
            col("col.payload").as("doc_id"))
          .orderBy("lang", "sample_rank")
      },
      Some("""SELECT lang, CAST(rn AS BIGINT) AS sample_rank, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |  FROM documents
        |) t WHERE rn <= 20 ORDER BY lang, sample_rank""".stripMargin)),

    QueryDef("q_dedup_clusters",
      (s, d) => Components.dedupClusters(Tables.documents(s, d)).orderBy("doc_id"),
      Some(DedupClustersOracle)),

    // Same clustering contract computed by O(log n)-round star contraction
    // instead of diameter-bound label propagation — identical output, so it
    // shares the recursive-CTE oracle verbatim (hash-exact on both paths).
    QueryDef("q_dedup_clusters_star",
      (s, d) => Components.dedupClustersStar(Tables.documents(s, d)).orderBy("doc_id"),
      Some(DedupClustersOracle)),

    QueryDef("q_dedup_keep_best",
      (s, d) => Components.dedupKeepBest(Tables.documents(s, d)).orderBy("doc_id"),
      Some {
        val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
        "WITH RECURSIVE " + MinHash.candidatePairsSqlCtes.stripPrefix("WITH ") +
          s"""
          |, edges AS (
          |  SELECT doc_a AS a, doc_b AS b FROM pairs
          |  UNION ALL SELECT doc_b, doc_a FROM pairs
          |), walk(node, reach) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
          |), lab AS (
          |  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
          |), sz AS (
          |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
          |), t AS (
          |  SELECT doc_id, lang,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
          |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stopword_hits
          |  FROM documents
          |), t3 AS (
          |  SELECT doc_id, lang,
          |    (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN CAST(1.0 AS DOUBLE)
          |          WHEN n_tokens < 20 THEN CAST(n_tokens AS DOUBLE) / CAST(20.0 AS DOUBLE)
          |          ELSE CAST(200.0 AS DOUBLE) / n_tokens END) * CAST(0.4 AS DOUBLE)
          |    + (CAST(1.0 AS DOUBLE) - (CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens)) * CAST(0.4 AS DOUBLE)
          |    + (CAST(stopword_hits AS DOUBLE) / n_tokens) * CAST(0.2 AS DOUBLE) AS quality_score
          |  FROM t
          |)
          |SELECT doc_id, lang, cluster_id, cluster_size, quality_score FROM (
          |  SELECT t3.doc_id, t3.lang, lab.cluster_id, sz.cluster_size, t3.quality_score,
          |    row_number() OVER (PARTITION BY lab.cluster_id
          |      ORDER BY t3.quality_score DESC, t3.doc_id ASC) AS rn
          |  FROM t3
          |  JOIN lab ON t3.doc_id = lab.doc_id
          |  JOIN sz USING (cluster_id)
          |) x WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }),

    QueryDef("q_fingerprint",
      (s, d) => Dedup.fingerprint(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS vocab_fingerprint,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS total_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Domain-level curation: per-source reputation (corpus-wide exact-dup
    // share, mean length, stub share) with the wholesale keep/drop verdict.
    QueryDef("q_source_reputation",
      (s, d) => text.SourceReputation.sourceReputation(Tables.documents(s, d))
        .select("source", "n_docs", "dup_docs", "total_chars", "short_docs",
          "dup_share", "avg_chars", "short_share", "keep")
        .orderBy("source"),
      Some(text.SourceReputation.oracleSql(
        dupShareMax = 0.5, minAvgChars = 150.0, minChars = 100))),

    // Subword token accounting under a corpus-trained BPE merge table.
    // Rows-only: the merge table is a learned artifact (deterministic
    // in-engine via exact counts + lexicographic tie-break, but the
    // iterative training loop is not expressible as reasonable DuckDB SQL);
    // CurationSpec binds instead — known-corpus merge sequence, exact
    // round-trip, determinism (SURVEY §4 rows-only class 1).
    QueryDef("q_bpe_tokens",
      (s, d) => text.Bpe.tokenStats(Tables.documents(s, d), numMerges = 64)
        .orderBy("doc_id"),
      None),

    // Heaps'-law vocabulary growth: cumulative tokens vs cumulative NOVEL
    // token types in doc_id order — sizes a tokenizer vocabulary and
    // flags template-heavy corpora (curve flattens). Novelty = min
    // first-occurrence doc per token (one token-grain groupBy, never a
    // running distinct); cumsums ride the grouped prefix-sum primitive.
    QueryDef("q_vocab_growth",
      (s, d) => TextAnalysis.vocabGrowth(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(TextAnalysis.vocabGrowthOracleSql)),

    QueryDef("q_token_count",
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS regex_tokens,
        |  CAST(length(text) AS BIGINT) AS char_count,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS non_space_chars,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact corpus-wide token top-k: the aggregate reduces at token grain
    // (vocab-bounded, far below corpus size) before the top-k cut, so the
    // shuffle carries (token, partial count) pairs only.
    QueryDef("q_token_topk",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(25),
      Some("""SELECT token, cnt FROM (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> '' GROUP BY token
        |) t ORDER BY cnt DESC, token LIMIT 25""".stripMargin)),

    // Sketch variant: Misra–Gries mergeable heavy hitters (native
    // TypedImperativeAggregate, functions/TopKFreq.scala) — O(capacity)
    // state per task instead of a vocab-sized shuffle; engine-specific
    // output → rows-only gate, SketchesSpec proves the error bound and
    // exactness-below-capacity against the exact aggregate.
    QueryDef("q_heavy_hitters",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .agg(expr("topk_freq(token, 4096, 25)").as("topk"))
          .select(explode(col("topk")).as("hh"))
          .select(col("hh.item").as("token"), col("hh.count_est").as("count_est"),
            col("hh.err_bound").as("err_bound"))
      },
      None),

    QueryDef("q_top_docs_per_lang",
      (s, d) => TextAnalysis.topDocsPerLang(Tables.documents(s, d))
        .orderBy("lang", "rank_in_lang"),
      Some {
        val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, lang,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stopword_hits
           |  FROM documents
           |), t2 AS (
           |  SELECT *,
           |    CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_ratio,
           |    CAST(stopword_hits AS DOUBLE) / n_tokens AS stopword_ratio,
           |    CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN CAST(1.0 AS DOUBLE)
           |         WHEN n_tokens < 20 THEN CAST(n_tokens AS DOUBLE) / CAST(20.0 AS DOUBLE)
           |         ELSE CAST(200.0 AS DOUBLE) / n_tokens END AS len_score
           |  FROM t
           |), t3 AS (
           |  SELECT *,
           |    len_score * CAST(0.4 AS DOUBLE) + (CAST(1.0 AS DOUBLE) - dup_ratio) * CAST(0.4 AS DOUBLE)
           |      + stopword_ratio * CAST(0.2 AS DOUBLE) AS quality_score
           |  FROM t2
           |), ranked AS (
           |  SELECT lang,
           |    CAST(row_number() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rank_in_lang,
           |    doc_id, quality_score,
           |    CASE WHEN quality_score >= 0.7 THEN 'high'
           |         WHEN quality_score >= 0.4 THEN 'medium' ELSE 'low' END AS quality_bucket
           |  FROM t3
           |)
           |SELECT lang, rank_in_lang, doc_id, quality_score, quality_bucket
           |FROM ranked WHERE rank_in_lang <= 5 ORDER BY lang, rank_in_lang""".stripMargin
      }),

    // Gopher hard quality rules (Rae et al. 2021 App. A1.1): per-rule
    // pass/fail with exact integer evidence counts — hash-exact (counts
    // are codegen'd HOFs over the row's own tokens/lines; ratios are
    // single IEEE divisions). Symbol/bullet/ellipsis paths are degenerate
    // on this punctuation-free corpus (like q_pii_scrub's no-match path);
    // QualityRulesSpec proves them on synthetic docs.
    QueryDef("q_gopher_quality",
      (s, d) => graft.text.QualityRules.gopherQuality(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(graft.text.QualityRules.gopherOracleSql())),

    QueryDef("q_text_quality",
      (s, d) => TextAnalysis.qualityScore(Tables.documents(s, d)).orderBy("doc_id"),
      Some(QualityCtes +
        """
        |SELECT doc_id, lang, n_tokens, n_distinct, dup_ratio, stopword_hits, stopword_ratio,
        |  len_score, quality_score,
        |  CASE WHEN quality_score >= 0.7 THEN 'high'
        |       WHEN quality_score >= 0.4 THEN 'medium' ELSE 'low' END AS quality_bucket
        |FROM t3 ORDER BY doc_id""".stripMargin)),

    QueryDef("q_lang_id",
      (s, d) => TextAnalysis.languageId(Tables.documents(s, d)).orderBy("doc_id"),
      Some {
        def mk(lang: String): String = {
          val list = TextAnalysis.LangMarkers(lang).map(w => s"'$w'").mkString(", ")
          s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($list))) AS BIGINT) AS s_$lang"
        }
        s"""WITH t AS (
           |  SELECT doc_id, lang AS actual_lang,
           |    ${Seq("de", "en", "es", "fr", "zh").map(mk).mkString(",\n    ")}
           |  FROM documents
           |), t2 AS (
           |  SELECT *,
           |    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
           |         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           |         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
           |         WHEN s_fr >= s_zh THEN 'fr'
           |         ELSE 'zh' END AS predicted_lang
           |  FROM t
           |)
           |SELECT doc_id, actual_lang, s_de, s_en, s_es, s_fr, s_zh, predicted_lang,
           |  (predicted_lang = actual_lang) AS correct
           |FROM t2 ORDER BY doc_id""".stripMargin
      }),

    QueryDef("q_simhash",
      (s, d) => SimHash.simhash(Tables.documents(s, d)).orderBy("doc_id"),
      Some(SimHash.oracleSql)),

    QueryDef("q_minhash_sig",
      (s, d) => MinHash.signatures(Tables.documents(s, d)).orderBy("doc_id"),
      Some(MinHash.signaturesOracleSql)),

    QueryDef("q_neardup_pairs",
      (s, d) => MinHash.nearDupPairs(Tables.documents(s, d)).orderBy("doc_a", "doc_b"),
      Some(MinHash.nearDupOracleSql)),

    // Asymmetric containment classification on the same candidate set:
    // Jaccard misses subset relations (a wholesale quote has low Jaccard
    // when sizes differ), so each pair carries per-side containment and a
    // relation class (duplicate / a_in_b / b_in_a / overlap). IEEE
    // divisions of exact set sizes -> hash-exact.
    QueryDef("q_containment_pairs",
      (s, d) => MinHash.containmentPairs(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(MinHash.containmentOracleSql())),

    // Incremental LSH maintenance: band store built from the old corpus
    // (doc_id % 10 != 7), the delta appended, pairs touching the delta
    // probed from the store alone. Band rows are a pure per-doc function,
    // so the store ≡ a from-scratch build and the result ≡ the full-run
    // capped pair set filtered to delta-touching pairs — which is exactly
    // what the oracle computes.
    QueryDef("q_neardup_incremental",
      (s, d) => {
        val store = java.nio.file.Files
          .createTempDirectory("graft-band-store").toString + "/bands"
        val docs = Tables.documents(s, d)
        MinHash.buildBandStore(docs.filter(col("doc_id") % 10 =!= 7), store)
        MinHash.appendBandStore(docs.filter(col("doc_id") % 10 === 7), store)
        MinHash.incrementalNearDups(s, store, col("doc_id") % 10 === 7)
          .orderBy("doc_a", "doc_b")
      },
      Some(MinHash.candidatePairsSqlCtes +
        """
        |SELECT doc_a, doc_b FROM pairs
        |WHERE doc_a % 10 = 7 OR doc_b % 10 = 7
        |ORDER BY doc_a, doc_b""".stripMargin)),

    QueryDef("q_ngram_jaccard",
      (s, d) => MinHash.exactJaccardPairs(Tables.documents(s, d)).orderBy("doc_a", "doc_b"),
      Some(MinHash.exactJaccardOracleSql())),

    QueryDef("q_knn_brute",
      (s, d) => Similarity.knnBrute(Tables.embeddings(s, d))
        .orderBy("query_id", "rank"),
      Some(graft.ml.RetrievalEval.knnRankedSqlCtes(cosSql, numQueries = 5) +
        """
        |SELECT query_id, rank, vec_id, label, cos_sim FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // Retrieval-quality eval of the exact-cosine ranking: per-query
    // hits/P@k/R@k/MRR/nDCG with binary same-label relevance. DCG rides
    // the micro-unit quantization contract (each 1/ln(rank+1) discount
    // rounded once to BIGINT micro-units, exact integer sums, ONE final
    // IEEE division) so the whole eval is hash-exact vs DuckDB.
    QueryDef("q_retrieval_eval",
      (s, d) => graft.ml.RetrievalEval.evalBruteKnn(Tables.embeddings(s, d))
        .orderBy("query_id"),
      Some(graft.ml.RetrievalEval.oracleSql(cosSql))),

    // kNN label-noise screen (confident-learning triage): an example
    // whose nearest neighbors overwhelmingly carry a different label is
    // a suspected mislabel. Exact counts over the gated brute ranking;
    // one IEEE division + literal-threshold compare.
    QueryDef("q_label_noise",
      (s, d) => graft.ml.LabelNoise.screen(Tables.embeddings(s, d))
        .orderBy("vec_id"),
      Some(graft.ml.LabelNoise.oracleSql(cosSql))),

    // The full-sweep scale path of the screen: same rollup over the IVF
    // ANN ranking (nprobe/nlist of the corpus per query). Rows-only
    // (learned cells, ANN class); EvalDriftSpec recovers planted
    // mislabels on a known geometry through this exact path.
    QueryDef("q_label_noise_ann",
      (s, d) => graft.ml.LabelNoise.screenAnn(
          Tables.embeddings(s, d), cacheKey = Some(d))
        .orderBy("vec_id"),
      None),

    QueryDef("q_knn_bucketed",
      (s, d) => Similarity.knnBucketed(Tables.embeddings(s, d))
        .orderBy("query_id", "rank"),
      Some(s"""WITH c AS (
        |  SELECT vec_id, label, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qv, bucket AS q_bucket FROM c WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, c.vec_id, c.label, c.bucket,
        |    ${cosSql("q.qv", "c.embedding")} AS cos_sim
        |  FROM c JOIN q ON c.bucket = q.q_bucket AND c.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, label, cos_sim, bucket,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, vec_id, label, cos_sim, bucket FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    QueryDef("q_knn_multiprobe",
      (s, d) => Similarity.knnMultiProbe(Tables.embeddings(s, d))
        .orderBy("query_id", "rank"),
      Some(s"""WITH c AS (
        |  SELECT vec_id, label, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qv, bucket AS q_bucket FROM c WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, c.vec_id, c.label, c.bucket,
        |    ${cosSql("q.qv", "c.embedding")} AS cos_sim
        |  FROM c JOIN q ON bit_count(xor(c.bucket, q.q_bucket)) <= 1 AND c.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, label, cos_sim, bucket,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, vec_id, label, cos_sim, bucket FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // IVF ANN with a trained KMeans coarse quantizer: learned centroids
    // aren't cross-engine reproducible → rows-only; FunctionsSpec asserts
    // recall@k dominates the data-oblivious sign-LSH bucket path.
    QueryDef("q_knn_ivf",
      (s, d) => Similarity.knnIvf(Tables.embeddings(s, d), cacheKey = Some(d))
        .orderBy("query_id", "rank"),
      None),

    // Product-quantized ADC scan + exact re-rank (rows-only: seeded
    // KMeans codebooks are engine-local; FunctionsSpec bounds recall).
    QueryDef("q_knn_pq",
      (s, d) => Similarity.knnPq(Tables.embeddings(s, d), cacheKey = Some(d))
        .orderBy("query_id", "rank"),
      None),

    // IVF-PQ composition (coarse cells gate candidates, PQ codes rank
    // them, floats only for the re-rank shortlist) — rows-only.
    QueryDef("q_knn_ivfpq",
      (s, d) => Similarity.knnIvfPq(Tables.embeddings(s, d), cacheKey = Some(d))
        .orderBy("query_id", "rank"),
      None),

    // Multi-table random-hyperplane LSH (OR-amplification): the untrained
    // recall dial — collides-in-ANY-of-L-tables candidates. Seeded
    // Gaussian planes are engine-local → rows-only; FunctionsSpec floors
    // recall above the single-table path.
    QueryDef("q_knn_lsh",
      (s, d) => Similarity.knnLshTables(Tables.embeddings(s, d))
        .orderBy("query_id", "rank"),
      None),

    // PCA preprocessing (FAISS PCAR): per-vector reduced representation
    // with captured-energy audit columns. Rows-only: the principal
    // subspace is a learned artifact (sample covariance eigenvectors);
    // FunctionsSpec binds orthonormality, explained-variance ordering,
    // energy-capture floor, and refit determinism.
    QueryDef("q_embed_pca",
      (s, d) => sim.Pca.embedPca(Tables.embeddings(s, d), k = 8,
          cacheKey = Some(s"$d#pca"))
        // Harness surface: the raw array<float> projection crashes the
        // driver's pandas sort (unhashable ndarray) — emit a deterministic
        // string digest of pv instead; FunctionsSpec binds the raw arrays.
        .withColumn("pv_sig",
          md5(concat_ws(",",
            transform(col("pv"), x => round(x.cast("double"), 5).cast("string")))))
        .drop("pv")
        .orderBy("vec_id"),
      None),

    // ANN via PCA-space prefilter + exact full-dim re-rank ("PCAR,Flat").
    // Rows-only: learned subspace; FunctionsSpec binds recall vs brute.
    QueryDef("q_knn_pca",
      (s, d) => sim.Pca.knnPca(Tables.embeddings(s, d),
          cacheKey = Some(s"$d#pca"))
        .orderBy("query_id", "rank"),
      None),

    // IVF-PQ index persistence: train -> versioned registry save -> reload
    // "latest" -> search with the RELOADED codebooks (the ANN analog of
    // q_model_reload_eval's train/serve decoupling). reload_mismatches
    // must be 0 — float32 round-trips parquet bit-exactly and assignment
    // is SQL argmin over literal centroids, so parity is structural.
    // Rows-only: seeded KMeans quantizers are engine-local.
    QueryDef("q_knn_reload",
      (s, d) => {
        val root = java.nio.file.Files.createTempDirectory("graft-ann-registry").toString
        graft.sim.AnnIndex.reloadParity(Tables.embeddings(s, d), root,
            cacheKey = Some(d))
          .orderBy("query_id", "rank")
      },
      None),

    // Incremental index maintenance: quantizers train once on the BASE
    // corpus, the base encodes into a cell-partitioned store (posting
    // lists), and the delta (25% of vectors) is encoded with the FROZEN
    // codebooks and appended at cell grain — zero retraining, zero base
    // re-encode (the ANN analog of the CDC->gold incremental loop).
    // Search runs over the combined store; from_delta marks neighbors
    // served from the appended half. AnnIndexSpec proves bit-parity with
    // a from-scratch encode of the union. Rows-only: seeded KMeans is
    // engine-local.
    QueryDef("q_knn_incremental",
      (s, d) => {
        val store = java.nio.file.Files.createTempDirectory("graft-ann-store").toString
        val emb = Tables.embeddings(s, d)
        val base = emb.filter(col("vec_id") % 4 =!= 3)
        val delta = emb.filter(col("vec_id") % 4 === 3)
        val idx = graft.sim.AnnIndex.train(base, cacheKey = Some(s"$d#incr-base"))
        graft.sim.AnnIndex.buildEncoded(base, idx, s"$store/corpus")
        graft.sim.AnnIndex.appendEncoded(delta, idx, s"$store/corpus")
        graft.sim.AnnIndex.searchEncoded(s, s"$store/corpus", idx)
          .withColumn("from_delta", col("vec_id") % 4 === 3)
          .orderBy("query_id", "rank")
      },
      None),

    // Mean recall of EVERY ANN method incl. the learned ones (rows-only:
    // contains IVF/PQ; the brute row is the 1.0 sanity anchor).
    QueryDef("q_knn_recall_all",
      (s, d) => Similarity.knnRecallSummary(Tables.embeddings(s, d),
          cacheKey = Some(d))
        .orderBy("method"),
      None),

    // Free-text PII scrubbing (emails/phones/IPv4 → typed placeholders +
    // audit counts). The corpus is PII-free, so the oracle pins the
    // no-match path (text unchanged, zero counts) and regex-dialect
    // parity; CurationSpec proves the scrubbing on synthetic PII.
    QueryDef("q_pii_scrub",
      (s, d) => graft.text.PiiScrub.scrub(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS emails_found,
        |  CAST(len(regexp_extract_all(text, '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}')) AS INT) AS phones_found,
        |  CAST(len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS INT) AS ips_found
        |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q_knn_recall",
      (s, d) => Similarity.knnRecall(Tables.embeddings(s, d))
        .orderBy("method", "query_id"),
      Some(s"""WITH c AS (
        |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS qv, bucket AS q_bucket FROM c WHERE vec_id < 5
        |), brute AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.query_id, c.vec_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY ${cosSql("q.qv", "c.embedding")} DESC, c.vec_id ASC) AS rank
        |    FROM c JOIN q ON c.vec_id != q.query_id
        |  ) t WHERE rank <= 10
        |), m_bucketed AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.query_id, c.vec_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY ${cosSql("q.qv", "c.embedding")} DESC, c.vec_id ASC) AS rank
        |    FROM c JOIN q ON c.bucket = q.q_bucket AND c.vec_id != q.query_id
        |  ) t WHERE rank <= 10
        |), m_multi AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.query_id, c.vec_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY ${cosSql("q.qv", "c.embedding")} DESC, c.vec_id ASC) AS rank
        |    FROM c JOIN q ON bit_count(xor(c.bucket, q.q_bucket)) <= 1 AND c.vec_id != q.query_id
        |  ) t WHERE rank <= 10
        |)
        |SELECT method, query_id, golden_k, hits,
        |  CAST(hits AS DOUBLE) / golden_k AS recall_at_k
        |FROM (
        |  SELECT 'bucketed' AS method, g.query_id, count(*) AS golden_k,
        |    CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM brute g LEFT JOIN m_bucketed r
        |    ON g.query_id = r.query_id AND g.vec_id = r.vec_id
        |  GROUP BY g.query_id
        |  UNION ALL
        |  SELECT 'multiprobe', g.query_id, count(*),
        |    CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM brute g LEFT JOIN m_multi r
        |    ON g.query_id = r.query_id AND g.vec_id = r.vec_id
        |  GROUP BY g.query_id
        |) t ORDER BY method, query_id""".stripMargin)),

    QueryDef("q_embed_neardup",
      (s, d) => Similarity.embeddingNearDups(Tables.embeddings(s, d), 0.35)
        .orderBy("vec_a", "vec_b"),
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
        |    ${cosSql("a.embedding", "b.embedding")} AS cos_sim
        |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |)
        |SELECT vec_a, vec_b, bucket, cos_sim FROM p
        |WHERE cos_sim > 0.35 ORDER BY vec_a, vec_b""".stripMargin)),

    // SemDeDup-style semantic dedup: learned KMeans cells (bounded-sample
    // fit) gate the candidate pairs, min-id representative wins — catches
    // paraphrase-grade duplicates sign-LSH blocking misses (rows-only:
    // learned cells are engine-local; FunctionsSpec proves precision exact
    // and floors recall against the all-pairs rule)
    QueryDef("q_semantic_dedup",
      (s, d) => Similarity.semanticDedup(Tables.embeddings(s, d), 16, 0.35,
          cacheKey = Some(d))
        .orderBy("vec_id"),
      None),

    QueryDef("q_stream_tumbling",
      (s, d) => graft.streaming.StreamOps.tumblingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS event_count,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q_stream_sliding",
      (s, d) => graft.streaming.StreamOps.slidingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      Some("""WITH w0 AS (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800 AS s, event_type, value FROM events
        |), slots AS (
        |  SELECT s AS window_start, event_type, value FROM w0
        |  UNION ALL
        |  SELECT s - 1800, event_type, value FROM w0
        |)
        |SELECT CAST(window_start AS BIGINT) AS window_start, event_type,
        |  count(*) AS event_count,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM slots GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q_session_window",
      (s, d) => graft.streaming.StreamOps.sessionWindowStats(Tables.events(s, d))
        .orderBy("user_id", "session_start"),
      Some("""WITH ev AS (
        |  SELECT user_id, ts, event_type, value, epoch_us(ts) AS ts_us FROM events
        |), d AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |    OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sx AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
        |  FROM d
        |)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start,
        |  CAST(epoch(date_trunc('second', max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end,
        |  count(*) AS event_count,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM sx GROUP BY user_id, sidx
        |ORDER BY user_id, session_start""".stripMargin)),

    QueryDef("q_pii_masking",
      (s, d) => operators.Masking.maskCustomers(Tables.customer(s, d))
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, c_mktsegment,
        |  substr(c_name, 1, 9) || '***' AS name_masked,
        |  sha256(c_name || '${operators.Masking.Pepper}') AS name_token,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 1000 THEN 'low'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS acctbal_band
        |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef("q_refund_summary",
      (s, d) => {
        val li = Cleaning.cleanLineitem(Tables.lineitem(s, d))
        val ord = Cleaning.cleanOrders(Tables.orders(s, d))
        li.join(ord.select("o_orderkey", "order_date"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("order_date"))
          .agg(
            count(lit(1)).as("total_lines"),
            sum(when(col("is_refund"), 1L).otherwise(0L)).as("refund_lines"),
            graft.util.Cols.sumExact6(
              when(col("is_refund"), col("net_price")).otherwise(lit(0.0)))
              .as("refund_amount"))
          .withColumn("refund_rate",
            col("refund_lines").cast("double") / col("total_lines"))
          .orderBy("order_date")
      },
      Some(CleanOrdersCte + ", " + CleanLineitemCte.stripPrefix("WITH ") +
        """
        |SELECT order_date, count(*) AS total_lines,
        |  CAST(sum(CASE WHEN is_refund THEN 1 ELSE 0 END) AS BIGINT) AS refund_lines,
        |  CAST(sum(CAST(CASE WHEN is_refund THEN net_price ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS refund_amount,
        |  CAST(sum(CASE WHEN is_refund THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS refund_rate
        |FROM clean_lineitem JOIN clean_orders ON l_orderkey = o_orderkey
        |GROUP BY order_date ORDER BY order_date""".stripMargin)),

    QueryDef("q_salted_agg",
      (s, d) => operators.SaltedAgg.userEventStats(Tables.events(s, d))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS event_count,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("q_returned_customers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val perCust = li
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(graft.util.Cols.sumMoneyTimes(col("l_extendedprice"),
            lit(1) - col("l_discount")).as("returned_revenue"),
            count(lit(1)).as("returned_lines"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("returned_revenue").desc, col("o_custkey").asc)
        perCust
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
            col("c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 20)
          .select("rank", "o_custkey", "c_name", "n_name", "returned_lines", "returned_revenue")
          .orderBy("rank")
      },
      Some("""WITH per_cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS returned_revenue,
        |    count(*) AS returned_lines
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey
        |)
        |SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY returned_revenue DESC, o_custkey ASC) AS BIGINT) AS rank,
        |    o_custkey, c_name, n_name, returned_lines, returned_revenue
        |  FROM per_cust
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |) t WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    QueryDef("q_pivot",
      (s, d) => gold.Olap.eventTypePivot(Tables.events(s, d)).orderBy("user_id"),
      Some {
        val cols = gold.Olap.EventTypes.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
          .mkString(",\n  ")
        s"""SELECT user_id,
           |  $cols
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
      }),

    QueryDef("q_rollup",
      (s, d) => gold.Olap.revenueRollup(Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d)))
        .orderBy("region_name", "nation_name", "gid"),
      Some(CleanOrdersCte +
        s"""
        |, enr AS (
        |  SELECT n.n_name AS nation_name, r.r_name AS region_name, co.o_totalprice
        |  FROM clean_orders co
        |  JOIN customer c ON co.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |)
        |SELECT COALESCE(region_name, 'ALL') AS region_name,
        |  COALESCE(nation_name, 'ALL') AS nation_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS order_count,
        |  CAST(GROUPING(region_name, nation_name) AS BIGINT) AS gid
        |FROM enr GROUP BY ROLLUP(region_name, nation_name)
        |ORDER BY region_name, nation_name, gid""".stripMargin)),

    QueryDef("q_cube",
      (s, d) => gold.Olap.statusTierCube(Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("status_normalized", "amount_tier", "gid"),
      Some(CleanOrdersCte +
        """
        |SELECT COALESCE(status_normalized, 'ALL') AS status_normalized,
        |  COALESCE(amount_tier, 'ALL') AS amount_tier,
        |  count(*) AS order_count,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(status_normalized, amount_tier) AS BIGINT) AS gid
        |FROM clean_orders GROUP BY CUBE(status_normalized, amount_tier)
        |ORDER BY status_normalized, amount_tier, gid""".stripMargin)),

    QueryDef("q_grouping_sets",
      (s, d) => gold.Olap.statusTierGroupingSets(
          Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("status_normalized", "amount_tier", "gid"),
      Some(CleanOrdersCte +
        """
        |SELECT COALESCE(status_normalized, 'ALL') AS status_normalized,
        |  COALESCE(amount_tier, 'ALL') AS amount_tier,
        |  count(*) AS order_count,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(status_normalized, amount_tier) AS BIGINT) AS gid
        |FROM clean_orders
        |GROUP BY GROUPING SETS ((status_normalized), (amount_tier))
        |ORDER BY status_normalized, amount_tier, gid""".stripMargin)),

    // Sketch queries are engine-specific (DataSketches HLL / KLL-style
    // percentile_approx) → rows-only gate; SketchesSpec bounds the error.
    QueryDef("q_hll_daily",
      (s, d) => gold.Sketches.dailyUserSketches(Tables.events(s, d))
        .orderBy("event_date"),
      None),

    QueryDef("q_hll_total",
      (s, d) => gold.Sketches.mergedDistinctUsers(Tables.events(s, d)),
      None),

    QueryDef("q_hll_rollup",
      (s, d) => gold.Sketches.sketchRollup(Tables.events(s, d))
        .orderBy("event_type"),
      None),

    // KMV audience overlap — the intersection estimate HLL cannot produce
    // (rows-only: sketch values are hash-engine-specific; SketchesSpec
    // bounds the error against exact set intersections)
    QueryDef("q_kmv_overlap",
      (s, d) => gold.Sketches.audienceOverlap(Tables.events(s, d))
        .orderBy("event_date"),
      None),

    // KMV set-difference estimates (A-not-B audiences) off the same
    // per-day sketch pair — rows-only (sketch internals, SURVEY §4);
    // SketchesSpec bounds the error vs the exact twin.
    QueryDef("q_kmv_difference",
      (s, d) => gold.Sketches.audienceDifference(Tables.events(s, d))
        .orderBy("event_date"),
      None),

    // daily KMV sketches merged to the period total (kmv_merge_agg) —
    // the stored-sketch re-aggregation path, intersection included
    QueryDef("q_kmv_total",
      (s, d) => gold.Sketches.totalAudienceOverlap(Tables.events(s, d)),
      None),

    // Count-min point-frequency probes (functions/CmsSketch.scala) — the
    // "how often does THIS token occur" estimate for ANY token from
    // O(depth·width) state, complementing topk_freq's retained head
    // (rows-only: sketch hashing is engine-specific; SketchesSpec proves
    // never-undercount + the e·N/width ceiling against exact counts)
    QueryDef("q_cms_freq",
      (s, d) => gold.Sketches.tokenFrequencyProbes(Tables.documents(s, d),
          Seq("the", "of", "and", "data", "fraud", "model",
            "quasar", "zzyzx", "unseen"))
        .orderBy("token"),
      None),

    QueryDef("q_approx_quantiles",
      (s, d) => gold.Sketches.approxOrderQuantiles(
          Cleaning.cleanOrders(Tables.orders(s, d)))
        .orderBy("status_normalized"),
      None),

    QueryDef("q_stream_join",
      (s, d) => graft.streaming.StreamOps.purchaseErrorJoin(Tables.events(s, d))
        .select(col("p_event_id"), col("e_event_id"), col("p_user").as("user_id"),
          unix_timestamp(date_trunc("second", col("p_ts"))).as("p_ts_s"),
          unix_timestamp(date_trunc("second", col("e_ts"))).as("e_ts_s"),
          col("p_value"))
        .orderBy("p_event_id", "e_event_id"),
      Some("""WITH p AS (
        |  SELECT ts AS p_ts, user_id, event_id AS p_event_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |), e AS (
        |  SELECT ts AS e_ts, user_id, event_id AS e_event_id
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT p.p_event_id, e.e_event_id, p.user_id,
        |  CAST(epoch(date_trunc('second', p.p_ts)) AS BIGINT) AS p_ts_s,
        |  CAST(epoch(date_trunc('second', e.e_ts)) AS BIGINT) AS e_ts_s,
        |  p.p_value
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND e.e_ts >= p.p_ts - INTERVAL 1 HOUR AND e.e_ts <= p.p_ts
        |ORDER BY p.p_event_id, e.e_event_id""".stripMargin)),

    QueryDef("q_multimodal_meta",
      (s, d) => Multimodal.mediaMetadata(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id, source, lang,
        |  'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_count,
        |  sha256(text) AS checksum,
        |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 1024 AS stub_width,
        |  64 + (CAST(octet_length(encode(text)) AS BIGINT) // 7) % 1024 AS stub_height
        |FROM documents ORDER BY doc_id""".stripMargin))
  )

  // ---- round-3 additions: behavior analytics, SCD2, TF-IDF, anomaly ----

  private lazy val batch4: Seq[QueryDef] = Seq(

    QueryDef("q_funnel",
      (s, d) => gold.Behavior.funnel(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us")),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("stage_idx"),
      Some(EventsUsCte +
        """
        |, s0 AS (
        |  SELECT user_id, event_type, ts_us,
        |    min(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (PARTITION BY user_id) AS t0
        |  FROM ev
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t1 FROM s0
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2
        |), pu AS (
        |  SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |  FROM s3 GROUP BY user_id
        |), c AS (
        |  SELECT count(t0) AS u0, count(t1) AS u1, count(t2) AS u2, count(t3) AS u3 FROM pu
        |)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage, u0 AS users_reached,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u0 AS DOUBLE) / CAST(u0 AS DOUBLE) END AS conversion_from_prev,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u0 AS DOUBLE) / CAST(u0 AS DOUBLE) END AS conversion_from_start
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'view', u1,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u1 AS DOUBLE) / CAST(u0 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u1 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', u2,
        |    CASE WHEN u1 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u2 AS DOUBLE) / CAST(u1 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u2 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', u3,
        |    CASE WHEN u2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u3 AS DOUBLE) / CAST(u2 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u3 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |) t ORDER BY stage_idx""".stripMargin)),

    QueryDef("q_retention_cohorts",
      (s, d) => gold.Behavior.retentionCohorts(
          Tables.orders(s, d).select(col("o_custkey"),
            to_date(col("o_orderdate")).as("order_date")),
          "o_custkey", "order_date")
        .orderBy("cohort_month", "months_since"),
      Some("""WITH o AS (
        |  SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS activity_month
        |  FROM orders
        |), w AS (
        |  SELECT o_custkey, activity_month,
        |    min(activity_month) OVER (PARTITION BY o_custkey) AS cohort_month
        |  FROM o
        |), a AS (
        |  SELECT cohort_month,
        |    CAST((year(activity_month) * 12 + month(activity_month))
        |       - (year(cohort_month) * 12 + month(cohort_month)) AS BIGINT) AS months_since,
        |    count(DISTINCT o_custkey) AS active_customers
        |  FROM w GROUP BY 1, 2
        |), r AS (
        |  SELECT *, max(CASE WHEN months_since = 0 THEN active_customers END)
        |    OVER (PARTITION BY cohort_month) AS cohort_size
        |  FROM a
        |)
        |SELECT cohort_month, months_since, active_customers, cohort_size,
        |  CAST(active_customers AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention_rate
        |FROM r ORDER BY cohort_month, months_since""".stripMargin)),

    QueryDef("q_scd2_tiers",
      (s, d) => {
        // day-grain state = the day's last order's tier (max o_orderkey —
        // unique, so max_by is deterministic). A hash aggregate with
        // map-side partial agg, not a (cust,date)-window sort. The
        // repartition on custkey alone satisfies BOTH the (cust,date)
        // groupBy's clustering (subset rule) and the scd2 windows'
        // cust partitioning — one exchange instead of two.
        val daily = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
          .groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        operators.Scd.scd2(daily, "o_custkey", "order_date", Seq("amount_tier"))
          .select("o_custkey", "version", "amount_tier", "valid_from",
            "last_observed", "observation_count", "valid_to", "is_current")
          .orderBy("o_custkey", "version")
      },
      Some(Scd2VersionCtes +
        """
        |SELECT o_custkey, version, amount_tier, valid_from, last_observed, observation_count,
        |  COALESCE(lead(valid_from) OVER wv, DATE '9999-12-31') AS valid_to,
        |  lead(valid_from) OVER wv IS NULL AS is_current
        |FROM coll WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        |ORDER BY o_custkey, version""".stripMargin)),

    // Point-in-time (strictly-before) read of the SCD2 tier history: each
    // order picks up the customer's tier version entering the order's day —
    // the leakage-free feature-store join. Spark side: Scd.priorStateJoin
    // (union+window, one custkey exchange shared with the scd2 build).
    QueryDef("q_pit_join",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
        val daily = clean.groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        val versions = operators.Scd
          .scd2(daily, "o_custkey", "order_date", Seq("amount_tier"))
          .select(col("o_custkey"), col("valid_from"),
            col("version"), col("amount_tier"))
        val orders = clean.select("o_orderkey", "o_custkey", "order_date", "amount_tier")
        operators.Scd.priorStateJoin(orders, versions,
            "o_custkey", "order_date", "valid_from", Seq("amount_tier", "version"))
          .withColumn("tier_changed",
            col("prior_amount_tier").isNotNull
              && col("prior_amount_tier") =!= col("amount_tier"))
          .select("o_orderkey", "o_custkey", "order_date", "amount_tier",
            "prior_amount_tier", "prior_version", "tier_changed")
          .orderBy("o_orderkey")
      },
      Some(Scd2VersionCtes +
        """
        |, pri AS (
        |  SELECT o_orderkey, prior_amount_tier, prior_version FROM (
        |    SELECT o.o_orderkey, s.amount_tier AS prior_amount_tier,
        |      s.version AS prior_version,
        |      row_number() OVER (PARTITION BY o.o_orderkey ORDER BY s.version DESC) AS rn
        |    FROM clean_orders o
        |    JOIN coll s ON o.o_custkey = s.o_custkey AND s.valid_from < o.order_date
        |  ) t WHERE rn = 1
        |)
        |SELECT o.o_orderkey, o.o_custkey, o.order_date, o.amount_tier,
        |  p.prior_amount_tier, p.prior_version,
        |  p.prior_amount_tier IS NOT NULL AND p.prior_amount_tier <> o.amount_tier AS tier_changed
        |FROM clean_orders o LEFT JOIN pri p ON o.o_orderkey = p.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin)),

    QueryDef("q_tfidf",
      (s, d) => text.TfIdf.topTerms(Tables.documents(s, d), 5)
        .orderBy("doc_id", "term_rank"),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    ln(CAST(1 + n.n_docs AS DOUBLE) / CAST(1 + dfreq.df AS DOUBLE)) + CAST(1.0 AS DOUBLE) AS idf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT doc_id, term, tf, df, idf, CAST(tf AS DOUBLE) * idf AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY CAST(tf AS DOUBLE) * idf DESC, term) AS term_rank
        |  FROM scored
        |)
        |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term, tf, df, idf, tfidf
        |FROM ranked WHERE term_rank <= 5 ORDER BY doc_id, term_rank""".stripMargin)),

    // Lexical retrieval: BM25 over a fixed query-term list. The per-doc
    // score sum is pivoted into fixed-order per-term columns on BOTH sides
    // (SURVEY §4: no parallel double sums — fixed expression order instead).
    QueryDef("q_bm25_rank",
      (s, d) => text.Bm25.rank(
          Tables.documents(s, d), Bm25QueryTerms, 20)
        .orderBy("bm25_rank"),
      Some(text.Bm25.oracleSql(Bm25QueryTerms, 20))),

    QueryDef("q_neardup_ensemble",
      (s, d) => text.Ensemble.ensembleNearDups(
          Tables.documents(s, d), Tables.embeddings(s, d), 0.35)
        .orderBy("doc_a", "doc_b"),
      Some(text.MinHash.candidatePairsSqlCtes +
        s"""
        |, emb AS (
        |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), ep AS (
        |  SELECT * FROM (
        |    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |      ${cosSql("a.embedding", "b.embedding")} AS cos_sim
        |    FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  ) t WHERE cos_sim > 0.35
        |), m AS (
        |  SELECT COALESCE(p.doc_a, ep.doc_a) AS doc_a,
        |    COALESCE(p.doc_b, ep.doc_b) AS doc_b,
        |    p.doc_a IS NOT NULL AS tc, ep.doc_a IS NOT NULL AS ec, ep.cos_sim
        |  FROM pairs p FULL OUTER JOIN ep ON p.doc_a = ep.doc_a AND p.doc_b = ep.doc_b
        |), voc AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS vocab FROM documents
        |), jx AS (
        |  SELECT m.doc_a, m.doc_b,
        |    CASE WHEN tc AND ec THEN 'both' WHEN tc THEN 'text_only'
        |         ELSE 'embedding_only' END AS signal,
        |    m.cos_sim,
        |    CAST(len(list_filter(va.vocab, t -> list_contains(vb.vocab, t))) AS BIGINT) AS inter_size,
        |    CAST(len(va.vocab) AS BIGINT) AS na, CAST(len(vb.vocab) AS BIGINT) AS nb
        |  FROM m JOIN voc va ON m.doc_a = va.doc_id JOIN voc vb ON m.doc_b = vb.doc_id
        |)
        |SELECT doc_a, doc_b, signal, cos_sim,
        |  CAST(inter_size AS DOUBLE) / (na + nb - inter_size) AS exact_jaccard
        |FROM jx ORDER BY doc_a, doc_b""".stripMargin)),

    QueryDef("q_change_feed",
      (s, d) => {
        val co = Cleaning.cleanOrders(Tables.orders(s, d))
        val before = co.filter(col("o_orderkey") % 2 === 0)
        val after = co.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(1.1))
              .otherwise(col("o_totalprice")))
        operators.ChangeFeed.changes(before, after,
            Seq("o_orderkey"), Seq("o_totalprice", "status_normalized"))
          .select("o_orderkey", "_change_type", "o_totalprice_old",
            "o_totalprice_new", "status_normalized_old", "status_normalized_new")
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |, b AS (
        |  SELECT o_orderkey, o_totalprice, status_normalized
        |  FROM clean_orders WHERE o_orderkey % 2 = 0
        |), a AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
        |         ELSE o_totalprice END AS o_totalprice,
        |    status_normalized
        |  FROM clean_orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT * FROM (
        |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |         WHEN a.o_orderkey IS NULL THEN 'delete'
        |         WHEN b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |           OR b.status_normalized IS DISTINCT FROM a.status_normalized THEN 'update'
        |    END AS _change_type,
        |    b.o_totalprice AS o_totalprice_old, a.o_totalprice AS o_totalprice_new,
        |    b.status_normalized AS status_normalized_old,
        |    a.status_normalized AS status_normalized_new
        |  FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
        |) t WHERE _change_type IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_first_event",
      (s, d) => Cleaning.deterministicDedup(
          Tables.events(s, d).select(col("event_id"), col("user_id"),
            col("event_type"), col("value"), expr("ts_ns div 1000").as("ts_us")),
          Seq("user_id", "event_type"), Seq("ts_us", "event_id"))
        .orderBy("user_id", "event_type"),
      Some(EventsUsCte +
        """
        |SELECT event_id, user_id, event_type, value, ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us, event_id) AS rn
        |  FROM ev) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    QueryDef("q_amount_outliers",
      (s, d) => {
        val enriched = Cleaning.cleanOrders(Tables.orders(s, d))
          .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("n_name"), col("o_totalprice"))
        operators.Anomaly.outliers(enriched, Seq("n_name"), "o_totalprice", 1.75)
          .select("o_orderkey", "o_custkey", "n_name", "o_totalprice",
            "group_mean", "group_stddev", "z_score")
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |, enr AS (
        |  SELECT o_orderkey, o_custkey, n_name, o_totalprice
        |  FROM clean_orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |), mom AS (
        |  SELECT n_name, count(o_totalprice) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq
        |  FROM enr GROUP BY 1
        |), stats AS (
        |  SELECT n_name, n, s / n AS group_mean,
        |    sqrt((sq - s * s / n) / n) AS group_stddev
        |  FROM mom
        |)
        |SELECT o_orderkey, o_custkey, enr.n_name, o_totalprice, group_mean, group_stddev,
        |  (o_totalprice - group_mean) / group_stddev AS z_score
        |FROM enr JOIN stats ON enr.n_name = stats.n_name
        |WHERE n >= 2 AND group_stddev > CAST(0.0 AS DOUBLE)
        |  AND abs(o_totalprice - group_mean) > CAST(1.75 AS DOUBLE) * group_stddev
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_rep_filter",
      (s, d) => text.Curation.repetitionStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t,
        |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS non_space_chars
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tokens, non_space_chars FROM toks
        |), g2 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
        |    j -> array_to_string(t[j:j+1], ' '))) AS gram FROM toks
        |), g2c AS (
        |  SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2
        |), s2 AS (
        |  SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS total_bigrams,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigram_instances
        |  FROM g2c GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |    j -> array_to_string(t[j:j+2], ' '))) AS gram FROM toks
        |), g3c AS (
        |  SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2
        |), s3 AS (
        |  SELECT doc_id, sum(c) AS total_trigrams,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_trigram_instances
        |  FROM g3c GROUP BY 1
        |)
        |SELECT base.doc_id, lang, n_tokens,
        |  CAST(non_space_chars AS DOUBLE) / n_tokens AS mean_token_len,
        |  CAST(top_bigram_count AS BIGINT) AS top_bigram_count,
        |  CAST(top_bigram_count AS DOUBLE) / total_bigrams AS top_bigram_share,
        |  CAST(dup_trigram_instances AS BIGINT) AS dup_trigram_instances,
        |  CAST(dup_trigram_instances AS DOUBLE) / total_trigrams AS dup_trigram_frac,
        |  (n_tokens BETWEEN 10 AND 1000
        |   AND CAST(non_space_chars AS DOUBLE) / n_tokens BETWEEN CAST(2.0 AS DOUBLE) AND CAST(12.0 AS DOUBLE)
        |   AND CAST(top_bigram_count AS DOUBLE) / total_bigrams <= CAST(0.04 AS DOUBLE)
        |   AND CAST(dup_trigram_instances AS DOUBLE) / total_trigrams <= CAST(0.25 AS DOUBLE)) AS keep
        |FROM base JOIN s2 ON base.doc_id = s2.doc_id JOIN s3 ON base.doc_id = s3.doc_id
        |ORDER BY base.doc_id""".stripMargin)),

    // Sketch-gated decontamination for eval sets too big to broadcast:
    // a CMS of eval grams prunes the train gram stream map-side
    // (estimate 0 = definitely absent), exact join confirms survivors —
    // output is BIT-IDENTICAL to q_decontaminate, so it shares the same
    // DuckDB oracle (the sketch only moves the work, never the answer)
    QueryDef("q_decontaminate_sketch",
      (s, d) => text.Curation.decontaminateSketch(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(decontaminateOracle)),

    QueryDef("q_decontaminate",
      (s, d) => text.Curation.decontaminate(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(decontaminateOracle)),

    // End-to-end curation audit (quality gate -> canonical election among
    // survivors -> decontamination) as ONE composed plan; every exclusion
    // names its reason, kept = all three stages pass. Hash-exact oracle
    // mirrors all three stages.
    QueryDef("q_curation_pipeline",
      (s, d) => text.Curation.curatePipeline(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some {
        val stopList = graft.text.QualityRules.StopWords
          .map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (
        |  SELECT doc_id, lang, source, text,
        |    string_split(text, ' ') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE source <> 'src0'
        |), m AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS n_symbol_words,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(toks, w -> lower(w) IN ($stopList))) AS BIGINT) AS n_stop_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ellipsis_lines
        |  FROM t
        |), q AS (
        |  SELECT doc_id, lang, source, md5(text) AS content_hash,
        |    (n_words >= 50 AND n_words <= 100000
        |     AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
        |     AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
        |     AND CAST(n_symbol_words AS DOUBLE) / n_words <= 0.1
        |     AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8
        |     AND n_stop_words >= 2
        |     AND CAST(n_bullet_lines AS DOUBLE) / n_lines <= 0.9
        |     AND CAST(n_ellipsis_lines AS DOUBLE) / n_lines <= 0.3) AS passes_gopher
        |  FROM m
        |), canon AS (
        |  SELECT content_hash, min(doc_id) AS canonical_doc_id
        |  FROM q WHERE passes_gopher GROUP BY 1
        |), g AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 3, 1) + 1),
        |      j -> array_to_string(string_split(text, ' ')[j:j+3], ' '))) AS grams
        |  FROM documents
        |), ev AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = 'src0'
        |), tg AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE source <> 'src0'
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hit_grams FROM tg JOIN ev USING (gram) GROUP BY 1
        |)
        |SELECT q.doc_id, q.lang, q.source, q.content_hash, q.passes_gopher,
        |  canon.canonical_doc_id,
        |  (q.passes_gopher AND q.doc_id = canon.canonical_doc_id) AS is_canonical,
        |  CAST(COALESCE(hits.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
        |  COALESCE(hits.n_hit_grams, 0) > 0 AS is_contaminated,
        |  (q.passes_gopher AND q.doc_id = canon.canonical_doc_id
        |    AND NOT COALESCE(hits.n_hit_grams, 0) > 0) AS kept
        |FROM q LEFT JOIN canon USING (content_hash)
        |  LEFT JOIN hits ON q.doc_id = hits.doc_id
        |ORDER BY q.doc_id""".stripMargin
      }),

    // Exact-substring duplicate spans (Lee et al. 2022 ExactSubstr):
    // maximal cross-doc verbatim token spans with offsets. The oracle
    // mirrors the gram→duplicated→gaps-and-islands pipeline on gram
    // STRINGS (the Spark side joins on xxhash64 of the same strings —
    // identical output absent a 64-bit collision).
    QueryDef("q_exact_substr",
      (s, d) => text.ExactSubstr.duplicateSpans(Tables.documents(s, d))
        .orderBy("doc_id", "span_start"),
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), p AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS j
        |  FROM t
        |), g AS (
        |  SELECT doc_id, j - 1 AS pos,
        |    array_to_string(toks[j:j+7], ' ') AS gram
        |  FROM p
        |), d AS (
        |  SELECT gram, count(DISTINCT doc_id) AS docs_sharing
        |  FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |), h AS (
        |  SELECT g.doc_id, g.pos, d.docs_sharing
        |  FROM g JOIN d USING (gram)
        |), i AS (
        |  SELECT doc_id, pos, docs_sharing,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
        |      THEN 0 ELSE 1 END AS brk
        |  FROM h
        |), s AS (
        |  SELECT doc_id, pos, docs_sharing,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM i
        |)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 8 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens,
        |  count(*) AS n_dup_grams,
        |  CAST(max(docs_sharing) AS BIGINT) AS max_docs_sharing
        |FROM s GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin)),

    // Apply the ExactSubstr spans: cut every duplicated passage out of
    // every document (Lee et al. 2022 cut-all policy) — cleaned corpus +
    // audit counts. Oracle mirrors the span CTE and splices by position
    // anti-join.
    QueryDef("q_splice_spans",
      (s, d) => text.ExactSubstr.spliceSpans(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), p AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS j
        |  FROM t
        |), g AS (
        |  SELECT doc_id, j - 1 AS pos,
        |    array_to_string(toks[j:j+7], ' ') AS gram
        |  FROM p
        |), d AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |), h AS (
        |  SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
        |), i AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
        |      THEN 0 ELSE 1 END AS brk
        |  FROM h
        |), s AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM i
        |), spans AS (
        |  SELECT doc_id, min(pos) AS a, max(pos) + 8 AS b
        |  FROM s GROUP BY doc_id, island
        |), nsp AS (
        |  SELECT doc_id, count(*) AS spans_cut FROM spans GROUP BY doc_id
        |), cov AS (
        |  SELECT sp.doc_id,
        |    unnest(range(sp.a, least(sp.b, len(t.toks)))) AS pos
        |  FROM spans sp JOIN t USING (doc_id)
        |), alltok AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks))) AS j FROM t
        |), kept AS (
        |  SELECT a.doc_id, a.j, a.toks[a.j + 1] AS tok
        |  FROM alltok a LEFT JOIN cov c ON a.doc_id = c.doc_id AND a.j = c.pos
        |  WHERE c.pos IS NULL
        |), agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
        |    count(*) AS kept_tokens
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  CAST(len(t.toks) AS BIGINT) AS orig_tokens,
        |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  CAST(len(t.toks) - coalesce(a.kept_tokens, 0) AS BIGINT) AS removed_tokens,
        |  CAST(coalesce(n.spans_cut, 0) AS BIGINT) AS spans_cut
        |FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN nsp n USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Deterministic mixture sampling: per-lang quotas drawn by portable
    // md5 hash-rank (two-phase ranked cut, no per-group window).
    QueryDef("q_mixture_sample",
      (s, d) => text.Mixture.mixtureSample(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.Mixture.mixtureOracleSql())),

    // Per-vector symmetric int8 quantization: scalar pins of the full
    // code vector + fidelity metrics, identical double arithmetic in
    // both engines (single-list lambdas, no zip) → hash-exact.
    QueryDef("q_embed_int8",
      (s, d) => graft.sim.Quantize.int8Summary(Tables.embeddings(s, d))
        .orderBy("vec_id"),
      Some(graft.sim.Quantize.int8OracleSql)),

    QueryDef("q_pack_sequences",
      // docsPerBucket=100 forces the multi-bucket carry path at sf0.01
      // (500 docs -> ~5 buckets); the output is invariant to bucket size.
      (s, d) => text.Packing.packSequences(Tables.documents(s, d), 128,
          docsPerBucket = 100L)
        .orderBy("lang", "seq_idx", "pos_in_seq"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end
        |  FROM t
        |), s AS (
        |  SELECT *, tok_end - n_tokens AS tok_start,
        |    (tok_end - n_tokens) // 128 AS first_seq, (tok_end - 1) // 128 AS last_seq
        |  FROM c
        |), e AS (
        |  SELECT doc_id, lang, n_tokens, tok_start, tok_end,
        |    unnest(range(first_seq, last_seq + 1)) AS seq_idx
        |  FROM s
        |)
        |SELECT lang, CAST(seq_idx AS BIGINT) AS seq_idx,
        |  CAST(greatest(tok_start, seq_idx * 128) - seq_idx * 128 AS BIGINT) AS pos_in_seq,
        |  doc_id,
        |  CAST(greatest(tok_start, seq_idx * 128) - tok_start AS BIGINT) AS doc_offset,
        |  CAST(least(tok_end, seq_idx * 128 + 128) - greatest(tok_start, seq_idx * 128) AS BIGINT) AS tokens_in_seq,
        |  n_tokens,
        |  (tok_start < seq_idx * 128 OR tok_end > seq_idx * 128 + 128) AS is_split
        |FROM e ORDER BY lang, seq_idx, pos_in_seq""".stripMargin)),

    // Interpolated bigram LM: λ·p(cur|prev) + (1−λ)·p(cur), <s> start
    // symbol, micro-nat fixed-point quantization (UnigramLm contract).
    QueryDef("q_bigram_lm",
      (s, d) => text.BigramLm.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.BigramLm.oracleSql)),

    // CCNet perplexity buckets: every document ranked by bigram-LM
    // fluency and cut into head/middle/tail terciles — the quality
    // stratification deciding which crawl slice trains at full weight.
    // Rank key = ONE IEEE division of exact micro-nat integers; tercile
    // cut = integer arithmetic; global rank via ScalableRank.
    QueryDef("q_ppl_buckets",
      (s, d) => text.BigramLm.pplBuckets(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.BigramLm.pplBucketsOracleSql)),

    QueryDef("q_unigram_lm",
      (s, d) => text.UnigramLm.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), tok2 AS (
        |  SELECT doc_id, token FROM tok WHERE token <> ''
        |), vocab AS (
        |  SELECT token, count(*) AS cnt FROM tok2 GROUP BY 1
        |), tot AS (
        |  SELECT sum(cnt) AS total_tokens FROM vocab
        |), lm AS (
        |  SELECT token,
        |    CAST(floor(CAST(CAST(ln(CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS FLOAT) AS DOUBLE)
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS lp_micro
        |  FROM vocab CROSS JOIN tot
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp_micro) AS sum_lp_micro
        |  FROM tok2 JOIN lm USING (token) GROUP BY 1
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
        |  CAST(sum_lp_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) / n_tokens AS avg_logprob,
        |  -(CAST(sum_lp_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) / n_tokens) / ${text.UnigramLm.Ln2Literal} AS bits_per_token
        |FROM agg ORDER BY doc_id""".stripMargin))
  )

  private def literalScored(s: SparkSession, d: String): DataFrame =
    FraudScore.score(FraudScore.featureVector(Enrichment.enrichOrders(
      Cleaning.cleanOrders(Tables.orders(s, d)),
      Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))))

  // r8 batch: model-evaluation statistics, drift monitoring, forensic
  // screens, fraud-ring pairs, and revenue attribution.
  private lazy val batch5: Seq[QueryDef] = Seq(

    // Exact distributed ROC-AUC of the literal scorer as a Mann–Whitney
    // rank statistic — ScalableRank global ranking + one aggregate, all
    // integer until the final division (ml/Evaluation.scala).
    QueryDef("q_roc_auc",
      (s, d) => Evaluation.rocAuc(literalScored(s, d), "fraud_score", "label",
          "o_orderkey")
        .orderBy("pos_n"),
      Some(ScoredCte +
        """
        |, r AS (
        |  SELECT label,
        |    2 * rank() OVER (ORDER BY fraud_score)
        |      + count(*) OVER (PARTITION BY fraud_score) - 1 AS r2
        |  FROM scored
        |), agg AS (
        |  SELECT CAST(sum(label) AS BIGINT) AS pos_n,
        |         CAST(count(*) - sum(label) AS BIGINT) AS neg_n,
        |         CAST(sum(CASE WHEN label = 1 THEN r2 ELSE 0 END) AS BIGINT) AS rank_sum2
        |  FROM r
        |), a2 AS (
        |  SELECT pos_n, neg_n, rank_sum2,
        |    CAST(rank_sum2 - pos_n * (pos_n + 1) AS DOUBLE) / (2.0 * pos_n * neg_n) AS auc
        |  FROM agg
        |)
        |SELECT pos_n, neg_n, rank_sum2, auc, 2.0 * auc - 1.0 AS gini
        |FROM a2 ORDER BY pos_n""".stripMargin)),

    // Reliability-diagram decile bins; micro-unit quantization keeps the
    // double sums hash-exact (SURVEY §4 / UnigramLm contract).
    QueryDef("q_calibration",
      (s, d) => Evaluation.calibrationBins(literalScored(s, d), "fraud_score",
        "label", bins = 10),
      Some(ScoredCte +
        """
        |, b AS (
        |  SELECT least(CAST(floor(CAST(fraud_score AS DOUBLE) * 10) AS BIGINT), 9) AS bin,
        |    label,
        |    CAST(floor(CAST(fraud_score AS DOUBLE) * 1000000.0) AS BIGINT) AS s_micro,
        |    CAST(floor((CAST(fraud_score AS DOUBLE) - label) * (CAST(fraud_score AS DOUBLE) - label)
        |      * 1000000000.0) AS BIGINT) AS sq_nano
        |  FROM scored
        |), g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS positives,
        |    CAST(sum(s_micro) AS BIGINT) AS sum_score_micro,
        |    CAST(sum(sq_nano) AS BIGINT) AS brier_sum_nano
        |  FROM b GROUP BY 1
        |)
        |SELECT bin, n, positives, sum_score_micro, brier_sum_nano,
        |  CAST(bin AS DOUBLE) / 10 AS bin_lo,
        |  CAST(positives AS DOUBLE) / n AS pos_rate,
        |  CAST(sum_score_micro AS DOUBLE) / 1000000.0 / n AS mean_pred,
        |  CAST(sum_score_micro AS DOUBLE) / 1000000.0 / n
        |    - CAST(positives AS DOUBLE) / n AS calib_gap
        |FROM g ORDER BY bin""".stripMargin)),

    // Operating-point sweep: precision/recall/F1 at every occupied grid
    // threshold — suffix sums over the ≤20-row bin frame, no per-threshold
    // rescan (ml/Evaluation.scala).
    QueryDef("q_threshold_sweep",
      (s, d) => Evaluation.thresholdSweep(literalScored(s, d), "fraud_score",
        "label", steps = 20),
      Some(ScoredCte +
        """
        |, b AS (
        |  SELECT least(CAST(floor(CAST(fraud_score AS DOUBLE) * 20) AS BIGINT), 19) AS bin, label
        |  FROM scored
        |), g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
        |  FROM b GROUP BY 1
        |), c AS (
        |  SELECT bin,
        |    CAST(sum(pos) OVER () AS BIGINT) AS total_pos,
        |    CAST(sum(n) OVER () AS BIGINT) AS total,
        |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS tp,
        |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS predicted_pos
        |  FROM g
        |), f AS (
        |  SELECT bin AS threshold_step, CAST(bin AS DOUBLE) / 20 AS threshold,
        |    tp, predicted_pos - tp AS fp, total_pos - tp AS fn,
        |    total - predicted_pos - total_pos + tp AS tn,
        |    CAST(tp AS DOUBLE) / predicted_pos AS "precision",
        |    CAST(tp AS DOUBLE) / total_pos AS recall
        |  FROM c
        |)
        |SELECT threshold_step, threshold, tp, fp, fn, tn, "precision", recall,
        |  CASE WHEN "precision" + recall > 0.0
        |       THEN 2.0 * "precision" * recall / ("precision" + recall)
        |       ELSE 0.0 END AS f1
        |FROM f ORDER BY threshold_step""".stripMargin)),

    // Brute cosine top-k over the int8-dequantized corpus — the 4×-fewer-
    // bytes search path, hash-exact because reconstruction is IEEE float
    // rounding, not a trained codebook (sim/Quantize.scala).
    QueryDef("q_knn_int8",
      (s, d) => graft.sim.Quantize.knnInt8(Tables.embeddings(s, d))
        .orderBy("query_id", "rank"),
      Some(graft.sim.Quantize.dequantCteSql +
        s"""
        |, q AS (
        |  SELECT vec_id AS query_id, dq AS qv FROM dqt WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id, e.label,
        |    ${cosSql("q.qv", "e.dq")} AS cos_sim
        |  FROM dqt e JOIN q ON e.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, label, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, vec_id, label, cos_sim FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // PSI + chi-square + binned-KS drift between the first and second
    // halves of the order history, binned by amount tier (gold/Drift.scala).
    QueryDef("q_psi_drift",
      (s, d) => Drift.binnedDrift(
        Cleaning.cleanOrders(Tables.orders(s, d)),
        col("amount_tier"), Drift.tierOrd(col("amount_tier")),
        col("order_date") < lit("1998-01-01").cast("date"), bins = 5),
      Some(CleanOrdersCte +
        """
        |, cnt AS (
        |  SELECT amount_tier AS bin,
        |    CAST(CASE amount_tier WHEN 'micro' THEN 0 WHEN 'low' THEN 1
        |         WHEN 'medium' THEN 2 WHEN 'high' THEN 3 ELSE 4 END AS BIGINT) AS bin_ord,
        |    CAST(sum(CASE WHEN order_date < DATE '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(sum(CASE WHEN order_date < DATE '1998-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
        |  FROM clean_orders GROUP BY 1, 2
        |), tot AS (
        |  SELECT *,
        |    CAST(sum(cnt_a) OVER () AS BIGINT) AS tot_a,
        |    CAST(sum(cnt_b) OVER () AS BIGINT) AS tot_b,
        |    CAST(sum(cnt_a) OVER (ORDER BY bin_ord) AS BIGINT) AS cum_a,
        |    CAST(sum(cnt_b) OVER (ORDER BY bin_ord) AS BIGINT) AS cum_b
        |  FROM cnt
        |), m AS (
        |  SELECT *,
        |    CAST(cnt_a + 1 AS DOUBLE) / CAST(tot_a + 5 AS DOUBLE) AS p_a,
        |    CAST(cnt_b + 1 AS DOUBLE) / CAST(tot_b + 5 AS DOUBLE) AS p_b,
        |    CAST(cnt_a + cnt_b AS DOUBLE) * CAST(tot_a AS DOUBLE)
        |      / CAST(tot_a + tot_b AS DOUBLE) AS exp_a,
        |    CAST(cnt_a + cnt_b AS DOUBLE) * CAST(tot_b AS DOUBLE)
        |      / CAST(tot_a + tot_b AS DOUBLE) AS exp_b
        |  FROM tot
        |)
        |SELECT bin, bin_ord, cnt_a, cnt_b,
        |  CAST(cnt_a AS DOUBLE) / tot_a AS share_a,
        |  CAST(cnt_b AS DOUBLE) / tot_b AS share_b,
        |  (p_a - p_b) * ln(p_a / p_b) AS psi_term,
        |  (CAST(cnt_a AS DOUBLE) - exp_a) * (CAST(cnt_a AS DOUBLE) - exp_a) / exp_a
        |    + (CAST(cnt_b AS DOUBLE) - exp_b) * (CAST(cnt_b AS DOUBLE) - exp_b) / exp_b AS chi2_term,
        |  abs(CAST(cum_a AS DOUBLE) / tot_a - CAST(cum_b AS DOUBLE) / tot_b) AS ecdf_gap
        |FROM m ORDER BY bin_ord""".stripMargin)),

    // Benford leading-digit screen per return-flag segment; exact digit
    // via the decimal(18,2) cents cast (gold/Forensics.scala).
    QueryDef("q_benford",
      (s, d) => Forensics.benford(
        Cleaning.cleanLineitem(Tables.lineitem(s, d)),
        col("l_returnflag"), col("l_extendedprice")),
      Some(CleanLineitemCte +
        """
        |, dg AS (
        |  SELECT l_returnflag AS segment,
        |    CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM clean_lineitem
        |), g AS (
        |  SELECT segment, digit, CAST(count(*) AS BIGINT) AS observed FROM dg GROUP BY 1, 2
        |), t AS (
        |  SELECT *, CAST(sum(observed) OVER (PARTITION BY segment) AS BIGINT) AS segment_total,
        |    ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS expected_p
        |  FROM g
        |), e AS (
        |  SELECT *, CAST(segment_total AS DOUBLE) * expected_p AS expected_n FROM t
        |)
        |SELECT segment, digit, observed, segment_total,
        |  CAST(observed AS DOUBLE) / segment_total AS observed_p,
        |  expected_p,
        |  (CAST(observed AS DOUBLE) - expected_n) * (CAST(observed AS DOUBLE) - expected_n)
        |    / expected_n AS chi2_term
        |FROM e ORDER BY segment, digit""".stripMargin)),

    // Shared-device fraud-ring pairs with the deterministic occupancy
    // governor (gold/Rings.scala).
    QueryDef("q_shared_device_pairs",
      (s, d) => Rings.sharedDevicePairs(Tables.events(s, d)),
      Some("""WITH b AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS device, user_id
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND json_extract_string(props, '$.k') IS NOT NULL
        |), ok AS (
        |  SELECT day, device FROM b GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 50
        |), adm AS (
        |  SELECT b.* FROM b JOIN ok USING (day, device)
        |)
        |SELECT x.user_id AS user_a, y.user_id AS user_b,
        |  CAST(count(*) AS BIGINT) AS shared_device_days,
        |  CAST(count(DISTINCT x.device) AS BIGINT) AS shared_devices,
        |  min(x.day) AS first_day, max(x.day) AS last_day
        |FROM adm x JOIN adm y USING (day, device)
        |WHERE x.user_id < y.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // Multi-touch attribution: 24h-lookback purchase×touch pairing via
    // the RangeJoin day-bin trick, linear/first/last credit
    // (gold/Attribution.scala).
    QueryDef("q_attribution",
      (s, d) => Attribution.multiTouch(Tables.events(s, d)),
      Some(EventsUsCte +
        """
        |, p AS (
        |  SELECT event_id AS purchase_id, user_id, value AS purchase_value, ts_us AS p_ts_us
        |  FROM ev WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts_us AS t_ts_us
        |  FROM ev WHERE event_type IN ('click', 'view')
        |), pair AS (
        |  SELECT p.*, t.touch_id, t.touch_type, t.t_ts_us
        |  FROM p JOIN t USING (user_id)
        |  WHERE t.t_ts_us >= p.p_ts_us - 86400000000 AND t.t_ts_us < p.p_ts_us
        |), cred AS (
        |  SELECT *,
        |    CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
        |    first_value(touch_id) OVER (PARTITION BY purchase_id ORDER BY t_ts_us, touch_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_t,
        |    last_value(touch_id) OVER (PARTITION BY purchase_id ORDER BY t_ts_us, touch_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_t
        |  FROM pair
        |)
        |SELECT purchase_id, user_id, purchase_value, p_ts_us, touch_id, touch_type, t_ts_us,
        |  n_touches, purchase_value / CAST(n_touches AS DOUBLE) AS credit_linear,
        |  touch_id = first_t AS is_first_touch, touch_id = last_t AS is_last_touch
        |FROM cred ORDER BY purchase_id, touch_id""".stripMargin)),

    // ---- r8 graph / resolution / robust-stats pack ----

    // Integer-exact PageRank over the shared-device ring graph
    // (gold/Graph.scala): BIGINT fixed-point mass, integer div per
    // contribution, unrolled to the same 5 iterations in the oracle.
    QueryDef("q_device_pagerank",
      (s, d) => Graph.pageRank(Rings.sharedDevicePairs(Tables.events(s, d))),
      Some(pageRankOracle)),

    // Degree-ordered triangle counting + local clustering coefficient on
    // the same graph; per-node counts are orientation-invariant, which is
    // exactly what the id-ordered oracle enumeration checks.
    QueryDef("q_triangles",
      (s, d) => Graph.triangles(Rings.sharedDevicePairs(Tables.events(s, d))),
      Some(DevicePairsCtes +
        """
        |, tri AS (
        |  SELECT x.user_a AS a, x.user_b AS b, y.user_b AS c
        |  FROM pairs x
        |  JOIN pairs y ON y.user_a = x.user_a AND y.user_b > x.user_b
        |  JOIN pairs z ON z.user_a = x.user_b AND z.user_b = y.user_b
        |), roles AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri
        |), tc AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM roles GROUP BY 1
        |)
        |SELECT d.node AS user_id, d.degree,
        |  COALESCE(t.triangles, 0) AS triangles,
        |  CASE WHEN d.degree < 2 THEN 0.0
        |       ELSE 2.0 * COALESCE(t.triangles, 0) / (d.degree * (d.degree - 1))
        |  END AS clustering
        |FROM deg d LEFT JOIN tc t USING (node)
        |ORDER BY user_id""".stripMargin)),

    // Incrementally-maintained device-pair graph (Rings.pairDeviceStore):
    // base days + delta days build separate mergeable (pair, device)
    // stores; merged + rolled up they are BIT-IDENTICAL to the full
    // recompute (day buckets are self-contained), so the oracle is the
    // same SQL as q_shared_device_pairs.
    QueryDef("q_ring_pairs_incremental",
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = ev.agg(date_sub(max(to_date(col("ts"))), 7).as("cut"))
        val tagged = ev.crossJoin(broadcast(cut))
        Rings.releaseCache()
        val base = Rings.pairDeviceStore(
          tagged.filter(to_date(col("ts")) <= col("cut")), releaseFirst = false)
        val delta = Rings.pairDeviceStore(
          tagged.filter(to_date(col("ts")) > col("cut")), releaseFirst = false)
        Rings.pairsFromStore(Rings.mergePairStores(base, delta))
      },
      Some("""WITH b AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS device, user_id
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND json_extract_string(props, '$.k') IS NOT NULL
        |), ok AS (
        |  SELECT day, device FROM b GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 50
        |), adm AS (
        |  SELECT b.* FROM b JOIN ok USING (day, device)
        |)
        |SELECT x.user_id AS user_a, y.user_id AS user_b,
        |  CAST(count(*) AS BIGINT) AS shared_device_days,
        |  CAST(count(DISTINCT x.device) AS BIGINT) AS shared_devices,
        |  min(x.day) AS first_day, max(x.day) AS last_day
        |FROM adm x JOIN adm y USING (day, device)
        |WHERE x.user_id < y.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // Ring membership via star-contraction connected components over the
    // device-pair graph (Graph.ringClusters); oracle = recursive CTE.
    QueryDef("q_ring_clusters",
      (s, d) => Graph.ringClusters(Rings.sharedDevicePairs(Tables.events(s, d))),
      Some("WITH RECURSIVE " + DevicePairsCtes.stripPrefix("WITH ") +
        """
        |, edges2 AS (
        |  SELECT user_a AS a, user_b AS b FROM pairs
        |  UNION ALL SELECT user_b, user_a FROM pairs
        |), walk(node, reach) AS (
        |  SELECT a, a FROM edges2
        |  UNION
        |  SELECT w.node, e.b FROM walk w JOIN edges2 e ON w.reach = e.a
        |), lab AS (
        |  SELECT node AS user_id, min(reach) AS ring_id FROM walk GROUP BY 1
        |), sz AS (
        |  SELECT ring_id, CAST(count(*) AS BIGINT) AS ring_size FROM lab GROUP BY 1
        |)
        |SELECT l.user_id, l.ring_id, sz.ring_size,
        |  l.user_id = l.ring_id AS is_canonical
        |FROM lab l JOIN sz USING (ring_id)
        |ORDER BY l.user_id""".stripMargin)),

    // Blocked fuzzy entity resolution (operators/EntityResolution.scala):
    // (nation × segment) blocks behind an occupancy governor, Levenshtein
    // + balance-band verify.
    QueryDef("q_entity_match",
      (s, d) => operators.EntityResolution.matchCustomers(Tables.customer(s, d)),
      Some("""WITH c AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal FROM customer
        |), ok AS (
        |  SELECT c_nationkey, c_mktsegment FROM c
        |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500
        |), adm AS (
        |  SELECT c.* FROM c JOIN ok USING (c_nationkey, c_mktsegment)
        |)
        |SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |  a.c_nationkey, a.c_mktsegment,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist,
        |  abs(a.c_acctbal - b.c_acctbal) AS bal_diff
        |FROM adm a JOIN adm b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |WHERE a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 2
        |  AND abs(a.c_acctbal - b.c_acctbal) <= 100.0
        |ORDER BY cust_a, cust_b""".stripMargin)),

    // DSIR hashed-ngram importance weights (text/Dsir.scala): target =
    // the corpus' en slice, raw = full corpus, 1024 md5 buckets,
    // micro-nat-quantized log-ratio summed as exact BIGINTs.
    QueryDef("q_dsir_weights",
      (s, d) => text.Dsir.importanceWeights(
        Tables.documents(s, d), col("lang") === "en"),
      Some(s"""WITH tok AS (
        |  SELECT doc_id, lang, (lang = 'en') AS is_target,
        |    unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), tok2 AS (
        |  SELECT doc_id, lang, is_target, token,
        |    CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 1024 AS bucket
        |  FROM tok WHERE token <> ''
        |), raw AS (
        |  SELECT bucket, count(*) AS cr FROM tok2 GROUP BY 1
        |), tgt AS (
        |  SELECT bucket, count(*) AS ct FROM tok2 WHERE is_target GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT sum(cr) FROM raw) AS tr, (SELECT sum(ct) FROM tgt) AS tt
        |), w AS (
        |  SELECT r.bucket,
        |    CAST(floor(CAST(CAST(ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / CAST(tt + 1024 AS DOUBLE)) AS FLOAT) AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
        |    - CAST(floor(CAST(CAST(ln(CAST(r.cr + 1 AS DOUBLE) / CAST(tr + 1024 AS DOUBLE)) AS FLOAT) AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS w_micro
        |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot
        |), agg AS (
        |  SELECT doc_id, lang, count(*) AS n_tokens, sum(w_micro) AS sum_w_micro
        |  FROM tok2 JOIN w USING (bucket) GROUP BY 1, 2
        |)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum_w_micro AS BIGINT) AS sum_w_micro,
        |  CAST(sum_w_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) / n_tokens AS dsir_weight
        |FROM agg ORDER BY doc_id""".stripMargin)),

    // Median/MAD robust outliers (operators/Robust.scala) on event values
    // per type — the heavy-tail-safe twin of q_amount_outliers' z-score.
    QueryDef("q_mad_outliers",
      (s, d) => operators.Robust.madOutliers(
          Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
          Seq("event_type"), "value", k = 3.0)
        .select("event_id", "event_type", "value", "med", "mad", "abs_dev")
        .orderBy("event_id"),
      Some("""WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS abs_dev
        |  FROM events e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(abs_dev, 0.5) AS mad FROM dev GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type, d.value, d.med, m.mad, d.abs_dev
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE d.abs_dev > 3.0 * 1.4826 * m.mad
        |ORDER BY d.event_id""".stripMargin)),

    // First-order Markov transition matrix over per-user event sequences
    // (gold/Markov.scala): counts exact, probability one IEEE division,
    // surprisal micro-nat-quantized.
    QueryDef("q_event_transitions",
      (s, d) => Markov.transitions(Tables.events(s, d)),
      Some(EventsUsCte +
        """
        |, seqd AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |  FROM ev
        |), cells AS (
        |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM seqd WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), rt AS (
        |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total
        |  FROM cells
        |)
        |SELECT prev_type, event_type, cnt, row_total,
        |  CAST(cnt AS DOUBLE) / CAST(row_total AS DOUBLE) AS prob,
        |  CAST(floor(CAST(CAST(-ln(CAST(cnt AS DOUBLE) / CAST(row_total AS DOUBLE)) AS FLOAT) AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS surprisal_micro
        |FROM rt ORDER BY prev_type, event_type""".stripMargin)),

    // Seasonal (dow × hour) baseline anomaly screen (gold/Seasonal.scala):
    // hourly decimal totals vs the calendar-grain baseline.
    QueryDef("q_seasonal_anomaly",
      (s, d) => Seasonal.hourlyAnomalies(Tables.events(s, d)),
      Some("""WITH hourly AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hr,
        |    sum(CAST(value AS DECIMAL(18,2))) AS dec_total
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), base AS (
        |  SELECT dayofweek(day) + 1 AS dow, hr, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dec_total) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS baseline
        |  FROM hourly GROUP BY 1, 2
        |)
        |SELECT h.day, h.hr, CAST(b.dow AS BIGINT) AS dow, b.n_days,
        |  CAST(h.dec_total AS DOUBLE) AS actual, b.baseline,
        |  CAST(h.dec_total AS DOUBLE) / b.baseline AS ratio,
        |  (CAST(h.dec_total AS DOUBLE) / b.baseline < 0.5
        |    OR CAST(h.dec_total AS DOUBLE) / b.baseline > 2.0) AS is_anomalous
        |FROM hourly h JOIN base b ON dayofweek(h.day) + 1 = b.dow AND h.hr = b.hr
        |ORDER BY h.day, h.hr""".stripMargin)),

    // Efraimidis–Spirakis deterministic weighted sampling
    // (Sampling.sampleWeighted): top-20 per language, inclusion odds
    // proportional to n_chars, md5-derived uniforms.
    QueryDef("q_sample_weighted",
      (s, d) => operators.Sampling.sampleWeighted(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          col("lang"), col("doc_id"), col("n_chars"), 20)
        .orderBy("lang", "sample_rank"),
      Some("""WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(floor(CAST(CAST(ln((CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(1152921504606846976.0 AS DOUBLE)) AS FLOAT) AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS lnum
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(lnum AS DOUBLE) / CAST(n_chars AS DOUBLE) AS es_key,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(lnum AS DOUBLE) / CAST(n_chars AS DOUBLE) DESC, doc_id ASC) AS BIGINT) AS sample_rank
        |  FROM keyed
        |)
        |SELECT doc_id, lang, n_chars, es_key, sample_rank
        |FROM ranked WHERE sample_rank <= 20
        |ORDER BY lang, sample_rank""".stripMargin)),

    // PMI collocations (text/Colloc.scala): top-50 adjacent-pair
    // collocations by integer-assembled micro-nat PMI.
    QueryDef("q_pmi_collocations",
      (s, d) => text.Colloc.pmiCollocations(Tables.documents(s, d)),
      Some(text.Colloc.oracleSql())),

    // RAKE keyword extraction: stopword-delimited candidate phrases,
    // word score = degree/freq (one IEEE division of exact BIGINTs),
    // phrase score = exact integer micro-score sum.
    QueryDef("q_rake_words",
      (s, d) => text.Keywords.rakeWordScores(Tables.documents(s, d))
        .orderBy("word"),
      Some(text.Keywords.wordOracleSql)),

    QueryDef("q_rake_phrases",
      (s, d) => text.Keywords.rakePhrases(Tables.documents(s, d))
        .orderBy("phrase"),
      Some(text.Keywords.phraseOracleSql)),

    // TextRank: integer-exact PageRank over the content-word adjacency
    // graph — an iterative graph query on text, hash-exact vs the
    // recursive DuckDB oracle (the device-PageRank arithmetic).
    QueryDef("q_textrank",
      (s, d) => text.Keywords.textrank(Tables.documents(s, d))
        .orderBy("token"),
      Some(text.Keywords.textrankOracleSql())),

    // Session path mining (Markov.sessionPaths): top-20 complete
    // event-type journeys per 30-min gap session.
    QueryDef("q_session_paths",
      (s, d) => Markov.sessionPaths(Tables.events(s, d)),
      Some(EventsUsCte +
        """
        |, b AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS is_boundary
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sx AS (
        |  SELECT *, sum(is_boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM b
        |), sp AS (
        |  SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS path_len,
        |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
        |  FROM sx GROUP BY 1, 2
        |)
        |SELECT path, path_len, CAST(count(*) AS BIGINT) AS sessions
        |FROM sp GROUP BY 1, 2
        |ORDER BY sessions DESC, path LIMIT 20""".stripMargin)),

    // Bot-timing screen (Forensics.botTiming): inter-event-gap cv² per
    // user from exact integer second-grain moments.
    QueryDef("q_bot_timing",
      (s, d) => Forensics.botTiming(Tables.events(s, d)),
      Some(EventsUsCte +
        """
        |, g AS (
        |  SELECT user_id,
        |    ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
        |  FROM ev
        |), g2 AS (
        |  SELECT user_id, gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL
        |), agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    sum(CAST(gap_s AS DECIMAL(38,0))) AS sum_g,
        |    sum(CAST(gap_s * gap_s AS DECIMAL(38,0))) AS sum_g2
        |  FROM g2 GROUP BY 1
        |), st AS (
        |  SELECT user_id, n_gaps,
        |    CAST(CAST(sum_g AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
        |    CAST(CAST(sum_g2 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |      - (CAST(CAST(sum_g AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |      * (CAST(CAST(sum_g AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS var_gap
        |  FROM agg
        |), cv AS (
        |  SELECT user_id, n_gaps, mean_gap_s,
        |    CASE WHEN mean_gap_s > 0 THEN var_gap / (mean_gap_s * mean_gap_s) END AS cv2
        |  FROM st
        |)
        |SELECT user_id, n_gaps, mean_gap_s, cv2,
        |  (n_gaps >= 20 AND cv2 IS NOT NULL AND cv2 < 0.1) AS is_bot_timing
        |FROM cv ORDER BY user_id""".stripMargin)),

    // RFM segmentation (gold/Rfm.scala): quintile-threshold scores from
    // one fused percentile aggregate, label when-chain.
    QueryDef("q_rfm_segments",
      (s, d) => gold.Rfm.segments(Tables.orders(s, d)),
      Some(gold.Rfm.oracleSql)),

    // Per-type OLS daily revenue trend (Seasonal.dailyTrend): exact
    // integer-cents moment sums, one-day-ahead forecast.
    QueryDef("q_revenue_trend",
      (s, d) => Seasonal.dailyTrend(Tables.events(s, d)),
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y_cents
        |  FROM events GROUP BY 1, 2
        |), dx AS (
        |  SELECT event_type, y_cents,
        |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x
        |  FROM daily
        |), agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    max(x) AS max_x, CAST(sum(x) AS BIGINT) AS sum_x,
        |    CAST(sum(x * x) AS BIGINT) AS sum_x2,
        |    sum(CAST(y_cents AS DECIMAL(38,0))) AS sum_y_dec,
        |    sum(CAST(x * y_cents AS DECIMAL(38,0))) AS sum_xy_dec
        |  FROM dx GROUP BY 1
        |), st AS (
        |  SELECT event_type, n_days, max_x, sum_x, sum_x2,
        |    CAST(CAST(sum_y_dec AS VARCHAR) AS DOUBLE) AS sum_y,
        |    CAST(CAST(sum_xy_dec AS VARCHAR) AS DOUBLE) AS sum_xy
        |  FROM agg
        |), sl AS (
        |  SELECT *,
        |    (n_days * sum_xy - sum_x * sum_y)
        |      / CAST(n_days * sum_x2 - sum_x * sum_x AS DOUBLE) AS slope_cents
        |  FROM st
        |)
        |SELECT event_type, n_days, slope_cents,
        |  (sum_y - slope_cents * sum_x) / CAST(n_days AS DOUBLE) AS intercept_cents,
        |  ((sum_y - slope_cents * sum_x) / CAST(n_days AS DOUBLE)
        |    + slope_cents * CAST(max_x + 1 AS DOUBLE)) / 100.0 AS forecast_next
        |FROM sl ORDER BY event_type""".stripMargin))
  )

  // r8 late batch: supervised categorical encoders (WOE/IV, K-fold OOF
  // target encoding) and hybrid lexical+semantic retrieval fusion.
  private lazy val batch6: Seq[QueryDef] = Seq(

    // Weight-of-Evidence / Information-Value profile of the fraud label
    // across the categorical features — the classic credit-risk encoder.
    QueryDef("q_woe_encoding",
      (s, d) => {
        val enr = Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
        val base = enr
          .withColumn("user_avg_amount",
            operators.Features.winAvg(col("o_totalprice"), w))
          .withColumn("amount_vs_user_avg",
            col("o_totalprice") / col("user_avg_amount"))
          .withColumn("label", FraudScore.fraudLabel(col("amount_vs_user_avg"),
            col("region_risk"), col("amount_tier")).cast("long"))
        ml.Encodings.woe(base, "label", Seq(
            "amount_tier" -> col("amount_tier"),
            "order_dow" -> dayofweek(col("order_date")).cast("long"),
            "order_month" -> month(col("order_date")).cast("long"),
            "is_weekend" -> dayofweek(col("order_date")).isin(1, 7).cast("long")))
          .orderBy("feature", "category")
      },
      Some(EnrichedFeaturesCte +
        """
        |, base AS (
        |  SELECT amount_tier, order_dow, order_month, is_weekend,
        |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
        |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
        |  FROM fx
        |), stacked AS (
        |  SELECT 'amount_tier' AS feature, amount_tier AS category, label FROM base
        |  UNION ALL SELECT 'order_dow', CAST(order_dow AS VARCHAR), label FROM base
        |  UNION ALL SELECT 'order_month', CAST(order_month AS VARCHAR), label FROM base
        |  UNION ALL SELECT 'is_weekend', CAST(is_weekend AS VARCHAR), label FROM base
        |), bc AS (
        |  SELECT feature, category, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_bad
        |  FROM stacked GROUP BY 1, 2
        |), bc2 AS (
        |  SELECT *, CAST(n - n_bad AS BIGINT) AS n_good FROM bc
        |), pf AS (
        |  SELECT feature, CAST(sum(n_bad) AS BIGINT) AS bad_tot,
        |    CAST(sum(n_good) AS BIGINT) AS good_tot
        |  FROM bc2 GROUP BY 1
        |), sh AS (
        |  SELECT bc2.feature, bc2.category, bc2.n, bc2.n_bad, bc2.n_good,
        |    (CAST(bc2.n_bad AS DOUBLE) + 0.5) / CAST(pf.bad_tot AS DOUBLE) AS bad_share,
        |    (CAST(bc2.n_good AS DOUBLE) + 0.5) / CAST(pf.good_tot AS DOUBLE) AS good_share
        |  FROM bc2 JOIN pf USING (feature)
        |), wx AS (
        |  SELECT *, CAST(CAST(ln(bad_share / good_share) AS FLOAT) AS DOUBLE) AS woe FROM sh
        |)
        |SELECT feature, category, n, n_bad, n_good, woe,
        |  (bad_share - good_share) * woe AS iv_contrib
        |FROM wx ORDER BY feature, category""".stripMargin)),

    // Leakage-free K-fold out-of-fold target encoding of amount_tier:
    // the (category, fold) lookup table a scorer broadcast-joins at apply
    // time; each fold's encoding uses only the other folds' labels.
    QueryDef("q_target_encode",
      (s, d) => {
        val enr = Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
        val base = enr
          .withColumn("user_avg_amount",
            operators.Features.winAvg(col("o_totalprice"), w))
          .withColumn("amount_vs_user_avg",
            col("o_totalprice") / col("user_avg_amount"))
          .withColumn("label", FraudScore.fraudLabel(col("amount_vs_user_avg"),
            col("region_risk"), col("amount_tier")).cast("long"))
        ml.Encodings.targetEncodeOof(base, col("amount_tier"), "label",
            col("o_orderkey") % 5, m = 10.0)
          .orderBy("category", "fold")
      },
      Some(EnrichedFeaturesCte +
        """
        |, base AS (
        |  SELECT amount_tier AS category, o_orderkey % 5 AS fold,
        |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
        |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
        |  FROM fx
        |), g AS (
        |  SELECT category, CAST(fold AS BIGINT) AS fold,
        |    CAST(count(*) AS BIGINT) AS n_in_fold, CAST(sum(label) AS BIGINT) AS sum_in_fold
        |  FROM base GROUP BY 1, 2
        |), ct AS (
        |  SELECT category, CAST(sum(n_in_fold) AS BIGINT) AS n_cat,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_cat FROM g GROUP BY 1
        |), ft AS (
        |  SELECT fold, CAST(sum(n_in_fold) AS BIGINT) AS n_fold,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_fold FROM g GROUP BY 1
        |), gt AS (
        |  SELECT CAST(sum(n_in_fold) AS BIGINT) AS n_all,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_all FROM g
        |), pri AS (
        |  SELECT g.category, g.fold, g.n_in_fold,
        |    CAST(ct.n_cat - g.n_in_fold AS BIGINT) AS n_oof,
        |    CAST(ct.sum_cat - g.sum_in_fold AS BIGINT) AS sum_oof,
        |    CAST(gt.sum_all - ft.sum_fold AS DOUBLE)
        |      / CAST(gt.n_all - ft.n_fold AS DOUBLE) AS prior_oof
        |  FROM g JOIN ct USING (category) JOIN ft USING (fold) CROSS JOIN gt
        |)
        |SELECT category, fold, n_in_fold, n_oof, sum_oof, prior_oof,
        |  (CAST(sum_oof AS DOUBLE) + 10.0 * prior_oof)
        |    / (CAST(n_oof AS DOUBLE) + 10.0) AS encoding
        |FROM pri ORDER BY category, fold""".stripMargin)),

    // Hybrid retrieval: BM25 top-50 fused with cosine-ANN top-50 (query =
    // vec 0's embedding) by Reciprocal Rank Fusion, final top-20.
    QueryDef("q_hybrid_rrf",
      (s, d) => text.Hybrid.rrf(Tables.documents(s, d), Tables.embeddings(s, d),
          Bm25QueryTerms, queryVecId = 0L, kPerSide = 50, k = 20)
        .orderBy("rrf_rank"),
      Some(text.Bm25.oracleCtes(Bm25QueryTerms) +
        s"""
        |, lex AS (
        |  SELECT doc_id, bm25_rank FROM bm WHERE bm25_rank <= 50
        |), qv AS (
        |  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
        |), semscored AS (
        |  SELECT e.vec_id, ${cosSql("q.qvec", "e.embedding")} AS cos_sim
        |  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0
        |), sem AS (
        |  SELECT vec_id, cos_sim, sem_rank FROM (
        |    SELECT vec_id, cos_sim,
        |      row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS sem_rank
        |    FROM semscored) t WHERE sem_rank <= 50
        |), fused AS (
        |  SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id, l.bm25_rank, s.sem_rank, s.cos_sim,
        |    COALESCE(1.0 / (60.0 + CAST(l.bm25_rank AS DOUBLE)), 0.0)
        |      + COALESCE(1.0 / (60.0 + CAST(s.sem_rank AS DOUBLE)), 0.0) AS rrf_score
        |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
        |)
        |SELECT rrf_rank, doc_id, rrf_score, bm25_rank, sem_rank, cos_sim FROM (
        |  SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rrf_rank, *
        |  FROM fused) t WHERE rrf_rank <= 20 ORDER BY rrf_rank""".stripMargin)),

    // Hard-negative mining for contrastive retrieval training: per query,
    // the top-k most-similar vectors EXCLUDING near-duplicates (cos >=
    // 0.95), i.e. the highest-scoring wrong answers.
    QueryDef("q_hard_negatives",
      (s, d) => Similarity.hardNegatives(Tables.embeddings(s, d))
        .orderBy("query_id", "neg_rank"),
      Some(s"""WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id, e.label,
        |    ${cosSql("q.qv", "e.embedding")} AS cos_sim
        |  FROM embeddings e JOIN q ON e.vec_id != q.query_id
        |), fl AS (
        |  SELECT * FROM scored WHERE cos_sim < 0.95
        |), ranked AS (
        |  SELECT query_id, vec_id, label, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS neg_rank
        |  FROM fl
        |)
        |SELECT query_id, neg_rank, vec_id, label, cos_sim FROM ranked
        |WHERE neg_rank <= 10 ORDER BY query_id, neg_rank""".stripMargin)),

    // Leakage-free train/val/test split: the split key is the document's
    // DEDUP CLUSTER id, not the document id — every near-duplicate group
    // lands in one split, so eval can never contain a near-copy of a
    // training doc (the split-side complement of decontamination).
    // Quantifies the train->eval leakage a NAIVE per-doc hash split
    // incurs: every LSH near-dup candidate pair labeled with endpoint
    // splits + a crossing flag. The cluster-keyed split below is the fix
    // (its pairs can never cross: candidate pairs are intra-cluster).
    QueryDef("q_split_leakage_audit",
      (s, d) => MinHash.splitLeakageAudit(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(MinHash.splitLeakageOracleSql())),

    QueryDef("q_split_leakage_free",
      (s, d) => operators.Sampling.hashSplit(
          Components.dedupClusters(Tables.documents(s, d))
            .select(col("doc_id"), col("cluster_id")),
          col("cluster_id"), trainBp = 8000, valBp = 1000)
        .orderBy("doc_id"),
      Some(DedupClusterCtes +
        """
        |SELECT doc_id, cluster_id,
        |  CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS split_bp,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM lab ORDER BY doc_id""".stripMargin)),

    // Deterministic per-epoch corpus shuffle: reproducible independent
    // permutations per training epoch, global position via the grouped
    // prefix-sum primitive.
    QueryDef("q_epoch_shuffle",
      (s, d) => operators.Sampling.epochShuffle(
          Tables.documents(s, d).select("doc_id"), col("doc_id"), epochs = 2)
        .select("epoch", "position", "doc_id")
        .orderBy("epoch", "position"),
      Some("""WITH e AS (
        |  SELECT doc_id, unnest([0, 1]) AS epoch FROM documents
        |), k AS (
        |  SELECT doc_id, epoch,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS sk
        |  FROM e
        |)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY sk, doc_id) AS BIGINT) AS position,
        |  doc_id
        |FROM k ORDER BY epoch, position""".stripMargin)),

    // Corpus accounting: the data-governance table per (lang, source) —
    // docs/tokens/chars, corpus-wide exact-dup share (hash-grain join,
    // never a text broadcast), and quality-bucket counts. All exact-int
    // aggregates; shares are int/int ratios formed once.
    // Duplicate-token inflation per source: tokens counted once per
    // distinct content hash vs total tokens — "how much of this crawl is
    // redundant bytes", the number that prices a dedup pass before
    // running it (within-source grain: a text shared across sources
    // counts once per source). Token def = ws_tokens (q_token_count).
    QueryDef("q_dedup_inflation",
      (s, d) => {
        val perHash = Tables.documents(s, d)
          .select(col("source"), md5(col("text")).as("h"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("copies"),
            sum(col("n_tokens")).as("tok_all"),
            min(col("n_tokens")).as("tok_once"))
        perHash.groupBy(col("source"))
          .agg(count(lit(1)).as("distinct_docs"),
            sum(col("copies")).as("total_docs"),
            sum(col("tok_all")).as("tokens_total"),
            sum(col("tok_once")).as("tokens_unique"))
          .withColumn("inflation",
            col("tokens_total").cast("double") / col("tokens_unique").cast("double"))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), ph AS (
        |  SELECT source, h, CAST(count(*) AS BIGINT) AS copies,
        |    CAST(sum(n_tokens) AS BIGINT) AS tok_all,
        |    CAST(min(n_tokens) AS BIGINT) AS tok_once
        |  FROM d GROUP BY 1, 2
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS distinct_docs,
        |  CAST(sum(copies) AS BIGINT) AS total_docs,
        |  CAST(sum(tok_all) AS BIGINT) AS tokens_total,
        |  CAST(sum(tok_once) AS BIGINT) AS tokens_unique,
        |  CAST(sum(tok_all) AS DOUBLE) / CAST(sum(tok_once) AS DOUBLE) AS inflation
        |FROM ph GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("q_corpus_accounting",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val quality = TextAnalysis.qualityScore(docs)
          .select("doc_id", "n_tokens", "quality_bucket")
        val hashed = docs.select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(col("text")).as("h"))
        val dupCounts = hashed.groupBy("h").agg(count(lit(1)).as("c"))
        hashed.join(dupCounts, "h")
          .withColumn("is_dup", col("c") > 1)
          .join(quality, "doc_id")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            sum(col("is_dup").cast("long")).as("dup_docs"),
            sum((col("quality_bucket") === "high").cast("long")).as("high_q_docs"),
            sum((col("quality_bucket") === "medium").cast("long")).as("med_q_docs"),
            sum((col("quality_bucket") === "low").cast("long")).as("low_q_docs"))
          .withColumn("dup_share", col("dup_docs").cast("double") / col("n_docs"))
          .withColumn("avg_tokens", col("n_tokens").cast("double") / col("n_docs"))
          .orderBy("lang", "source")
      },
      Some(QualityCtes +
        """
        |, d AS (
        |  SELECT doc_id, lang, source, n_chars, md5(text) AS h FROM documents
        |), hc AS (
        |  SELECT h, count(*) AS c FROM d GROUP BY 1
        |), f AS (
        |  SELECT d.doc_id, d.lang, d.source, d.n_chars, hc.c > 1 AS is_dup
        |  FROM d JOIN hc USING (h)
        |), j AS (
        |  SELECT f.lang, f.source, f.n_chars, f.is_dup, t3.n_tokens,
        |    CASE WHEN t3.quality_score >= 0.7 THEN 'high'
        |         WHEN t3.quality_score >= 0.4 THEN 'medium' ELSE 'low' END AS qb
        |  FROM f JOIN t3 ON f.doc_id = t3.doc_id
        |)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |  CAST(sum(CASE WHEN qb = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS high_q_docs,
        |  CAST(sum(CASE WHEN qb = 'medium' THEN 1 ELSE 0 END) AS BIGINT) AS med_q_docs,
        |  CAST(sum(CASE WHEN qb = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS low_q_docs,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_share,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Token-budget sampling: per-language corpus cut denominated in TOKENS
    // ("20k tokens of en"), walked in deterministic hash order via the
    // distributed grouped prefix sum (no per-language single-partition
    // window).
    QueryDef("q_sample_token_budget",
      (s, d) => operators.Sampling.sampleTokenBudget(
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          col("lang"), col("doc_id"), col("n_tokens"),
          Map("en" -> 6000L, "zh" -> 2000L), defaultBudget = 1500L)
        .select("doc_id", "lang", "n_tokens", "tokens_before")
        .orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS hbp
        |  FROM documents
        |), ps AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY hbp, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tokens, tokens_before FROM ps
        |WHERE tokens_before < CASE lang WHEN 'en' THEN 6000 WHEN 'zh' THEN 2000 ELSE 1500 END
        |ORDER BY doc_id""".stripMargin)),

    // Tokenizer-artifact persistence: train BPE merges once, publish
    // through the versioned registry, reload, and prove the reloaded
    // table tokenizes every document identically to the live one
    // (rows-only: the merge table is a learned artifact; CurationSpec
    // asserts table round-trip equality and all-docs token parity).
    QueryDef("q_bpe_reload",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val root = java.nio.file.Files.createTempDirectory("graft-bpe-registry").toString
        val merges = text.Bpe.trainMerges(docs, numMerges = 64)
        val version = text.Bpe.saveMerges(s, merges, root)
        val live = text.Bpe.encode(docs, merges)
          .select(col("doc_id"), col("tokens").as("tokens_live"))
        val re = text.Bpe.encode(docs, text.Bpe.loadMerges(s, root))
          .select(col("doc_id"), col("tokens").as("tokens_reloaded"))
        live.join(re, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            lit(merges.length.toLong).as("n_merges"),
            lit(version).as("merges_version"),
            size(col("tokens_live")).cast("long").as("n_tokens_live"),
            size(col("tokens_reloaded")).cast("long").as("n_tokens_reloaded"),
            (col("tokens_live") <=> col("tokens_reloaded")).as("tokens_equal"))
          .orderBy("doc_id")
      },
      None),

    // Robust-scaler preprocessing statistics: per-feature exact quartiles
    // (rank-interpolated, non-buffering) + decimal-exact mean/std + IQR —
    // the broadcast lookup for median/IQR feature scaling.
    QueryDef("q_robust_scaler",
      (s, d) => operators.Profiling.robustScaler(
          Cleaning.cleanLineitem(Tables.lineitem(s, d)),
          Seq("l_quantity" -> col("l_quantity"),
            "l_extendedprice" -> col("l_extendedprice"),
            "l_discount" -> col("l_discount")))
        .orderBy("feature"),
      Some(CleanLineitemCte +
        """
        |, stacked AS (
        |  SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS v FROM clean_lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM clean_lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM clean_lineitem
        |), agg AS (
        |  SELECT feature, CAST(count(*) AS BIGINT) AS n,
        |    min(v) AS min_v, max(v) AS max_v,
        |    CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s,
        |    CAST(CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s2,
        |    quantile_cont(v, 0.25) AS p25,
        |    quantile_cont(v, 0.5) AS median,
        |    quantile_cont(v, 0.75) AS p75
        |  FROM stacked WHERE v IS NOT NULL GROUP BY 1
        |)
        |SELECT feature, n, min_v, max_v,
        |  s / n AS mean,
        |  sqrt(s2 / n - (s / n) * (s / n)) AS std,
        |  p25, median, p75, p75 - p25 AS iqr
        |FROM agg ORDER BY feature""".stripMargin)),

    // Stored mergeable quantile sketches: per-day bottom-k-by-hash samples
    // of order amounts, merged to month grain WITHOUT re-scanning raw rows
    // (rows-only: xxhash64 priorities are engine-local; SketchesSpec binds
    // exact merge associativity and the estimate error vs exact).
    QueryDef("q_quantile_sketch",
      (s, d) => {
        val co = Cleaning.cleanOrders(Tables.orders(s, d))
          .withColumn("order_month", date_trunc("month", col("order_date")).cast("date"))
        val daily = gold.QuantileSketch.sketch(co,
          Seq("order_month", "order_date"), col("o_totalprice"), col("o_orderkey"))
        val monthly = gold.QuantileSketch.merge(daily, Seq("order_month"))
        gold.QuantileSketch.estimate(monthly,
            Seq("est_p50" -> 0.5, "est_p90" -> 0.9, "est_p99" -> 0.99))
          .select("order_month", "n_rows", "sample_size",
            "est_p50", "est_p90", "est_p99")
          .orderBy("order_month")
      },
      None),

    // Incremental SCD2 maintenance: history built from pre-cutoff days,
    // then the post-cutoff days applied via Scd.scd2Apply at stored-version
    // grain — and the DuckDB oracle is the BATCH scd2 over all days, so the
    // hash gate itself proves incremental ≡ from-scratch.
    QueryDef("q_scd2_incremental",
      (s, d) => {
        val cutoff = lit("1997-06-01").cast("date")
        val daily = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
          .groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        val existing = operators.Scd.scd2(daily.filter(col("order_date") < cutoff),
          "o_custkey", "order_date", Seq("amount_tier"))
        operators.Scd.scd2Apply(existing, daily.filter(col("order_date") >= cutoff),
            "o_custkey", "order_date", Seq("amount_tier"))
          .select("o_custkey", "version", "amount_tier", "valid_from",
            "last_observed", "observation_count", "valid_to", "is_current")
          .orderBy("o_custkey", "version")
      },
      Some(Scd2VersionCtes +
        """
        |SELECT o_custkey, version, amount_tier, valid_from, last_observed, observation_count,
        |  COALESCE(lead(valid_from) OVER wv, DATE '9999-12-31') AS valid_to,
        |  lead(valid_from) OVER wv IS NULL AS is_current
        |FROM coll WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        |ORDER BY o_custkey, version""".stripMargin))
  )

  private lazy val batch7: Seq[QueryDef] = Seq(

    // Jaro–Winkler ER: same BLOCK→GOVERN→VERIFY pipeline as
    // q_entity_match, scored by the native codegen'd jaro_winkler
    // expression (functions/JaroWinkler.scala). Semantics pinned to
    // DuckDB's jaro_winkler_similarity; float32 collapse on both sides
    // makes the score and the threshold filter hash-exact.
    QueryDef("q_er_jarowinkler",
      (s, d) => operators.EntityResolution.matchCustomersJw(Tables.customer(s, d)),
      Some("""WITH c AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |), ok AS (
        |  SELECT c_nationkey, c_mktsegment FROM c
        |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500
        |), adm AS (
        |  SELECT c.* FROM c JOIN ok USING (c_nationkey, c_mktsegment)
        |)
        |SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |  a.c_nationkey, a.c_mktsegment,
        |  CAST(CAST(jaro_winkler_similarity(a.c_name, b.c_name) AS FLOAT) AS DOUBLE) AS jw_sim
        |FROM adm a JOIN adm b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |WHERE a.c_custkey < b.c_custkey
        |  AND CAST(CAST(jaro_winkler_similarity(a.c_name, b.c_name) AS FLOAT) AS DOUBLE) >= 0.97
        |ORDER BY cust_a, cust_b""".stripMargin)),

    // k-anonymity audit over the (nation, segment, balance-band) QI
    // (gold/Privacy.scala): one partial-agged exchange at QI grain.
    QueryDef("q_k_anonymity",
      (s, d) => gold.Privacy.kAnonymity(Tables.customer(s, d)),
      Some(s"""SELECT c_nationkey, c_mktsegment,
        |  ${gold.Privacy.AcctbalBandSql} AS acctbal_band,
        |  count(*) AS group_size, count(*) >= 10 AS meets_k
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // l-diversity of order priority within each (nation, segment) QI
    // group: distinct sensitive values + modal share, computed on
    // (QI, sensitive)-grain cells so the exchange never carries rows.
    QueryDef("q_l_diversity",
      (s, d) => gold.Privacy.lDiversity(Tables.orders(s, d), Tables.customer(s, d)),
      Some("""WITH cell AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3
        |)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(sum(n) AS BIGINT) AS group_size,
        |  count(*) AS distinct_sensitive,
        |  CAST(max(n) AS BIGINT) AS modal_count,
        |  CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS modal_share,
        |  count(*) >= 3 AS meets_l
        |FROM cell GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Suppression-to-k release: QI combos below k collapse into the
    // residual '*' group; audit reports sizes + merged-combo counts.
    QueryDef("q_suppress_k",
      (s, d) => gold.Privacy.suppressToK(Tables.customer(s, d)),
      Some(s"""WITH sized AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation_qi, c_mktsegment AS segment_qi,
        |    ${gold.Privacy.AcctbalBandSql} AS band_qi, count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3
        |), sup AS (
        |  SELECT CASE WHEN n < 10 THEN '*' ELSE nation_qi END AS nation_qi,
        |    CASE WHEN n < 10 THEN '*' ELSE segment_qi END AS segment_qi,
        |    CASE WHEN n < 10 THEN '*' ELSE band_qi END AS band_qi,
        |    n < 10 AS suppressed, n
        |  FROM sized
        |)
        |SELECT nation_qi, segment_qi, band_qi, suppressed,
        |  CAST(sum(n) AS BIGINT) AS group_size, count(*) AS merged_combos
        |FROM sup GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3""".stripMargin)),

    // ε-DP per-nation revenue release with deterministic hash-derived
    // Laplace noise (gold/Privacy.scala laplaceNoise: every step before
    // the single float32-collapsed ln is integer/dyadic-exact, so both
    // engines produce bit-identical noise).
    QueryDef("q_dp_release",
      (s, d) => gold.Privacy.dpRevenueByNation(Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d)),
      Some({
        val bRev = 600000.0 / 1.0
        val noiseRev = gold.Privacy.laplaceNoiseSql("concat(n_name, '|rev')", bRev)
        val noiseCnt = gold.Privacy.laplaceNoiseSql("concat(n_name, '|cnt')", 1.0)
        s"""WITH base AS (
        |  SELECT n_name,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS true_revenue,
        |    count(*) AS true_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1
        |)
        |SELECT n_name, true_revenue, true_orders,
        |  true_revenue + $noiseRev AS noised_revenue,
        |  true_orders + $noiseCnt AS noised_orders
        |FROM base ORDER BY n_name""".stripMargin
      })),

    // Targeted salted skew join (operators/SkewJoin.scala): hot keys
    // split across S reducer slots, cold keys untouched; output is
    // bit-identical to the plain join (salting is pure partitioning).
    QueryDef("q_skew_join",
      (s, d) => operators.SkewJoin.revenueByPriority(
        Tables.lineitem(s, d), Tables.orders(s, d)),
      Some("""SELECT o_orderpriority, count(*) AS line_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Delta-join incremental MV maintenance (gold/DeltaView.scala):
    // merge(MV(A⋈B), agg(ΔA⋈B)) with decimal partial states; the
    // oracle is the full recompute — the identity is hash-checked.
    QueryDef("q_delta_join_mv",
      (s, d) => gold.DeltaView.monthlyRevenueIncremental(
        Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  // ---- round-10 additions: MV-rewrite gate, line dedup, image phash ----

  private lazy val batch8: Seq[QueryDef] = Seq(

    // Transparent MV rewrite, driver-gated end-to-end: the query body
    // materializes + registers an orders MV, runs a coarser-grain
    // aggregate AGAINST THE BASE TABLE, and requires (hard `require`, so
    // a silent fallback fails the row rather than trivially passing) that
    // the optimizer served it from the MV scan. The oracle computes the
    // same aggregate over the base parquet — hash equality proves the
    // rewrite is invisible. Aggregates are exact-only (counts, a BIGINT
    // sum, min/max): §4 forbids reassociating double sums across engines.
    QueryDef("q_mv_rewrite",
      (s, d) => {
        import graft.plans.MvRewrite
        val base = s"$d/orders.parquet"
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-mv-gate").toString
        val states = MvRewrite.materialize(
          s.read.parquet(base),
          keys = Seq("o_orderstatus", "o_orderpriority"),
          specs = Seq(("sum", "o_custkey"), ("count", "o_totalprice"),
            ("min", "o_totalprice"), ("max", "o_totalprice")),
          mvPath = s"$tmp/orders_mv")
        MvRewrite.register(s, base, s"$tmp/orders_mv",
          Seq("o_orderstatus", "o_orderpriority"), states)
        try {
          val agg = s.read.parquet(base)
            .groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n_orders"),
              count(col("o_totalprice")).as("n_priced"),
              sum("o_custkey").as("custkey_checksum"),
              min("o_totalprice").as("min_price"),
              max("o_totalprice").as("max_price"),
              // DISTINCT over an MV KEY: the MV has exactly one row per
              // present key combo, so the distinct set is identical
              countDistinct(col("o_orderpriority")).as("n_priorities"))
          // honesty gate: the optimized plan must scan the MV, not the base
          val scans = agg.queryExecution.optimizedPlan.collect {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toString)
                case _ => Nil
              }
          }.flatten
          require(scans.exists(_.contains("orders_mv")),
            s"MV rewrite did not fire: scans=$scans")
          require(!scans.exists(_.contains("orders.parquet")),
            s"base table still scanned: $scans")
          // execute while registered, then serve the materialized result
          agg.write.mode("overwrite").parquet(s"$tmp/result")
        } finally MvRewrite.unregister(base)
        s.read.parquet(s"$tmp/result").orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
        |  count(o_totalprice) AS n_priced,
        |  CAST(sum(o_custkey) AS BIGINT) AS custkey_checksum,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Corpus-wide duplicated-LINE removal (CCNet line dedup): the
    // synthetic corpus is single-line, so the query reflows each doc into
    // 3-token lines first (both engines reproduce the reflow exactly),
    // then drops every copy of any line appearing >= 2 times corpus-wide
    // and reassembles survivors in order. text/LineDedup.scala.
    QueryDef("q_line_dedup",
      (s, d) => graft.text.LineDedup.dedupReflowed(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(graft.text.LineDedup.oracleSql())),

    // Incremental line-count store (continuous-crawl ingestion): counts
    // are additive, so the store built from the old corpus + the delta's
    // appended counts merges to EXACTLY the from-scratch counts — cleaning
    // the full corpus through the store is bit-identical to q_line_dedup,
    // which is exactly what the shared oracle checks.
    QueryDef("q_line_dedup_incremental",
      (s, d) => {
        import graft.text.LineDedup
        val store = java.nio.file.Files
          .createTempDirectory("graft-line-store").toString + "/lines"
        val docs = Tables.documents(s, d)
        val reflowed = docs.select(col("doc_id"),
          LineDedup.reflow(docs).as("text"))
        LineDedup.buildLineStore(reflowed.filter(col("doc_id") % 10 =!= 7), store)
        LineDedup.appendLineStore(reflowed.filter(col("doc_id") % 10 === 7), store)
        LineDedup.dedupLinesWithStore(reflowed, store).orderBy("doc_id")
      },
      Some(graft.text.LineDedup.oracleSql())),

    // Perceptual image hash (stub plan twin): documents as 1xN "images",
    // 33-point nearest-neighbor intensity resample, 32-bit aHash + dHash.
    // The REAL-pixel 64-bit aHash/dHash over decoded PPM/BMP payloads is
    // the typed path (multimodal/ImageHash.scala), parity + planted
    // near-dup bound in MultimodalSpec.
    QueryDef("q_image_phash",
      (s, d) => graft.multimodal.ImageHash.phashPlan(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(graft.multimodal.ImageHash.phashOracleSql)),

    // Image near-duplicate pairs: 4 byte-bands of the stub dHash
    // (pigeonhole-complete at radius 3), occupancy governor 2..64, exact
    // Hamming verify. The image twin of q_neardup_pairs.
    QueryDef("q_image_neardup",
      (s, d) => graft.multimodal.ImageHash.nearDupPlan(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(graft.multimodal.ImageHash.nearDupOracleSql())),

    // Image near-dup CLUSTERS: star-contraction connected components over
    // the Hamming pair graph — the image twin of q_dedup_clusters,
    // closing the hash -> pairs -> clusters image pipeline. Hash-exact vs
    // the recursive-CTE reachability oracle.
    QueryDef("q_image_clusters",
      (s, d) => graft.multimodal.ImageHash.imageClusters(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(graft.multimodal.ImageHash.imageClustersOracleSql())),

    // Corpus cluster map / topic-mixture audit: seeded coarse KMeans
    // (bounded-sample fit shared with q_knn_ivf via the cacheKey memo),
    // one map-only assignment pass, cell-grain profile of <= nlist rows.
    // Rows-only: learned centroids are engine-local (same class as the
    // ANN pack); ClusteringSpec binds assignment-is-argmin and
    // partition-of-the-corpus.
    QueryDef("q_kmeans_clusters",
      (s, d) => graft.sim.Clustering.profile(
        Tables.embeddings(s, d), nlist = 16, cacheKey = Some(d)),
      None),

    // Embedding-distribution drift: PSI/chi2/binned-KS over kmeans-cell
    // occupancy, reference slice = even vec_ids (the demo split; real use
    // compares crawl generations). Rows-only (learned cells);
    // ClusteringSpec proves a uniform split shows no drift while a
    // label-conditioned split trips the PSI rule of thumb.
    QueryDef("q_embed_drift",
      (s, d) => graft.sim.Clustering.embedDrift(
        Tables.embeddings(s, d), nlist = 16,
        inA = col("vec_id") % 2 === 0, cacheKey = Some(d)),
      None),

    // Cluster-balanced diversity sample: each cell contributes its
    // min(quota, |cell|) smallest-seeded-hash rows — uniform within the
    // cell, capped per cell, so tail topics survive a head-heavy corpus.
    // Rows-only (learned cells); ClusteringSpec binds quota exactness and
    // rerun/repartition determinism.
    QueryDef("q_sample_balanced",
      (s, d) => graft.sim.Clustering.balancedSample(
          Tables.embeddings(s, d), nlist = 16, quota = 25, cacheKey = Some(d))
        .orderBy("cell", "samp_rank"),
      None)
  )

  // Quality-score CTE chain ending in `t3` (per-doc tokens/ratios/score),
  // shared by q_text_quality and the corpus-accounting oracle.
  // (lazy: declared after the registry that references it)
  private lazy val QualityCtes: String = {
    val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stopword_hits
       |  FROM documents
       |), t2 AS (
       |  SELECT *,
       |    CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_ratio,
       |    CAST(stopword_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       |    CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN CAST(1.0 AS DOUBLE)
       |         WHEN n_tokens < 20 THEN CAST(n_tokens AS DOUBLE) / CAST(20.0 AS DOUBLE)
       |         ELSE CAST(200.0 AS DOUBLE) / n_tokens END AS len_score
       |  FROM t
       |), t3 AS (
       |  SELECT *,
       |    len_score * CAST(0.4 AS DOUBLE) + (CAST(1.0 AS DOUBLE) - dup_ratio) * CAST(0.4 AS DOUBLE)
       |      + stopword_ratio * CAST(0.2 AS DOUBLE) AS quality_score
       |  FROM t2
       |)""".stripMargin
  }

  // SCD2 tier-version CTE chain (mirrors the q_scd2_tiers Spark side up to
  // the collapsed `coll` version rows), shared by q_scd2_tiers and the
  // point-in-time join oracle (q_pit_join).
  // (lazy: declared after the registry that references it)
  private lazy val Scd2VersionCtes = CleanOrdersCte +
    """
    |, daily AS (
    |  SELECT o_custkey, order_date, amount_tier FROM (
    |    SELECT o_custkey, order_date, amount_tier,
    |      row_number() OVER (PARTITION BY o_custkey, order_date ORDER BY o_orderkey DESC) AS rn
    |    FROM clean_orders) t WHERE rn = 1
    |), flg AS (
    |  SELECT o_custkey, order_date, amount_tier,
    |    CASE WHEN lag(order_date) OVER w IS NULL
    |           OR lag(amount_tier) OVER w IS DISTINCT FROM amount_tier
    |         THEN 1 ELSE 0 END AS chg
    |  FROM daily WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date)
    |), ver AS (
    |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey ORDER BY order_date
    |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
    |  FROM flg
    |), coll AS (
    |  SELECT o_custkey, version, amount_tier,
    |    min(order_date) AS valid_from, max(order_date) AS last_observed,
    |    count(*) AS observation_count
    |  FROM ver GROUP BY 1, 2, 3
    |)""".stripMargin

  // Shared CTE chain for the device-ring graph queries: admitted
  // (day, device) buckets → undirected user pairs → symmetric edge list →
  // degrees. Mirrors Rings.sharedDevicePairs verbatim (incl. the 2..50
  // occupancy governor).
  // (lazy: declared after the registry that references it)
  private lazy val DevicePairsCtes =
    """WITH b AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS device, user_id
      |  FROM events
      |  WHERE event_type = 'purchase'
      |    AND json_extract_string(props, '$.k') IS NOT NULL
      |), ok AS (
      |  SELECT day, device FROM b GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 50
      |), adm AS (
      |  SELECT b.* FROM b JOIN ok USING (day, device)
      |), pairs AS (
      |  SELECT x.user_id AS user_a, y.user_id AS user_b
      |  FROM adm x JOIN adm y USING (day, device)
      |  WHERE x.user_id < y.user_id GROUP BY 1, 2
      |), edges AS (
      |  SELECT user_a AS src, user_b AS dst FROM pairs
      |  UNION ALL SELECT user_b, user_a FROM pairs
      |), deg AS (
      |  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY 1
      |)""".stripMargin

  // Unrolled integer-exact PageRank: same fixed-point contract as
  // Graph.pageRank (1e12 mass units, pr div degree, 85/100 damping,
  // 15/100 teleport), one CTE per iteration.
  private def pageRankOracle: String = {
    val iters = (1 to Graph.Iterations).map { i =>
      s""", p$i AS (
         |  SELECT n.node, n.degree, n.tele,
         |    CAST(n.tele + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.pr // p.degree) AS m
         |    FROM p${i - 1} p JOIN edges e ON p.node = e.src GROUP BY 1
         |  ) s USING (node))""".stripMargin
    }.mkString("\n")
    DevicePairsCtes +
      s"""
       |, nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)
       |, nodes AS (
       |  SELECT node, degree,
       |    (15 * (1000000000000 // n)) // 100 AS tele,
       |    1000000000000 // n AS pr0
       |  FROM deg CROSS JOIN nn)
       |, p0 AS (SELECT node, degree, tele, pr0 AS pr FROM nodes)
       |$iters
       |SELECT node AS user_id, degree, CAST(pr AS BIGINT) AS pr_units,
       |  CAST(pr AS DOUBLE) / 1000000000000.0 AS pr_score
       |FROM p${Graph.Iterations} ORDER BY user_id""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  def oracles: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
