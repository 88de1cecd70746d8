package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Silver-layer feature engineering: windowed per-user stats, trailing
  * time-range velocity, lag/lead deltas, ranking.
  * Ref: /root/reference/spark_jobs/silver/build_fraud_features.py
  * (compute_transaction_features, compute_velocity_features).
  *
  * Velocity: the reference computes 1h/24h/7d counts with three self-joins
  * (history × base per window) — at 100 TB that is three shuffle-join
  * explosions. Here all three are RANGE window frames over one
  * partition-by-user sort: a single shuffle, streamed in one pass.
  * Window averages use decimal sums (order-independent → deterministic).
  */
object Features {

  private val Money = DecimalType(18, 2)

  def winAvg(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(Money)).over(w).cast("double") / count(lit(1)).over(w)

  /** Per-customer transaction features over the orders fact. */
  def txnFeatures(cleanOrders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    cleanOrders
      .select("o_orderkey", "o_custkey", "o_totalprice", "order_date", "amount_tier")
      // float32: transcendental outputs (ln/exp) differ from C libm by
      // ~1 ulp; the IEEE-specified double→float rounding quantizes that
      // away identically in every engine. ML features are float anyway.
      .withColumn("amount_log", log(lit(1.0) + col("o_totalprice")).cast("float"))
      .withColumn("order_month", month(col("order_date")).cast("long"))
      .withColumn("order_dow", dayofweek(col("order_date")).cast("long"))
      .withColumn("is_weekend", dayofweek(col("order_date")).isin(1, 7))
      .withColumn("user_order_count", count(lit(1)).over(w))
      .withColumn("user_avg_amount", winAvg(col("o_totalprice"), w))
      .withColumn("user_max_amount", max(col("o_totalprice")).over(w))
      .withColumn("user_min_amount", min(col("o_totalprice")).over(w))
      .withColumn("amount_vs_user_avg", col("o_totalprice") / col("user_avg_amount"))
  }

  /** Per-customer exact percentiles (reference uses percentile_approx over
    * a user window; we use exact percentile in aggregate form — matches
    * DuckDB quantile_cont bit-for-bit). */
  /** Rank-based exact percentiles (see RankPercentile): the window sort
    * replaces the built-in percentile's unbounded agg buffer; the ordinary
    * aggregates ride the same post-window groupBy, so the plan keeps one
    * scan and one exchange. */
  def userPercentiles(cleanOrders: DataFrame): DataFrame =
    RankPercentile.ranked(cleanOrders, Seq("o_custkey"), col("o_totalprice"))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_count"),
        RankPercentile.pct(0.5).as("p50_amount"),
        RankPercentile.pct(0.95).as("p95_amount"),
        graft.util.Cols.sumMoney(col("o_totalprice")).as("total_spend"))

  /** Trailing velocity counts/sums per user over 1h / 24h / 7d, one RANGE
    * frame each over a single user_id×time sort. `tsUs` must be epoch
    * microseconds (bigint). */
  def velocity(events: DataFrame): DataFrame = {
    val base = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
    def trailing(us: Long) =
      Window.partitionBy("user_id").orderBy(col("ts_us")).rangeBetween(-us, -1L)
    val h = 3600L * 1000000L
    base
      .withColumn("velocity_1h", count(lit(1)).over(trailing(h)))
      .withColumn("velocity_24h", count(lit(1)).over(trailing(24 * h)))
      .withColumn("velocity_7d", count(lit(1)).over(trailing(7 * 24 * h)))
      .withColumn("value_sum_24h",
        coalesce(sum(col("value").cast(Money)).over(trailing(24 * h)).cast("double"), lit(0.0)))
  }

  /** Inter-event lag/lead features per user. */
  def lagLead(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .withColumn("prev_event_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_event_type", lead(col("event_type"), 1).over(w))
      .withColumn("micros_since_prev", col("ts_us") - col("prev_ts_us"))
      .withColumn("seq_in_user", row_number().over(w).cast("long"))
  }

  /** Customer spend ranking: ntile deciles + rank/dense_rank/row_number —
    * computed by [[ScalableRank]] (range-partitioned sort + local rank +
    * constant-size offset merge), never a single-partition window over the
    * unbounded per-customer aggregate. */
  def spendRanking(cleanOrders: DataFrame): DataFrame = {
    val perCust = cleanOrders
      .groupBy(col("o_custkey"))
      .agg(graft.util.Cols.sumMoney(col("o_totalprice")).as("revenue"))
    ScalableRank.ranked(perCust, col("revenue"), col("o_custkey"), 10,
        rowCol = "revenue_row", rankCol = "revenue_rank",
        denseCol = "revenue_dense_rank", ntileCol = "revenue_decile")
      .select(col("o_custkey"), col("revenue"),
        col("revenue_decile").cast("long").as("revenue_decile"),
        col("revenue_rank").cast("long").as("revenue_rank"),
        col("revenue_dense_rank").cast("long").as("revenue_dense_rank"),
        col("revenue_row").cast("long").as("revenue_row"))
  }

  /** Running (cumulative) daily revenue per status — exact decimal running
    * sums. */
  def runningTotals(cleanOrders: DataFrame): DataFrame = {
    val daily = cleanOrders
      .groupBy(col("status_normalized"), col("order_date"))
      .agg(sum(col("o_totalprice").cast(Money)).as("gmv_dec"),
        count(lit(1)).as("daily_orders"))
    val w = Window.partitionBy("status_normalized").orderBy("order_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cumulative_gmv", sum(col("gmv_dec")).over(w).cast("double"))
      .withColumn("cumulative_orders", sum(col("daily_orders")).over(w))
      .withColumn("gmv", col("gmv_dec").cast("double"))
      .drop("gmv_dec")
  }
}
