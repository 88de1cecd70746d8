package graft.ml

import graft.operators.Features
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML fraud pipeline re-expression: the reference trains XGBoost on a
  * 25-feature numeric vector and serves a fraud probability + threshold
  * label. Here the feature vector is built with the same coalesce-default
  * discipline, and scoring is a logistic model whose weights are literals
  * — evaluated as native codegen'd expressions (no UDF, no model server
  * hop), which is how a pre-trained linear scorer should ship on Spark.
  * Ref: /root/reference/spark_jobs/silver/build_fraud_features.py
  * (build_final_feature_vector), /root/reference/ml/models/fraud_detector.py,
  * /root/reference/ml/serving/api.py (risk thresholds).
  */
object FraudScore {

  /** Deterministic fraud label rule (the testdata has no native label —
    * same role as the reference generator's is_fraud flag). */
  def fraudLabel(amountVsAvg: Column, regionRisk: Column, tier: Column): Column =
    ((amountVsAvg > 2.5) && (regionRisk > 0.05)) ||
      ((tier === "premium") && (regionRisk >= 0.09))

  /** Numeric feature vector at order grain (reference: 25 numeric cols,
    * all coalesce-defaulted). */
  def featureVector(enrichedOrders: DataFrame): DataFrame = {
    // Window features computed inline over the enriched rows — one shuffle
    // on o_custkey, no re-join of a separate feature table (the enrichment
    // join is 1:1, so window stats over enriched == over clean orders).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
    enrichedOrders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("order_date"), col("amount_tier"), col("region_risk"),
        col("is_high_risk_region"), col("negative_balance_flag"), col("c_acctbal"))
      .withColumn("amount_log", log(lit(1.0) + col("o_totalprice")).cast("float"))
      .withColumn("order_month", month(col("order_date")).cast("long"))
      .withColumn("order_dow", dayofweek(col("order_date")).cast("long"))
      .withColumn("is_weekend", dayofweek(col("order_date")).isin(1, 7))
      .withColumn("user_order_count", count(lit(1)).over(w))
      .withColumn("user_avg_amount", Features.winAvg(col("o_totalprice"), w))
      .withColumn("amount_vs_user_avg", col("o_totalprice") / col("user_avg_amount"))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        coalesce(col("o_totalprice"), lit(0.0)).as("total_amount"),
        coalesce(col("amount_log"), lit(0.0f)).as("amount_log"),
        col("order_month"),
        col("order_dow"),
        col("is_weekend").cast("long").as("is_weekend"),
        col("user_order_count").as("user_order_count"),
        coalesce(col("user_avg_amount"), lit(0.0)).as("user_avg_amount"),
        coalesce(col("amount_vs_user_avg"), lit(1.0)).as("amount_vs_user_avg"),
        coalesce(col("region_risk"), lit(0.05)).as("region_risk"),
        col("is_high_risk_region").cast("long").as("is_high_risk_region"),
        col("negative_balance_flag").cast("long").as("negative_balance"),
        coalesce(col("c_acctbal"), lit(0.0)).as("account_balance"),
        fraudLabel(col("amount_vs_user_avg"), col("region_risk"),
          col("amount_tier")).cast("long").as("label"))
  }

  /** Amount-tier ordinal encoding (reference: risk_tier_encoded). */
  def tierEncoded(tier: Column): Column =
    when(tier === "micro", 0L).when(tier === "low", 1L)
      .when(tier === "medium", 2L).when(tier === "high", 3L)
      .otherwise(4L)

  /** Full reference-fidelity feature vector: 25 numeric features at order
    * grain — transaction features + windowed p95 ratio + trailing velocity
    * + refund history + tier/priority/geo encodings.
    * Ref: build_fraud_features.py:227–274 (build_final_feature_vector);
    * velocity per :68–134 (the reference runs THREE self-joins of the fact
    * against itself, one per window — at 100 TB that is three shuffle-join
    * explosions of a 100 TB table against itself).
    *
    * Here velocity AND refund history come from ONE union+window pass:
    * orders (weight_order=1) and refund line-rows (weight_refund=1) are
    * unioned into a narrow (uid, day, weights, key) frame, sorted once per
    * user, and every trailing count is a RANGE frame over that single sort
    * — one shuffle total, streamed, no self-joins. The events table can't
    * bridge (disjoint key/time domains in the testdata), so velocity is
    * over the user's own order history — which is exactly what the
    * reference's self-join computes — at the fact's native date resolution
    * (7d/30d/90d trailing).
    */
  def fullFeatureVector(enrichedOrders: DataFrame, cleanOrders: DataFrame,
                        cleanLineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    val epoch = lit("1970-01-01").cast("date")

    // Per-user window features over the enriched fact: one shuffle on
    // o_custkey serves count/avg/max/min/p95/first-date simultaneously.
    val base = enrichedOrders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("order_date"), col("amount_tier"), col("o_orderpriority"),
        col("region_risk"), col("is_high_risk_region"),
        col("negative_balance_flag"), col("c_acctbal"))
      .withColumn("amount_log", log(lit(1.0) + col("o_totalprice")).cast("float"))
      .withColumn("order_month", month(col("order_date")).cast("long"))
      .withColumn("order_dow", dayofweek(col("order_date")).cast("long"))
      .withColumn("is_weekend", dayofweek(col("order_date")).isin(1, 7))
      .withColumn("user_order_count", count(lit(1)).over(w))
      .withColumn("user_avg_amount", Features.winAvg(col("o_totalprice"), w))
      .withColumn("user_max_amount", max(col("o_totalprice")).over(w))
      .withColumn("user_min_amount", min(col("o_totalprice")).over(w))
      .withColumn("user_p95_amount", percentile(col("o_totalprice"), lit(0.95)).over(w))
      .withColumn("amount_vs_user_avg", col("o_totalprice") / col("user_avg_amount"))
      .withColumn("amount_vs_user_p95",
        col("o_totalprice") / (col("user_p95_amount") + lit(0.01)))
      .withColumn("account_age_days",
        datediff(col("order_date"), min(col("order_date")).over(w)).cast("long"))

    // Narrow union frame: order rows + refund line rows, integer day axis.
    val ordersTall = cleanOrders.select(
      col("o_custkey").as("uid"),
      datediff(col("order_date"), epoch).as("day"),
      lit(1L).as("w_order"), lit(0L).as("w_refund"),
      col("o_orderkey").as("v_okey"))
    val refundsTall = cleanLineitem.filter(col("is_refund"))
      .select(col("l_orderkey"), col("ship_date"))
      .join(cleanOrders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("uid"),
        datediff(col("ship_date"), epoch).as("day"),
        lit(0L).as("w_order"), lit(1L).as("w_refund"),
        lit(null).cast("bigint").as("v_okey"))

    def trailing(days: Int) =
      Window.partitionBy("uid").orderBy(col("day")).rangeBetween(-days, -1)
    val wUid = Window.partitionBy("uid")
    val velocity = ordersTall.unionByName(refundsTall)
      .withColumn("velocity_7d", coalesce(sum(col("w_order")).over(trailing(7)), lit(0L)))
      .withColumn("velocity_30d", coalesce(sum(col("w_order")).over(trailing(30)), lit(0L)))
      .withColumn("velocity_90d", coalesce(sum(col("w_order")).over(trailing(90)), lit(0L)))
      .withColumn("refund_count_30d", coalesce(sum(col("w_refund")).over(trailing(30)), lit(0L)))
      .withColumn("user_refund_count", sum(col("w_refund")).over(wUid))
      .filter(col("w_order") === 1L)
      .select(col("v_okey"), col("velocity_7d"), col("velocity_30d"),
        col("velocity_90d"), col("refund_count_30d"), col("user_refund_count"))

    base.join(velocity, col("o_orderkey") === col("v_okey"))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        coalesce(col("o_totalprice"), lit(0.0)).as("total_amount"),
        coalesce(col("amount_log"), lit(0.0f)).as("amount_log"),
        col("order_month"),
        col("order_dow"),
        col("is_weekend").cast("long").as("is_weekend"),
        col("user_order_count"),
        coalesce(col("user_avg_amount"), lit(0.0)).as("user_avg_amount"),
        col("user_max_amount"),
        col("user_min_amount"),
        coalesce(col("amount_vs_user_avg"), lit(1.0)).as("amount_vs_user_avg"),
        col("user_p95_amount"),
        coalesce(col("amount_vs_user_p95"), lit(1.0)).as("amount_vs_user_p95"),
        col("account_age_days"),
        col("velocity_7d"), col("velocity_30d"), col("velocity_90d"),
        col("refund_count_30d"), col("user_refund_count"),
        (col("user_refund_count").cast("double") /
          (col("user_order_count") + lit(1L)).cast("double")).as("refund_rate"),
        tierEncoded(col("amount_tier")).as("tier_encoded"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("is_priority_order"),
        coalesce(col("region_risk"), lit(0.05)).as("region_risk"),
        col("is_high_risk_region").cast("long").as("is_high_risk_region"),
        col("negative_balance_flag").cast("long").as("negative_balance"),
        coalesce(col("c_acctbal"), lit(0.0)).as("account_balance"),
        fraudLabel(col("amount_vs_user_avg"), col("region_risk"),
          col("amount_tier")).cast("long").as("label"))
  }

  /** Literal logistic weights ("pre-trained model" shipped with the lib). */
  val Bias = -4.0
  val Weights: Seq[(String, Double)] = Seq(
    "amount_vs_user_avg" -> 0.9,
    "region_risk" -> 11.0,
    "is_high_risk_region" -> 0.8,
    "negative_balance" -> 0.6,
    "is_weekend" -> 0.15,
    "amount_log" -> 0.12)

  /** Deterministic 80/20 split on the business key (reference: train.py's
    * train/test split — hash-stable here so re-runs and engines agree). */
  def withSplit(features: DataFrame): DataFrame =
    features.withColumn("is_test", col("o_orderkey") % 5 === 0)

  /** Held-out evaluation: confusion matrix + precision/recall/F1 of the
    * shipped scorer against the rule label (reference: train.py's metrics
    * report, as a single aggregation). */
  def evaluate(scored: DataFrame): DataFrame = {
    val test = withSplit(scored).filter(col("is_test"))
    test.agg(
        count(lit(1)).as("n_test"),
        sum(when(col("predicted_fraud") === 1 && col("label") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("predicted_fraud") === 1 && col("label") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("predicted_fraud") === 0 && col("label") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("predicted_fraud") === 0 && col("label") === 0, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision",
        col("tp").cast("double") / (col("tp") + col("fp")))
      .withColumn("recall",
        col("tp").cast("double") / (col("tp") + col("fn")))
      .withColumn("accuracy",
        (col("tp") + col("tn")).cast("double") / col("n_test"))
  }

  /** Score = sigmoid(w·x + b), risk label by serving thresholds. */
  def score(features: DataFrame): DataFrame = {
    val z = Weights.foldLeft(lit(Bias)) { case (acc, (f, w)) =>
      acc + col(f) * lit(w)
    }
    features
      // float32 quantization: see Features.txnFeatures — keeps the logistic
      // bit-identical across libm implementations.
      .withColumn("z", z.cast("float"))
      .withColumn("fraud_score", (lit(1.0) / (lit(1.0) + exp(-col("z")))).cast("float"))
      .withColumn("risk_label",
        when(col("fraud_score") >= 0.50, lit("high"))
          .when(col("fraud_score") >= 0.20, lit("medium"))
          .otherwise(lit("low")))
      .withColumn("predicted_fraud", (col("fraud_score") >= 0.5).cast("long"))
  }
}
