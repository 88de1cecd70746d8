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
