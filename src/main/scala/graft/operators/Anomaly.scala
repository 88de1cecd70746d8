package graft.operators

import graft.util.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the statistical anomaly pass the
  * reference's fraud summary implies (user_fraud_scores flags users whose
  * 30d aggregates sit far from their peer group) made explicit: flag rows
  * whose value deviates more than `threshold` standard deviations from
  * their group's mean.
  *
  * Determinism: group moments are exact decimal power sums (Σx via direct
  * decimal→double — population sums stay under 2^53 — and Σx² via the text
  * path, see Cols.sumMoneyBig), so mean/variance/z come from single IEEE
  * ops on identical operands in every engine; the built-in stddev would sum
  * doubles in shuffle order and drift run-to-run at cluster scale.
  *
  * Scale shape: one partial-aggregated shuffle at group grain produces the
  * per-group moment table (|groups| rows, broadcast back), then a
  * broadcast-join + filter over the fact rows — the fact table is scanned
  * twice but never re-shuffled, and no window funnels a group into one
  * task. Degenerate groups (n < 2 or zero variance) produce no outliers
  * rather than NaN comparisons.
  */
object Anomaly {

  /** Rows of `df` whose `valueCol` is an outlier within their `groupCols`
    * peer group: |value - mean| > threshold · stddev. Returns the input
    * columns + group mean/stddev and the z-score. `valueCol` must be
    * money-scale (≤ 2 fractional digits, the Cols moment contract). */
  def outliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
               threshold: Double = 3.0): DataFrame = {
    val v: Column = col(valueCol)
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("_n"),
        Cols.sumMoney(v).as("_sum"),
        Cols.sumMoneySqBig(v, v).as("_sumsq"))
      .withColumn("group_mean", col("_sum") / col("_n"))
      .withColumn("_var",
        (col("_sumsq") - col("_sum") * col("_sum") / col("_n")) / col("_n"))
      .withColumn("group_stddev", sqrt(col("_var")))
    df.join(broadcast(moments), groupCols)
      .filter(col("_n") >= 2 && col("group_stddev") > 0.0 &&
        abs(v - col("group_mean")) > lit(threshold) * col("group_stddev"))
      .withColumn("z_score", (v - col("group_mean")) / col("group_stddev"))
      .drop("_n", "_sum", "_sumsq", "_var")
  }
}
