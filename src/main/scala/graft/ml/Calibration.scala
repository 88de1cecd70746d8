package graft.ml

import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic probability calibration (pool-adjacent-violators, Zadrozny &
  * Elkan 2002): learn the monotone map score → P(fraud | score) that
  * fixes a miscalibrated scorer without changing its ranking (AUC is
  * invariant; Brier/log-loss improve). The serving layer applies the map
  * as a broadcast lookup.
  *
  * Spark-ML's IsotonicRegression runs PAVA distributed (per-partition
  * pools merged associatively), so the fit is corpus-scale — no collected
  * pandas frame. The learned boundary/prediction map is engine-local →
  * rows-only for the DuckDB gate; MlSpec pins the PAV hand example, the
  * monotonicity invariant, rank preservation, and the train-set Brier
  * improvement that calibration guarantees.
  */
object Calibration {

  /** Fit the isotonic map on (score, label) and return it as a bounded
    * (boundary, calibrated_p) table — the artifact the serving layer
    * broadcasts. Boundaries are the PAV pool edges (≤ #distinct scores,
    * usually far fewer). */
  def isotonicMap(scored: DataFrame, scoreCol: String,
                  labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val model = fit(scored, scoreCol, labelCol)
    model.boundaries.toArray.zip(model.predictions.toArray).toSeq
      .toDF("boundary", "calibrated_p")
  }

  /** Calibration quality before/after: micro-quantized Brier sums on the
    * SAME rows (the §4 exact-sum contract), one row out. The isotonic
    * map can only improve (or tie) the train-set Brier — MlSpec binds
    * that direction. */
  def brierGain(scored: DataFrame, scoreCol: String,
                labelCol: String): DataFrame = {
    val model = fit(scored, scoreCol, labelCol)
    val withCal = model.transform(
      scored.withColumn("features", col(scoreCol).cast("double")))
    val l = col(labelCol).cast("long")
    def sqNano(p: org.apache.spark.sql.Column) =
      floor((p - l.cast("double")) * (p - l.cast("double")) * 1e9).cast("long")
    withCal
      .select(l.as("_l"),
        sqNano(col(scoreCol).cast("double")).as("_raw"),
        sqNano(col("prediction")).as("_cal"))
      .agg(count(lit(1)).as("n"),
        sum(col("_raw")).cast("long").as("raw_sum_nano"),
        sum(col("_cal")).cast("long").as("cal_sum_nano"))
      .withColumn("brier_raw",
        col("raw_sum_nano").cast("double") / lit(1e9) / col("n"))
      .withColumn("brier_cal",
        col("cal_sum_nano").cast("double") / lit(1e9) / col("n"))
      .withColumn("brier_gain", col("brier_raw") - col("brier_cal"))
  }

  private def fit(scored: DataFrame, scoreCol: String, labelCol: String) =
    new IsotonicRegression()
      .setFeaturesCol("features")
      .setLabelCol("label_d")
      .setIsotonic(true)
      .fit(scored.select(col(scoreCol).cast("double").as("features"),
        col(labelCol).cast("double").as("label_d")))
}
