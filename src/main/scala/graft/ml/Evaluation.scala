package graft.ml

import graft.operators.ScalableRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold-free model evaluation: exact ROC-AUC and score calibration.
  *
  * The reference evaluates its fraud model with sklearn's `roc_auc_score`
  * on a collected pandas frame (ref ml/train.py metrics block) — fine for
  * one node, impossible at 100 TB. Here AUC is computed as a distributed
  * rank statistic (Mann–Whitney U): it needs one global ranking of the
  * scores plus one aggregate, and the ranking is the balanced
  * range-exchange of [[graft.operators.ScalableRank]], never a
  * single-partition window.
  *
  * Exactness contract (SURVEY §4): ties are handled with average ranks,
  * kept in INTEGER arithmetic by doubling — for a tie group whose SQL
  * `rank()` is r with c members, 2·avg_rank = 2r + c − 1. Summing that
  * per positive row gives an exact BIGINT; AUC is one final double
  * division of exact integers, IEEE-identical across engines:
  *
  *   AUC = (Σ_pos 2·avg_rank − P(P+1)) / (2·P·N)
  */
object Evaluation {

  /** One-row frame: positives, negatives, the doubled positive rank sum,
    * exact AUC of `score` against binary `label`, and the Gini
    * coefficient (2·AUC − 1).
    *
    * `scored` needs columns (score FLOAT/DOUBLE, label 0/1 LONG) plus a
    * unique `tiebreak` column for the total order the global row-number
    * requires (ranking output is tie-corrected afterwards, so the
    * tiebreak never affects the statistic).
    */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
             tiebreak: String): DataFrame = {
    val rn = ScalableRank.withGlobalRowNumber(
      scored.select(col(scoreCol).as("_s"), col(labelCol).cast("long").as("_l"),
        col(tiebreak).as("_tb")),
      Seq(col("_s"), col("_tb")), "_rn")
    // Tie correction at score grain: a window partitioned by the score
    // value only ever holds one tie group — bounded by tie multiplicity,
    // not by the corpus.
    val wTies = Window.partitionBy(col("_s"))
    val r2 = rn
      .withColumn("_rank", min(col("_rn")).over(wTies))
      .withColumn("_cnt", count(lit(1)).over(wTies))
      .withColumn("_r2", lit(2L) * col("_rank") + col("_cnt") - lit(1L))
    r2.agg(
        sum(col("_l")).cast("long").as("pos_n"),
        sum(lit(1L) - col("_l")).cast("long").as("neg_n"),
        sum(when(col("_l") === 1L, col("_r2")).otherwise(lit(0L)))
          .cast("long").as("rank_sum2"))
      .withColumn("auc",
        (col("rank_sum2") - col("pos_n") * (col("pos_n") + lit(1L))).cast("double") /
          (lit(2.0) * col("pos_n") * col("neg_n")))
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))
  }

  /** Precision/recall/F1 at every occupied threshold of a fixed grid — the
    * operating-point sweep behind the reference's serving threshold
    * choice (ref ml/serving/api.py hard-codes 0.5; this is the frame
    * that justifies it).
    *
    * Scale shape: scores collapse to `steps` grid bins in ONE
    * partial-agged groupBy; tp/fp at each threshold are SUFFIX sums
    * over the ≤`steps`-row bin frame (bins align with thresholds, so
    * score ≥ t_j ⟺ bin ≥ j exactly — no per-threshold rescan, no
    * cross join of data × thresholds). All integer until the final
    * ratios.
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String, labelCol: String,
                     steps: Int = 20): DataFrame = {
    val s = col(scoreCol).cast("double")
    val l = col(labelCol).cast("long")
    val bins = scored
      .select(least(floor(s * steps).cast("long"), lit(steps - 1L)).as("bin"),
        l.as("_l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("_n"), sum(col("_l")).cast("long").as("_pos"))
    // ≤ steps rows from here on: the windows are constant-size.
    val wAll = Window.partitionBy(lit(1))
    val wSuffix = Window.partitionBy(lit(1)).orderBy(col("bin"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cum = bins
      .withColumn("total_pos", sum(col("_pos")).over(wAll))
      .withColumn("total", sum(col("_n")).over(wAll))
      .withColumn("tp", sum(col("_pos")).over(wSuffix))
      .withColumn("predicted_pos", sum(col("_n")).over(wSuffix))
    cum
      .select(
        col("bin").as("threshold_step"),
        (col("bin").cast("double") / steps).as("threshold"),
        col("tp"),
        (col("predicted_pos") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        (col("total") - col("predicted_pos") - col("total_pos") + col("tp")).as("tn"),
        (col("tp").cast("double") / col("predicted_pos")).as("precision"),
        (col("tp").cast("double") / col("total_pos")).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(lit(0.0)))
      .orderBy("threshold_step")
  }

  /** Reliability-diagram bins: fixed decile bins over [0,1) score space,
    * per-bin support, positive rate, and mean predicted score.
    *
    * Mean prediction is kept oracle-exact with the micro-unit
    * quantization contract (UnigramLm pattern): per-row
    * floor(score·10⁶) summed as BIGINT, divided once at the end. The
    * per-bin squared-error sum (Brier numerator) is quantized the same
    * way at 10⁹ so the whole frame stays hash-exact. One partial-agged
    * groupBy over ≤ `bins` groups — scan-bound at any scale.
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("double")
    val l = col(labelCol).cast("long")
    scored
      .select(
        least(floor(s * bins).cast("long"), lit(bins - 1L)).as("bin"),
        l.as("_l"),
        floor(s * 1000000d).cast("long").as("_s_micro"),
        floor((s - l.cast("double")) * (s - l.cast("double")) * 1000000000d)
          .cast("long").as("_sq_nano"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_l")).cast("long").as("positives"),
        sum(col("_s_micro")).cast("long").as("sum_score_micro"),
        sum(col("_sq_nano")).cast("long").as("brier_sum_nano"))
      .withColumn("bin_lo", col("bin").cast("double") / bins)
      .withColumn("pos_rate", col("positives").cast("double") / col("n"))
      .withColumn("mean_pred",
        col("sum_score_micro").cast("double") / lit(1000000.0) / col("n"))
      .withColumn("calib_gap", col("mean_pred") - col("pos_rate"))
      .orderBy("bin")
  }
}
