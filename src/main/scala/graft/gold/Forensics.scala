package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensic-accounting screens over monetary columns.
  *
  * Benford's law: in organically-generated amounts the leading digit d
  * appears with probability log₁₀(1+1/d); fabricated or manipulated
  * amounts (fraud rings inventing invoice values) deviate measurably.
  * The chi-square statistic against the Benford expectation per segment
  * is a standard first-pass fraud screen — a natural gold-layer addition
  * to the reference's fraud summary family.
  *
  * Scale shape: one partial-agged groupBy to (segment, digit) grain —
  * at most 9 digits × segments rows — then constant-size window math.
  * The leading digit is extracted through the exact decimal(18,2) cents
  * representation (the same cast contract the money-sum oracles use,
  * SURVEY §4), never via double log10, whose boundary rounding
  * (log10(1000) → 2.9999…) would misclassify powers of ten.
  */
object Forensics {

  /** Leading decimal digit of a positive money amount, exact. */
  def leadingDigit(amount: Column): Column =
    substring(amount.cast("decimal(18,2)").*(lit(100)).cast("long").cast("string"), 1, 1)
      .cast("long")

  /** Per (segment, digit): observed count, Benford expectation, and the
    * chi-square contribution. `amount` must be > 0 (filter upstream). */
  def benford(df: DataFrame, segment: Column, amount: Column): DataFrame = {
    val counts = df
      .groupBy(segment.as("segment"), leadingDigit(amount).as("digit"))
      .agg(count(lit(1)).as("observed"))
    // ≤ 9 rows per segment: bounded window at agg grain.
    val wSeg = Window.partitionBy(col("segment"))
    val expP = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    counts
      .withColumn("segment_total", sum(col("observed")).over(wSeg))
      .withColumn("expected_p", expP)
      .withColumn("observed_p",
        col("observed").cast("double") / col("segment_total"))
      .withColumn("expected_n", col("segment_total").cast("double") * col("expected_p"))
      .withColumn("chi2_term",
        (col("observed").cast("double") - col("expected_n")) *
          (col("observed").cast("double") - col("expected_n")) / col("expected_n"))
      .select("segment", "digit", "observed", "segment_total",
        "observed_p", "expected_p", "chi2_term")
      .orderBy("segment", "digit")
  }

  /** Bot-timing screen: per-user inter-event-gap regularity. Human
    * activity has bursty arrivals (squared coefficient of variation
    * cv² ≈ 1 for Poisson, > 1 for bursts); scripted clients fire on a
    * timer (cv² ≈ 0). Flag users with enough events whose gap cv²
    * falls below `maxCv2` — the timing counterpart of the Benford
    * value screen.
    *
    * Exactness: gaps are integer SECONDS (µs div 1e6); moments
    * accumulate as DECIMAL(38,0) exact integer sums (µs² would
    * overflow BIGINT; second-grain squares fit 38 digits at any
    * realistic scale); mean/variance/cv² form in fixed expression
    * order from the exact sums (q_corr contract), guarded NULL when
    * the mean is zero.
    *
    * Scale shape: one (user)-keyed lag window — the exchange every
    * sessionizer rides — then a partial-agged per-user reduction.
    * Linear, no self-joins. */
  def botTiming(events: DataFrame, minEvents: Long = 20,
                maxCv2: Double = 0.1): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gaps = events
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_s", expr("(ts_us - prev_us) div 1000000"))
    gaps.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap_s").cast("decimal(38,0)")).as("sum_g"),
        sum((col("gap_s") * col("gap_s")).cast("decimal(38,0)")).as("sum_g2"))
      // decimal→double routed through VARCHAR (the q_corr contract): one
      // correctly-rounded conversion in both engines.
      .withColumn("mean_gap_s",
        col("sum_g").cast("string").cast("double") / col("n_gaps").cast("double"))
      .withColumn("var_gap",
        col("sum_g2").cast("string").cast("double") / col("n_gaps").cast("double")
          - col("mean_gap_s") * col("mean_gap_s"))
      .withColumn("cv2",
        when(col("mean_gap_s") > 0,
          col("var_gap") / (col("mean_gap_s") * col("mean_gap_s"))))
      .withColumn("is_bot_timing",
        col("n_gaps") >= minEvents && col("cv2").isNotNull &&
          col("cv2") < maxCv2)
      .select("user_id", "n_gaps", "mean_gap_s", "cv2", "is_bot_timing")
      .orderBy("user_id")
  }
}
