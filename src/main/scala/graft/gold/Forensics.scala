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
}
