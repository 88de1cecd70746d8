package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-baseline anomaly detection: compare each (date, hour)'s
  * purchase volume against the (day-of-week, hour) baseline learned
  * from the whole period — the deseasonalized version of [[Drift]]'s
  * period-vs-period screen. "Tuesday 3am is quiet" is signal, not
  * anomaly; a Tuesday 3am that looks like a Friday noon is the fraud
  * burst / outage marker the reference's Grafana row watches for.
  *
  * Scale shape: the fact scan collapses to (date, hour) grain in one
  * partial-agged groupBy (frame size = days × 24, grows with the
  * calendar, not the data); the baseline is a second partial agg onto
  * the 7 × 24 = 168-row frame, broadcast back. Scan bound at any
  * scale; every post-agg op runs on calendar-sized frames.
  *
  * Cross-engine exactness: hourly totals are exact decimal sums
  * (SURVEY §4 money contract); the baseline mean divides a decimal
  * sum-of-sums by a BIGINT day count; ratio and flags are IEEE ops on
  * identically-derived doubles.
  */
object Seasonal {

  def hourlyAnomalies(events: DataFrame,
                      lowRatio: Double = 0.5,
                      highRatio: Double = 2.0): DataFrame = {
    val hourly = events
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("dec_total"))

    val baseline = hourly
      .withColumn("dow", dayofweek(col("day")))
      .groupBy("dow", "hr")
      .agg(sum(col("dec_total")).as("dec_sum"), count(lit(1)).as("n_days"))
      .withColumn("baseline",
        col("dec_sum").cast("double") / col("n_days").cast("double"))
      .select("dow", "hr", "n_days", "baseline")

    hourly
      .withColumn("dow", dayofweek(col("day")))
      .join(broadcast(baseline), Seq("dow", "hr"))
      .withColumn("actual", col("dec_total").cast("double"))
      .withColumn("ratio", col("actual") / col("baseline"))
      .withColumn("is_anomalous",
        col("ratio") < lit(lowRatio) || col("ratio") > lit(highRatio))
      .select(col("day"), col("hr"), col("dow").cast("long").as("dow"),
        col("n_days"), col("actual"), col("baseline"), col("ratio"),
        col("is_anomalous"))
      .orderBy("day", "hr")
  }
}
