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

  // The calendar-grain hourly frame feeds both the baseline fit and the
  // scored output — persisted so the events fact table scans once.
  @volatile private var lastHourly: Option[DataFrame] = None
  def releaseCache(): Unit = {
    lastHourly.foreach(_.unpersist(blocking = false))
    lastHourly = None
  }

  def hourlyAnomalies(events: DataFrame,
                      lowRatio: Double = 0.5,
                      highRatio: Double = 2.0): DataFrame = {
    releaseCache()
    val hourly = events
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("dec_total"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastHourly = Some(hourly)

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

  /** Per-series OLS trend over daily totals: slope, intercept, and a
    * one-day-ahead forecast for each event type — the linear-trend
    * component the dashboard's trend panel eyeballs, computed exactly.
    * Least squares from the five classic sums (n, Σx, Σy, Σxy, Σx²)
    * with x = epoch day:
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²).
    *
    * Exactness: daily totals are exact decimal sums; Σy and Σxy
    * accumulate as DECIMAL (x is an integer day, so x·y is exact);
    * Σx/Σx²/n are BIGINTs; every final double forms in fixed
    * expression order from one VARCHAR-routed conversion per sum
    * (the q_corr contract). Scale shape: fact scan → (type, day)
    * partial agg (calendar-sized frame) → (type) partial agg of the
    * moment sums → row-local algebra. Two exchanges, scan bound. */
  def dailyTrend(events: DataFrame): DataFrame = {
    // Daily totals as exact integer CENTS (the Forensics cast contract) so
    // every moment sum is pure integer arithmetic — decimal×decimal would
    // blow past width 38 in either engine's type promotion.
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * lit(100)).cast("long").as("y_cents"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    daily.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        max(col("x")).as("max_x"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y_cents").cast("decimal(38,0)")).as("sum_y_dec"),
        sum((col("x") * col("y_cents")).cast("decimal(38,0)")).as("sum_xy_dec"))
      .withColumn("sum_y", col("sum_y_dec").cast("string").cast("double"))
      .withColumn("sum_xy", col("sum_xy_dec").cast("string").cast("double"))
      .withColumn("slope_cents",
        (col("n_days") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (col("n_days") * col("sum_x2") - col("sum_x") * col("sum_x")).cast("double"))
      .withColumn("intercept_cents",
        (col("sum_y") - col("slope_cents") * col("sum_x")) / col("n_days").cast("double"))
      .withColumn("forecast_next",
        (col("intercept_cents") + col("slope_cents") * (col("max_x") + lit(1L)).cast("double"))
          / lit(100.0))
      .select("event_type", "n_days", "slope_cents", "intercept_cents",
        "forecast_next")
      .orderBy("event_type")
  }
}
