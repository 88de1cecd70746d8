package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution: credit each purchase's value to the
  * click/view touchpoints that preceded it within a lookback window —
  * first-touch, last-touch, and linear credit in one frame. The marketing
  * completion of the funnel family (gold/Behavior.scala): the funnel says
  * users convert; attribution says which touches paid for it.
  *
  * Scale shape: the purchase×touch pairing is the RangeJoin bin trick
  * (operators/RangeJoin.scala), not an inequality join — a ≤24h lookback
  * spans at most 2 calendar days, so each purchase explodes to exactly 2
  * (user, day) keys and equi-joins touches on (user, day) before the
  * exact interval filter. Pair volume is bounded by per-user daily
  * activity, never corpus²; Catalyst plans a shuffled hash join, not the
  * BroadcastNestedLoopJoin the raw interval predicate would get.
  * Credit windows partition by purchase — bounded by one user's window
  * activity.
  */
object Attribution {

  private val DayUs = 86400000000L

  /** One row per (purchase, touch) with linear credit and first/last
    * flags. Deterministic: touch order is (ts_us, event_id). */
  def multiTouch(events: DataFrame, lookbackHours: Int = 24): DataFrame = {
    val lookUs = lookbackHours.toLong * 3600000000L
    val base = events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      unix_micros(col("ts")).as("ts_us"))
    val purchases = base
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("purchase_value"), col("ts_us").as("p_ts_us"))
      // array_distinct collapses the 2 bins to 1 when the lookback stays
      // in-day — row-local, no dedup shuffle after the explode. Bins use
      // exact integer `div` (µs magnitudes lose sub-unit precision as
      // doubles).
      .withColumn("_bin", explode(array_distinct(array(
        expr(s"(p_ts_us - ${lookUs}L) div ${DayUs}L"),
        expr(s"p_ts_us div ${DayUs}L")))))
    val touches = base
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("event_type").as("touch_type"), col("ts_us").as("t_ts_us"))
      .withColumn("_bin", expr(s"t_ts_us div ${DayUs}L"))
    val paired = purchases
      .join(touches, Seq("user_id", "_bin"))
      .filter(col("t_ts_us") >= col("p_ts_us") - lookUs &&
        col("t_ts_us") < col("p_ts_us"))
      .drop("_bin")
    val wP = Window.partitionBy(col("purchase_id"))
    val wOrd = wP.orderBy(col("t_ts_us"), col("touch_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    paired
      .withColumn("n_touches", count(lit(1)).over(wP))
      .withColumn("_first", first(col("touch_id")).over(wOrd))
      .withColumn("_last", last(col("touch_id")).over(wOrd))
      .select(
        col("purchase_id"), col("user_id"), col("purchase_value"),
        col("p_ts_us"), col("touch_id"), col("touch_type"), col("t_ts_us"),
        col("n_touches"),
        (col("purchase_value") / col("n_touches").cast("double")).as("credit_linear"),
        (col("touch_id") === col("_first")).as("is_first_touch"),
        (col("touch_id") === col("_last")).as("is_last_touch"))
      .orderBy("purchase_id", "touch_id")
  }

  /** Channel-grain credit rollup of [[multiTouch]] — the mart marketing
    * actually reads: per touch type, how many touches, how many distinct
    * purchases it influenced, its LINEAR credit total, and the
    * first-/last-touch revenue it would claim under those models.
    *
    * Exactness: per-row linear credit (an IEEE division both engines
    * compute identically) is micro-quantized BEFORE the sum, so the
    * channel totals are exact integer sums, not order-dependent double
    * sums; first/last revenue sums ride the decimal(18,2) money
    * contract. One channel-grain partial-agg exchange over the paired
    * frame. */
  def creditRollup(events: DataFrame, lookbackHours: Int = 24): DataFrame =
    multiTouch(events, lookbackHours)
      .withColumn("_credit_micro",
        floor(col("credit_linear") * lit(1000000.0)).cast("long"))
      .groupBy("touch_type")
      .agg(
        count(lit(1)).as("touches"),
        countDistinct(col("purchase_id")).as("purchases_touched"),
        sum(col("_credit_micro")).as("linear_credit_micro"),
        sum(when(col("is_first_touch"), lit(1L)).otherwise(lit(0L))).as("n_first"),
        sum(when(col("is_last_touch"), lit(1L)).otherwise(lit(0L))).as("n_last"),
        sum(when(col("is_first_touch"),
          col("purchase_value").cast("decimal(18,2)"))).cast("double")
          .as("first_touch_value"),
        sum(when(col("is_last_touch"),
          col("purchase_value").cast("decimal(18,2)"))).cast("double")
          .as("last_touch_value"))
      .withColumn("linear_credit",
        col("linear_credit_micro").cast("double") / lit(1000000.0))
      .select("touch_type", "touches", "purchases_touched",
        "linear_credit_micro", "linear_credit", "n_first", "n_last",
        "first_touch_value", "last_touch_value")
      .orderBy("touch_type")
}
