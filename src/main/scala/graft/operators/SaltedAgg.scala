package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-resistant two-phase aggregation: rows are pre-aggregated on
  * (key, salt) — spreading a hot key over `salts` reducers — then merged
  * on the key. The result is EXACTLY the plain groupBy (decimal partials
  * are order-independent), which is what the oracle checks; only the
  * shuffle layout changes. This is the pattern for power-law keys at
  * 100 TB (hot users/devices dominating a fraud stream); AQE's skew
  * handling covers joins, but a skewed *aggregation* key still needs the
  * salt when a single group exceeds one reducer's memory.
  */
object SaltedAgg {

  /** Per-user event counts + value sums through a salt of `salts`. */
  def userEventStats(events: DataFrame, salts: Int = 8): DataFrame =
    events
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("_salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("user_id"), col("_salt"))
      .agg(
        count(lit(1)).as("c"),
        sum(col("value").cast(DecimalType(18, 2))).as("v"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("c")).as("event_count"),
        sum(col("v")).cast("double").as("value_sum"))
}
