package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * right.ts <= left.ts within the same key — an operator Spark lacks
  * natively (DuckDB has ASOF JOIN; the oracle uses it to cross-check).
  *
  * Spark-first implementation: union both sides tagged, one
  * partition-by-key time sort, then `last(_, ignoreNulls)` window to carry
  * the latest right-side attributes forward. One shuffle + one sort,
  * linear in input — no range-join explosion, no per-key collect. Scales
  * to 100 TB exactly like any window aggregate (skew governed by key
  * cardinality; AQE skew handling applies).
  */
object AsOfJoin {

  /** leftEvents asof-join rightEvents on user_id, carrying right's value.
    * Both inputs need (event_id, user_id, ts_us, value). Right rows at the
    * exact same ts as a left row DO match (<=), implemented by sorting the
    * right tag before the left tag at equal timestamps. */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("event_id"), col("user_id"), col("ts_us"),
      col("value"), lit(1).as("_side"), lit(null).cast("double").as("_r_value"),
      lit(null).cast("long").as("_r_ts_us"))
    val r = right.select(col("event_id"), col("user_id"), col("ts_us"),
      lit(null).cast("double").as("value"), lit(0).as("_side"),
      col("value").as("_r_value"), col("ts_us").as("_r_ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("_side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_value", last(col("_r_value"), ignoreNulls = true).over(w))
      .withColumn("asof_ts_us", last(col("_r_ts_us"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn("micros_since_match", col("ts_us") - col("asof_ts_us"))
      .drop("_side", "_r_value", "_r_ts_us")
  }
}
