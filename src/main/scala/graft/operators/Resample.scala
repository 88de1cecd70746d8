package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling: fixed-interval OHLC bars and gap-filled,
  * forward-filled series — the downsampling layer every monitoring
  * dashboard reads instead of raw events (the reference's Grafana panels
  * query per-interval aggregates of the fraud stream; same shape).
  *
  * Scale: bars are one (key, bucket) exchange — the window sort and the
  * bucket groupBy share it (subset rule). Gap filling explodes a per-key
  * bucket spine bounded by the observed time span (buckets/key, not
  * events/key) and forward-fills with an ordinary per-key window — linear,
  * no self-joins, no driver state.
  *
  * Determinism: open/close tie-break on (ts_us, event_id) — a total
  * order — so results hash-match the DuckDB oracle exactly.
  */
object Resample {

  /** OHLC bars of `value` per (user_id, fixed bucket of `bucketUs` µs):
    * open/close = first/last by (ts_us, event_id), high/low = max/min,
    * volume = decimal-summed value, n_events = count. */
  def ohlcBars(events: DataFrame, bucketUs: Long): DataFrame = {
    val base = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("bucket", expr(s"ts_us div ${bucketUs}L"))
    // one sort, two frames: first/last over the full frame are the
    // bucket's open/close; the groupBy below reuses the same exchange
    val full = Window.partitionBy("user_id", "bucket")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("open", first("value").over(full))
      .withColumn("close", last("value").over(full))
      .groupBy("user_id", "bucket")
      .agg(
        max("open").as("open"),
        max("close").as("close"),
        max("value").as("high"),
        min("value").as("low"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("volume"))
      .withColumn("bucket_start_us", col("bucket") * lit(bucketUs))
  }

  /** Dense per-key series over the key's observed [min, max] bucket span:
    * missing buckets appear with is_gap=true, n_events=0, and the last
    * known close forward-filled (null until the first bar). */
  def gapFill(bars: DataFrame): DataFrame = {
    val spine = bars.groupBy("user_id")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col("user_id"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wf = Window.partitionBy("user_id").orderBy("bucket")
    spine.join(bars, Seq("user_id", "bucket"), "left")
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("close_ff", last(col("close"), ignoreNulls = true).over(wf))
      .select(col("user_id"), col("bucket"), col("is_gap"),
        col("close_ff"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}
