package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles WITHOUT the unbounded aggregation buffer.
  *
  * Spark's exact `percentile` aggregate holds every group value in its
  * aggregation buffer (an in-memory counts map that also rides the
  * shuffle), so its memory grows with group size — the one aggregator
  * shape that cannot survive a group whose daily volume keeps growing.
  * This is the rank-based reformulation: sort each group once in a window
  * (WindowExec buffers per group in a spillable row array — disk-backed,
  * not heap-bound), keep only the rows sitting at the floor/ceil ranks any
  * requested percentile needs, and linearly interpolate those in an
  * ordinary bounded aggregation.
  *
  * Bit-exactness: positions and interpolation replicate Spark's
  * `Percentile.getPercentile` arithmetic — position = p * (n-1),
  * result = (ceil(pos) - pos) * lowerVal + (pos - floor(pos)) * higherVal
  * (value at pos when it is integral) — so results are bit-identical to
  * the built-in aggregate and to DuckDB's quantile_cont (SURVEY §4).
  *
  * Plan shape: ONE exchange on the group keys; the window sort covers the
  * percentiles, and because the frame stays partitioned on the keys, any
  * further groupBy(keys).agg(...) over `ranked`'s output — including the
  * caller's ordinary metrics — needs no second exchange. Callers fold their
  * non-percentile aggregates into the same post-window groupBy instead of
  * scanning the input twice.
  *
  * Precondition: the value column is non-null (both call sites clean
  * upstream; the built-in ignores nulls, a null here would shift ranks).
  */
object RankPercentile {

  val RankCol = "_pct_rn"
  val CountCol = "_pct_n"
  val ValueCol = "_pct_v"

  /** Augment with per-group rank, group size, and the double-cast value.
    * One exchange + one sort; everything downstream stays co-partitioned
    * on `keys`. */
  def ranked(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    df.withColumn(ValueCol, value.cast("double"))
      .withColumn(RankCol, row_number().over(part.orderBy(col(ValueCol))))
      .withColumn(CountCol, count(lit(1)).over(part))
  }

  private def position(p: Double): Column =
    lit(p) * (col(CountCol) - lit(1L)).cast("double")

  /** Keep only rows whose rank any of `ps` interpolates from — the frame
    * the caller aggregates. At most 2·|ps| rows per group survive. */
  def atNeededRanks(ranked: DataFrame, ps: Seq[Double]): DataFrame =
    ranked.filter(ps.map { p =>
      val pos = position(p)
      val rn = (col(RankCol) - lit(1L)).cast("double")
      rn === floor(pos) || rn === ceil(pos)
    }.reduce(_ || _))

  /** The percentile-p aggregate over a (filtered) ranked frame; use inside
    * groupBy(keys).agg(...). */
  def pct(p: Double): Column = {
    val rn = (col(RankCol) - lit(1L)).cast("double")
    val lowerVal = max(when(rn === floor(position(p)), col(ValueCol)))
    val higherVal = max(when(rn === ceil(position(p)), col(ValueCol)))
    // group-level position from the group size (constant within a group)
    val pos = lit(p) * (max(col(CountCol)) - lit(1L)).cast("double")
    when(floor(pos) === ceil(pos), lowerVal)
      .otherwise((ceil(pos) - pos) * lowerVal + (pos - floor(pos)) * higherVal)
  }
}
