package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the heavy-tail-safe
  * complement to [[Anomaly]]'s z-score screen: mean and stddev are
  * themselves dragged by the outliers they are supposed to find, while
  * the median absolute deviation has a 50% breakdown point (Hampel
  * 1974). Flag: |x − median| > k · 1.4826 · MAD, the standard
  * consistency-scaled rule (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD estimate σ
  * under normality).
  *
  * Cross-engine exactness: both medians are exact rank percentiles
  * (Spark `percentile` ↔ DuckDB `quantile_cont`, the SURVEY §4
  * contract); deviations are single IEEE subtractions of identical
  * doubles; the threshold compare is on identically-derived doubles.
  *
  * Scale shape: two (group)-keyed partial-agged exchanges (one per
  * median level) + one broadcast join of the per-group stats (group
  * cardinality-sized, constant for fixed dimensions) back onto the
  * fact scan. At 100 TB the exact percentile is the cost driver; the
  * mergeable-sketch alternative is `q_approx_quantiles` — this is the
  * exact-answer path.
  */
object Robust {

  // The two stats frames are group-cardinality-sized (KBs) but each
  // derives from a FULL fact scan — persisting them caps the query at
  // three fact scans (median pass, MAD pass, filter pass) instead of
  // re-deriving the median scan under every consumer.
  @volatile private var lastStats: List[DataFrame] = Nil
  def releaseCache(): Unit = {
    lastStats.foreach(_.unpersist(blocking = false))
    lastStats = Nil
  }

  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 3.0): DataFrame = {
    releaseCache()
    val groups = groupCols.map(col)
    val med = df.groupBy(groups: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deviated = df.join(broadcast(med), groupCols)
      .withColumn("abs_dev", abs(col(valueCol) - col("med")))
    val mad = deviated.groupBy(groups: _*)
      .agg(expr("percentile(abs_dev, 0.5)").as("mad"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastStats = List(med, mad)
    deviated.join(broadcast(mad), groupCols)
      .withColumn("threshold", lit(k) * lit(1.4826) * col("mad"))
      .filter(col("abs_dev") > col("threshold"))
  }
}
