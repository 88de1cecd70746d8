package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join via bin blocking — the non-equi join shape Spark
  * has no native strategy for (an interval×interval overlap predicate
  * alone plans as BroadcastNestedLoopJoin: a cross product at scale).
  *
  * Technique (the standard bin/overlap-join decomposition): every
  * interval explodes into the fixed-width time bins it covers, candidates
  * pair up through an ordinary EQUI-join on the bin key (hash shuffle,
  * AQE-skew-splittable, broadcastable — all the normal join machinery),
  * the true overlap predicate filters the candidates, and pair-grain
  * dedup removes the multi-bin double matches.
  *
  * Scale: work is Σ per-bin occupancy², not |L|×|R| — bin width is the
  * knob (too wide → fat bins; too narrow → explode amplification ≈
  * span/bin per row). Short intervals (sessions: minutes) with hour bins
  * explode ≤2×, and the join shuffles (interval id, bin) pairs only.
  */
object IntervalJoin {

  /** Co-active session pairs: users whose sessions overlap in time, with
    * the count of overlapping session pairs per user pair — the
    * "simultaneously active accounts" signal fraud ring detection starts
    * from. Input = Sessionize.sessionStats output. */
  def coActiveSessions(sessions: DataFrame, binUs: Long = 3600000000L): DataFrame = {
    def side(tag: String) = sessions
      .select(col("user_id").as(s"user_$tag"),
        col("session_idx").as(s"idx_$tag"),
        col("session_start_us").as(s"start_$tag"),
        col("session_end_us").as(s"end_$tag"))
      .withColumn(s"bin_$tag", explode(sequence(
        expr(s"start_$tag div ${binUs}L"), expr(s"end_$tag div ${binUs}L"))))
    side("a")
      .join(side("b"),
        col("bin_a") === col("bin_b") &&
          col("user_a") < col("user_b") &&
          col("start_a") <= col("end_b") && col("start_b") <= col("end_a"))
      // one hit per session PAIR no matter how many shared bins
      .select("user_a", "idx_a", "user_b", "idx_b").distinct()
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("overlap_count"))
  }
}
