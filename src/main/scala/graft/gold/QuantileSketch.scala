package graft.gold

import graft.operators.ScalableRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: a deterministic bottom-k-by-hash row sample
  * (k rows with the smallest xxhash64 priority per group — a simple random
  * sample without replacement, but reproducible and ASSOCIATIVE: merging
  * two groups' sketches and re-taking the k smallest priorities yields
  * bit-identically the sketch of the union). This is the t-digest operating
  * mode — store a KB-sized state per day, answer month/total quantiles by
  * merging states — with exact-merge determinism instead of t-digest's
  * merge-order sensitivity. Complements `q_approx_quantiles` (per-group
  * one-shot estimates, nothing stored) and `q_user_percentiles` (exact,
  * full-sort): rollups here never re-scan raw rows.
  *
  * Scale shape: the sketch build is the two-phase grouped top-k on priority
  * (no per-group single-partition window); every merge works on stored
  * arrays of ≤k structs — days×k rows for a monthly rollup, independent of
  * raw cardinality. Estimates are type-1 (inverse-ECDF) quantiles of the
  * sample: exact whenever the group has ≤k rows, O(1/√k) SRS error beyond.
  */
object QuantileSketch {

  val DefaultK = 256

  /** Per-group sketch state: `qsk` = priority-sorted array of
    * struct(pri, key, v); `_key` is a SECOND independent hash of the row
    * key (Murmur3 vs the priority's xxhash64 — works for any key type,
    * unlike a numeric cast), so ties on priority still break
    * deterministically and the (pri, key) pair identifies the source row
    * for merge's replay dedup (a double collision is ~2^-96). Null values
    * are excluded up front (a null can neither rank nor estimate; counting
    * it would skew n_rows against the sample), the Profiling.robustScaler
    * convention. Rows are counted AFTER the filter so n_rows and the
    * sample describe the same population. */
  def sketch(df: DataFrame, groups: Seq[String], value: Column,
             rowKey: Column, k: Int = DefaultK): DataFrame = {
    val prioritized = df.select(groups.map(col) ++ Seq(
        xxhash64(rowKey).as("_pri"), hash(rowKey).cast("long").as("_key"),
        value.cast("double").as("_v")): _*)
      .filter(col("_v").isNotNull)
    val kept = ScalableRank.topKPerGroup(prioritized, groups.map(col),
      Seq(col("_pri").asc, col("_key").asc), k, "_qsr")
    // counts come from the pre-cut frame: one extra partial agg sharing the
    // same grouping, joined back at group grain (tiny)
    val counts = prioritized.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    kept.groupBy(groups.map(col): _*)
      .agg(sort_array(collect_list(struct(col("_pri"), col("_key"), col("_v"))))
        .as("qsk"))
      .join(counts, groups)
  }

  /** Merge sketch states to a coarser grain: flatten member arrays, keep
    * the k smallest (pri, key) entries. Associative and commutative by
    * construction — merge(merge(a,b),c) == sketch(a∪b∪c) bit for bit. */
  def merge(sketches: DataFrame, groups: Seq[String],
            k: Int = DefaultK): DataFrame =
    sketches.groupBy(groups.map(col): _*)
      .agg(
        // array_distinct: a (pri, key) entry identifies one source row, so
        // dropping exact duplicates makes the sample side of merge
        // idempotent under re-delivered inputs (no-op for disjoint row
        // sets, which never share a key)
        slice(array_sort(array_distinct(flatten(collect_list(col("qsk"))))), 1, k)
          .as("qsk"),
        sum(col("n_rows")).as("n_rows"))

  /** Type-1 (inverse-ECDF) quantile estimates from a sketch state: the
    * ceil(q·m)-th smallest sampled value. Deterministic; exact when
    * n_rows <= k. */
  def estimate(sketches: DataFrame, qs: Seq[(String, Double)]): DataFrame = {
    val vals = array_sort(transform(col("qsk"), x => x.getField("_v")))
    val m = size(col("qsk"))
    qs.foldLeft(sketches.withColumn("sample_size", m.cast("long")))(
        (df, q) => df.withColumn(q._1,
          element_at(vals, greatest(lit(1), ceil(lit(q._2) * m).cast("int")))))
      .drop("qsk")
  }
}
