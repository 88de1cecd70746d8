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
    graft.functions.GraftFunctions.register(df.sparkSession)
    val prioritized = df.select(groups.map(col) ++ Seq(
        xxhash64(rowKey).as("_pri"), hash(rowKey).cast("long").as("_key"),
        value.cast("double").as("_v")): _*)
      .filter(col("_v").isNotNull)
    // ONE partial-agged aggregation builds the whole state: the bounded
    // bottom-k aggregate (bottomk_qsk, a TypedImperativeAggregate) keeps
    // the k smallest (pri, key, v) triples per group map-side, so at most
    // k triples per group per task cross the exchange, and n_rows shares
    // the same exchange. Replaces two grouped-top-k window passes plus a
    // separate count aggregate joined back at group grain (guide §2.3
    // "aggregate before you shuffle"; measured 6.1 s → see
    // OPTIMIZATION_r13.md) — identical state bit for bit: the aggregate's
    // (pri, key, v) ordering is the same lexicographic struct order the
    // old sort_array emitted, and the old window path's (pri, key) cut
    // selects the same triples (a (pri, key) tie needs an xxhash64 AND a
    // murmur3 collision at once).
    prioritized.groupBy(groups.map(col): _*)
      .agg(expr(s"bottomk_qsk(_pri, _key, _v, $k)").as("qsk"),
        count(lit(1)).as("n_rows"))
  }

  /** Merge sketch states to a coarser grain: flatten member arrays, keep
    * the k smallest (pri, key) entries. Associative and commutative by
    * construction — merge(merge(a,b),c) == sketch(a∪b∪c) bit for bit. */
  def merge(sketches: DataFrame, groups: Seq[String],
            k: Int = DefaultK): DataFrame =
    sketches.groupBy(groups.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("qsk")))).as("_qsk_all"),
        sum(col("n_rows")).as("n_rows"))
      // adjacent-dedup on the SORTED array replaces array_distinct, which
      // is O(n²) struct compares and measured ~2 s of the q_quantile_sketch
      // wall at sf0.1 (84 months × ~1.9 k structs); same result — sorting
      // makes duplicates adjacent, so keeping each element whose
      // predecessor differs IS distinct-preserving-order. The dedup keeps
      // the sample side of merge idempotent under re-delivered inputs: a
      // (pri, key) entry identifies one source row (no-op for disjoint row
      // sets, which never share a key).
      .withColumn("qsk", slice(expr(
        "filter(_qsk_all, (x, i) -> i = 0 OR NOT (x <=> element_at(_qsk_all, i)))"),
        1, k))
      .select(groups.map(col) ++ Seq(col("qsk"), col("n_rows")): _*)

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
