package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB path for distinct
  * counts and quantiles. Exact countDistinct shuffles every key; the HLL
  * pipeline pre-aggregates a fixed-size sketch per partition/day and
  * merges sketches at query time (classic lambda/medallion pattern:
  * sketches are stored in the gold layer and re-aggregated along any
  * dimension without touching raw data).
  *
  * Results are engine-specific (DataSketches HLL), so these are rows-only
  * queries; SketchesSpec bounds their error against exact answers.
  */
object Sketches {

  /** Per-day user sketches + estimate (what gold would persist). */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("event_date"), col("user_id"))
      .groupBy(col("event_date"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("user_sketch"),
        count(lit(1)).as("event_count"))
      .select(col("event_date"),
        hll_sketch_estimate(col("user_sketch")).as("approx_users"),
        col("event_count"))

  /** Merge daily sketches to total distinct users — no rescan of events
    * (the re-aggregation step that makes sketches worth storing). */
  def mergedDistinctUsers(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("event_date"), col("user_id"))
      .groupBy(col("event_date"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("user_sketch"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
        .as("approx_total_users"))

  /** Sketch rollup along a dimension hierarchy: sketches built ONCE at
    * (day, event_type) grain, then merged upward through a ROLLUP —
    * per-type totals and the grand total come from sketch unions, never a
    * rescan of events. This is the property that makes stored sketches a
    * gold-layer primitive at 100 TB: any coarser grouping in the
    * hierarchy is a merge of already-aggregated fixed-size states. */
  def sketchRollup(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("date").as("event_date"), col("event_type"),
        col("user_id"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("user_sketch"))
      .rollup(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
        .as("approx_users"))
      .select(coalesce(col("event_type"), lit("__total__")).as("event_type"),
        col("approx_users"))

  /** Approximate quantiles per group (percentile_approx with bounded
    * accuracy parameter — mergeable, single-pass). */
  def approxOrderQuantiles(cleanOrders: DataFrame): DataFrame =
    cleanOrders
      .groupBy(col("status_normalized"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx_p50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(1000)).as("approx_p95"),
        count(lit(1)).as("order_count"))

  /** Daily audience OVERLAP via KMV sketches (functions/KmvSketch.scala):
    * distinct purchasers, distinct error users, their union and their
    * INTERSECTION — the set operation the HLL queries above cannot answer
    * (HLL unions only; "purchasers who also hit errors" needs a sketch
    * family closed under intersection). One scan builds both per-day
    * sketches from conditional inputs; every estimate then composes from
    * the two fixed-size arrays — stored in gold, any audience pair is
    * answerable later without rescanning events. Deterministic (seedless
    * xxhash64), so rows-only results are stable; SketchesSpec bounds the
    * error against exact intersections. */
  def audienceOverlap(events: DataFrame, k: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    import graft.functions.Kmv
    events
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("ts").cast("date").as("event_date"), col("event_type"),
        col("user_id"))
      .groupBy(col("event_date"))
      .agg(
        expr(s"kmv_sketch(CASE WHEN event_type = 'purchase' THEN user_id END, $k)")
          .as("purchasers"),
        expr(s"kmv_sketch(CASE WHEN event_type = 'error' THEN user_id END, $k)")
          .as("error_users"))
      .select(col("event_date"),
        Kmv.estimate(col("purchasers"), k).as("approx_purchasers"),
        Kmv.estimate(col("error_users"), k).as("approx_error_users"),
        Kmv.unionEstimate(col("purchasers"), col("error_users"), k)
          .as("approx_either"),
        Kmv.intersectEstimate(col("purchasers"), col("error_users"), k)
          .as("approx_both"))
  }

  /** Daily "A but not B" audiences from the same per-day sketch pair —
    * purchasers who hit no error and error-only users, the exclusion
    * segments a remarketing/fraud split needs (KMV difference via
    * inclusion–exclusion over one shared union sample; HLL cannot answer
    * this either). Identical scan/sketch shape to [[audienceOverlap]]. */
  def audienceDifference(events: DataFrame, k: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    import graft.functions.Kmv
    events
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("ts").cast("date").as("event_date"), col("event_type"),
        col("user_id"))
      .groupBy(col("event_date"))
      .agg(
        expr(s"kmv_sketch(CASE WHEN event_type = 'purchase' THEN user_id END, $k)")
          .as("purchasers"),
        expr(s"kmv_sketch(CASE WHEN event_type = 'error' THEN user_id END, $k)")
          .as("error_users"))
      .select(col("event_date"),
        Kmv.differenceEstimate(col("purchasers"), col("error_users"), k)
          .as("approx_purchase_only"),
        Kmv.differenceEstimate(col("error_users"), col("purchasers"), k)
          .as("approx_error_only"))
  }

  /** Total-period audience overlap from DAILY sketches via kmv_merge_agg —
    * the re-aggregation that makes persisting KMV sketches in gold
    * worthwhile (hll_union_agg's role for HLL, but closed under
    * intersection too): daily fixed-size states merge to the period
    * total; events are scanned exactly once, at daily grain. */
  def totalAudienceOverlap(events: DataFrame, k: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    import graft.functions.Kmv
    events
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("ts").cast("date").as("event_date"), col("event_type"),
        col("user_id"))
      .groupBy(col("event_date")) // the daily-grain sketches gold would store
      .agg(
        expr(s"kmv_sketch(CASE WHEN event_type = 'purchase' THEN user_id END, $k)")
          .as("purchasers"),
        expr(s"kmv_sketch(CASE WHEN event_type = 'error' THEN user_id END, $k)")
          .as("error_users"))
      .agg(
        expr(s"kmv_merge_agg(purchasers, $k)").as("purchasers"),
        expr(s"kmv_merge_agg(error_users, $k)").as("error_users"))
      .select(
        Kmv.estimate(col("purchasers"), k).as("approx_purchasers"),
        Kmv.estimate(col("error_users"), k).as("approx_error_users"),
        Kmv.intersectEstimate(col("purchasers"), col("error_users"), k)
          .as("approx_both"))
  }

  /** Point-frequency probes over a count-min sketch of the token stream
    * (functions/CmsSketch.scala): per-lang sketches — the grain gold
    * would persist — merge via cms_merge_agg to a corpus total, which a
    * literal probe list then queries with pure built-in hash/array
    * functions ([[graft.functions.Cms.pointEstimate]]). This answers the
    * frequency question Misra–Gries cannot: ANY token's count, not just
    * the retained head, from O(depth·width) state per task instead of a
    * vocab-sized shuffle. Deterministic (seedless xxhash64) → stable
    * rows-only results; SketchesSpec proves never-undercount and the
    * e·N/width ceiling against the exact counts. */
  /** CMS join-cardinality estimate (Cormode–Muthukrishnan's inner-product
    * estimator — the AQE-planner question "how big is this join going to
    * be" answered from O(depth·width) state instead of a key-grain
    * exchange): for the skew-sensitive self-equi-join on `keyCol`,
    * |R ⋈ R| = Σ_k c(k)², estimated per sketch row d as Σ_j counter²
    * and min'd over rows. Colliding keys only ADD positive cross terms,
    * so the estimate NEVER undercounts — the safe direction for a
    * planner deciding broadcast vs shuffle (it may over-provision,
    * never under). The exact count rides along purely to grade the
    * estimate (the q_knn_recall pattern); a planner would use the
    * sketch alone, map-side, with no exchange at all.
    *
    * Rows-only by design: the sketch aggregate is not SQL-expressible
    * in the oracle engine (same class as q_cms_freq); SketchesSpec binds
    * est ≥ exact and the collision ceiling. */
  def joinSizeEstimate(rel: DataFrame, keyCol: String,
                       depth: Int = 4, width: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.register(rel.sparkSession)
    val sketch = rel.select(col(keyCol).as("k"))
      .agg(expr(s"cms_sketch(k, $depth, $width)").as("sk"))
    // per-row self-inner-product Σ_j counter²; min over depth rows
    val perRow = (0 until depth).map { d =>
      expr(s"aggregate(slice(sk, ${2 + d * width}, $width), 0L, (acc, x) -> acc + x * x)")
    }
    val est = sketch.select(
      array_min(array(perRow: _*)).as("est_join_size"),
      element_at(col("sk"), 1).as("n_rows"))
    val exact = rel.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_join_size"))
    est.crossJoin(broadcast(exact))
      .select(
        lit(keyCol).as("join_key"), col("n_rows"),
        col("est_join_size"), col("exact_join_size"),
        (col("est_join_size").cast("double") / col("exact_join_size"))
          .as("overcount_ratio"),
        lit(depth).as("depth"), lit(width).as("width"))
  }

  def tokenFrequencyProbes(documents: DataFrame, probes: Seq[String],
                           depth: Int = 4, width: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    import graft.functions.Cms
    val total = documents
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang")) // the per-lang sketches gold would store
      .agg(expr(s"cms_sketch(token, $depth, $width)").as("sketch"))
      .agg(expr(s"cms_merge_agg(sketch, $depth, $width)").as("sketch"))
    total
      .select(col("sketch"), explode(typedlit(probes)).as("token"))
      .select(col("token"),
        Cms.pointEstimate(col("sketch"), col("token"), depth, width)
          .as("count_est"),
        Cms.totalMass(col("sketch")).as("total_tokens"),
        Cms.errorCeiling(col("sketch"), width).as("err_ceiling"))
  }
}
