package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** Kaplan–Meier survival estimator (Kaplan & Meier 1958) on
  * repeat-purchase time — the principled version of the retention-cohort
  * question: "what fraction of new customers have NOT yet reordered by
  * day t", with single-order customers correctly treated as CENSORED at
  * the observation horizon instead of silently dropped or counted as
  * never-returning (either naive choice biases retention, which is why
  * survival analysis exists).
  *
  * Per customer: duration = days from first to second order (event) or
  * to the corpus horizon (censored, the deterministic CURRENT_DATE
  * analog). Per segment, at each event time t_i:
  * S(t_i) = Π_{j≤i} (1 − d_j / n_j), n_j = at-risk before t_j.
  *
  * Scale shape: the corpus collapses to ONE row per customer (first two
  * order dates via the two-phase grouped top-k — never a per-customer
  * window over the full order history), then to (segment, duration)
  * counts; each segment's event-time table is a single row of
  * DURATION-bounded arrays, and the KM recursion runs as row-local HOF
  * folds (prefix integer sums for the risk sets, a left-to-right double
  * product for the survival curve — O(T²) arithmetic on ≤ a few hundred
  * distinct durations, no iterative jobs). The double product is the
  * same IEEE left fold in Spark `aggregate` and DuckDB `list_reduce`,
  * so the curve is hash-exact — no libm, no approximation. */
object Survival {

  def kaplanMeier(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dated = orders.select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
    val firstTwo = ScalableRank.topKPerGroup(dated, Seq(col("o_custkey")),
        Seq(col("d").asc, col("o_orderkey").asc), k = 2, rankCol = "rk")
      .groupBy("o_custkey")
      .agg(min(when(col("rk") === 1, col("d"))).as("d1"),
        min(when(col("rk") === 2, col("d"))).as("d2"))
    val horizon = orders.agg(max(to_date(col("o_orderdate"))).as("h"))
    val durations = firstTwo
      .crossJoin(broadcast(horizon))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("segment")), "o_custkey")
      .select(col("segment"),
        when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
          .otherwise(datediff(col("h"), col("d1"))).cast("long").as("t"),
        when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))

    val counts = durations.groupBy("segment", "t")
      .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
    // At-risk counts at ROW grain via the grouped prefix-sum primitive
    // (n_j = N_seg − everyone who left at earlier times), and the KM
    // factor per row — so the per-segment array below is MATERIALIZED
    // data, not a derived expression (a derived array referenced inside
    // a fold lambda is re-evaluated per element — O(T⁴) blowup; a
    // materialized struct array folds in O(T²) total).
    val withBefore = ScalableRank.withGroupedPrefixSum(
      counts, col("segment"), Seq(col("t").asc), col("d") + col("c"), "left_before")
    val totals = counts.groupBy("segment")
      .agg(sum(col("d") + col("c")).as("n_total"))
    val rows = withBefore.join(broadcast(totals), "segment")
      .withColumn("n", col("n_total") - col("left_before"))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n").cast("double"))
    rows.groupBy("segment")
      .agg(array_sort(collect_list(struct(
        col("t"), col("d"), col("c"), col("n"), col("factor")))).as("s"))
      .withColumn("out", expr(
        """transform(sequence(1, size(s)), i -> struct(
          |  element_at(s, i).t AS t_days,
          |  element_at(s, i).n AS n_risk,
          |  element_at(s, i).d AS n_events,
          |  element_at(s, i).c AS n_censored,
          |  aggregate(slice(s, 1, i), CAST(1.0 AS DOUBLE),
          |    (a, x) -> a * x.factor) AS survival))""".stripMargin))
      .select(col("segment"), explode(col("out")).as("r"))
      // KM curves step only at EVENT times; censor-only times carry no step
      .filter(col("r.n_events") > 0)
      .select(col("segment"), col("r.t_days").as("t_days"),
        col("r.n_risk").as("n_risk"), col("r.n_events").as("n_events"),
        col("r.n_censored").as("n_censored"),
        col("r.survival").as("survival"))
      .orderBy("segment", "t_days")
  }

  /** Nelson–Aalen cumulative-hazard estimator (Nelson 1972; Aalen 1978)
    * on the same repeat-purchase durations as [[kaplanMeier]]:
    * H(t_i) = Σ_{j≤i} d_j/n_j with variance Σ d_j/n_j² — the additive
    * dual of the KM product (S ≈ e^−H), preferred when hazard
    * INCREMENTS are the business question ("how does reorder pressure
    * evolve week over week") and the natural input to hazard-ratio
    * eyeballing between segments.
    *
    * Exactness: each step d_j/n_j micro-quantizes by integer floor
    * division BEFORE the cumulative sum, so the running hazard is an
    * exact integer prefix sum (no IEEE accumulation); same for the
    * variance steps at d_j/n_j². Both cumulative micro sums ride ONE
    * packed prefix pass — safe at any corpus size because Σ d_j/n_j is
    * harmonically bounded (≤ ln N + 1 ≈ 22 nats at N = 10⁹ ⇒ ≤ ~2·10⁷
    * micro-units, far under the 2³¹ packing lane) and the variance sum
    * is dominated by it. Scale: identical shape to KM's count
    * stage — customer-grain collapse, (segment, t) counts, grouped
    * prefix sums; no per-segment array fold is even needed (the NA
    * recursion is additive). */
  def nelsonAalen(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dated = orders.select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
    val firstTwo = ScalableRank.topKPerGroup(dated, Seq(col("o_custkey")),
        Seq(col("d").asc, col("o_orderkey").asc), k = 2, rankCol = "rk")
      .groupBy("o_custkey")
      .agg(min(when(col("rk") === 1, col("d"))).as("d1"),
        min(when(col("rk") === 2, col("d"))).as("d2"))
    val horizon = orders.agg(max(to_date(col("o_orderdate"))).as("h"))
    val durations = firstTwo
      .crossJoin(broadcast(horizon))
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("segment")), "o_custkey")
      .select(col("segment"),
        when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
          .otherwise(datediff(col("h"), col("d1"))).cast("long").as("t"),
        when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))
    val counts = durations.groupBy("segment", "t")
      .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
    val withBefore = ScalableRank.withGroupedPrefixSum(
      counts, col("segment"), Seq(col("t").asc), col("d") + col("c"),
      "left_before")
    val totals = counts.groupBy("segment")
      .agg(sum(col("d") + col("c")).as("n_total"))
    val steps = withBefore.join(broadcast(totals), "segment")
      .withColumn("n", col("n_total") - col("left_before"))
      .withColumn("h_micro", expr("(d * 1000000) div n"))
      .withColumn("v_micro", expr("(d * 1000000) div (n * n)"))
    ScalableRank.withGroupedPrefixSum(steps, col("segment"),
        Seq(col("t").asc),
        col("h_micro") * lit(1L << 31) + col("v_micro"), "_cum_packed")
      .withColumn("cum_h",
        shiftright(col("_cum_packed"), 31) + col("h_micro"))
      .withColumn("cum_v",
        col("_cum_packed").bitwiseAND(lit((1L << 31) - 1)) + col("v_micro"))
      .filter(col("d") > 0)
      .select(col("segment"), col("t").as("t_days"), col("n").as("n_risk"),
        col("d").as("n_events"),
        (col("cum_h").cast("double") / lit(1000000.0)).as("na_hazard"),
        (col("cum_v").cast("double") / lit(1000000.0)).as("na_variance"))
      .orderBy("segment", "t_days")
  }

  /** DuckDB mirror of [[nelsonAalen]]. */
  def nelsonAalenOracleSql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS rk
      |  FROM orders
      |), ft AS (
      |  SELECT o_custkey,
      |    min(CASE WHEN rk = 1 THEN d END) AS d1,
      |    min(CASE WHEN rk = 2 THEN d END) AS d2
      |  FROM ranked GROUP BY 1
      |), hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders
      |), dur AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
      |      ELSE date_diff('day', d1, h) END AS BIGINT) AS t,
      |    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM ft JOIN customer c ON ft.o_custkey = c.c_custkey CROSS JOIN hz
      |), counts AS (
      |  SELECT segment, t, CAST(sum(e) AS BIGINT) AS d,
      |    CAST(sum(1 - e) AS BIGINT) AS c
      |  FROM dur GROUP BY 1, 2
      |), rowsn AS (
      |  SELECT segment, t, d,
      |    CAST(sum(d + c) OVER (PARTITION BY segment) AS BIGINT)
      |      - CAST(COALESCE(sum(d + c) OVER (PARTITION BY segment ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS n
      |  FROM counts
      |), steps AS (
      |  SELECT segment, t, d, n,
      |    (d * 1000000) // n AS h_micro,
      |    (d * 1000000) // (n * n) AS v_micro
      |  FROM rowsn
      |), cum AS (
      |  SELECT segment, t, d, n,
      |    CAST(sum(h_micro) OVER (PARTITION BY segment ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_h,
      |    CAST(sum(v_micro) OVER (PARTITION BY segment ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_v
      |  FROM steps
      |)
      |SELECT segment, t AS t_days, n AS n_risk, d AS n_events,
      |  CAST(cum_h AS DOUBLE) / 1000000.0 AS na_hazard,
      |  CAST(cum_v AS DOUBLE) / 1000000.0 AS na_variance
      |FROM cum WHERE d > 0
      |ORDER BY segment, t_days""".stripMargin

  /** Two-arm log-rank test (Mantel 1966; Peto & Peto 1972) on the same
    * repeat-purchase durations as [[kaplanMeier]] — "do the two arms'
    * survival curves differ?", the inferential sibling of the KM plot.
    * Arms by customer parity (the Experiment-family stand-in). At each
    * pooled event time t: observed arm-A events d1, expectation under
    * H₀ E1 = d·n1/n, hypergeometric variance
    * V = d·n1·n2·(n−d) / (n²·(n−1)); then z = (O1 − E1)/√ΣV and the
    * χ² = z² statistic, with the two-sided p from the shared A&S
    * normal-CDF polynomial.
    *
    * Exactness (§4): EVERY per-time term is an exact integer — E1 and V
    * micro-quantize via DECIMAL floor DIVISION (never an IEEE divide),
    * so their sums are exact; z/χ²/p are one final mirrored IEEE chain.
    * Times with n ≤ 1 contribute zero variance (the d = n edge would
    * divide by zero). Scale: one customer-grain collapse (grouped
    * top-2), a (t)-grain pivot, ONE packed prefix sum for both arms'
    * at-risk counts (the DeLong packing trick), a 1-row output. */
  def logRank(orders: DataFrame): DataFrame = {
    val dated = orders.select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
    val firstTwo = ScalableRank.topKPerGroup(dated, Seq(col("o_custkey")),
        Seq(col("d").asc, col("o_orderkey").asc), k = 2, rankCol = "rk")
      .groupBy("o_custkey")
      .agg(min(when(col("rk") === 1, col("d"))).as("d1"),
        min(when(col("rk") === 2, col("d"))).as("d2"))
    val horizon = orders.agg(max(to_date(col("o_orderdate"))).as("h"))
    val durations = firstTwo
      .crossJoin(broadcast(horizon))
      .select(
        when(col("o_custkey") % 2 === 0, lit("A")).otherwise(lit("B")).as("arm"),
        when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
          .otherwise(datediff(col("h"), col("d1"))).cast("long").as("t"),
        when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L)).as("e"))

    val byTime = durations.groupBy("t").agg(
      sum(when(col("arm") === "A", col("e")).otherwise(lit(0L))).as("d1t"),
      sum(when(col("arm") === "A", lit(1L) - col("e")).otherwise(lit(0L))).as("c1t"),
      sum(when(col("arm") === "B", col("e")).otherwise(lit(0L))).as("d2t"),
      sum(when(col("arm") === "B", lit(1L) - col("e")).otherwise(lit(0L))).as("c2t"))
    // both arms' running leave-counts in ONE packed prefix pass
    val packed = ScalableRank.withGroupedPrefixSum(
        byTime, lit(0L), Seq(col("t").asc),
        (col("d1t") + col("c1t")) * lit(1L << 31) + col("d2t") + col("c2t"),
        "_cum_packed")
      .withColumn("_cum1", shiftright(col("_cum_packed"), 31))
      .withColumn("_cum2", col("_cum_packed").bitwiseAND(lit((1L << 31) - 1)))
    val armTotals = durations.groupBy().agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n1_total"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n2_total"))
    val dec = "decimal(38,0)"
    val terms = packed.crossJoin(broadcast(armTotals))
      .withColumn("n1", col("n1_total") - col("_cum1"))
      .withColumn("n2", col("n2_total") - col("_cum2"))
      .withColumn("nt", col("n1") + col("n2"))
      .withColumn("dt", col("d1t") + col("d2t"))
      .filter(col("dt") > 0L)
      // exact micro terms by DECIMAL floor DIVISION — no IEEE until the
      // final scalar chain. Numerator bound: dt·n1·n2·(nt−dt)·10⁶ stays
      // inside DECIMAL(38,0) through ~10⁷-customer arms — far past any
      // single cohort slice.
      .withColumn("e1_micro", expr(
        s"CAST((CAST(dt AS $dec) * CAST(n1 AS $dec) * 1000000) div " +
          s"CAST(nt AS $dec) AS BIGINT)"))
      .withColumn("v_micro", expr(
        s"""CASE WHEN nt > 1 THEN
           |  CAST((CAST(dt AS $dec) * CAST(n1 AS $dec) * CAST(n2 AS $dec)
           |        * CAST(nt - dt AS $dec) * 1000000) div
           |       (CAST(nt AS $dec) * CAST(nt AS $dec) * CAST(nt - 1 AS $dec))
           |    AS BIGINT)
           |ELSE CAST(0 AS BIGINT) END""".stripMargin))
    val agg = terms.crossJoin(broadcast(armTotals.select(
        col("n1_total").as("n_a"), col("n2_total").as("n_b"))))
      .groupBy("n_a", "n_b")
      .agg(count(lit(1)).as("n_event_times"),
        sum(col("d1t")).as("o1"),
        sum(col("e1_micro")).as("_e1m"),
        sum(col("v_micro")).as("_vm"))
    agg
      .withColumn("e1", col("_e1m").cast("double") / lit(1000000.0))
      .withColumn("v", col("_vm").cast("double") / lit(1000000.0))
      .withColumn("z", when(col("v") > 0.0,
        (col("o1").cast("double") - col("e1")) / sqrt(col("v"))))
      .withColumn("chi2", col("z") * col("z"))
      .withColumn("az", abs(col("z")))
      .withColumn("t", expr(graft.gold.Drift.TSql))
      .withColumn("p_two",
        when(col("z").isNotNull, expr(graft.gold.Drift.TwoSidedPSql)))
      .select("n_a", "n_b", "n_event_times", "o1", "e1", "v", "z", "chi2",
        "p_two")
  }

  /** DuckDB mirror of [[logRank]]. */
  def logRankOracleSql: String =
    s"""WITH ranked AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
       |    row_number() OVER (PARTITION BY o_custkey
       |      ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS rk
       |  FROM orders
       |), ft AS (
       |  SELECT o_custkey,
       |    min(CASE WHEN rk = 1 THEN d END) AS d1,
       |    min(CASE WHEN rk = 2 THEN d END) AS d2
       |  FROM ranked GROUP BY 1
       |), hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders
       |), dur AS (
       |  SELECT CASE WHEN o_custkey % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
       |    CAST(CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
       |      ELSE date_diff('day', d1, h) END AS BIGINT) AS t,
       |    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e
       |  FROM ft CROSS JOIN hz
       |), bt AS (
       |  SELECT t,
       |    CAST(sum(CASE WHEN arm = 'A' THEN e ELSE 0 END) AS BIGINT) AS d1t,
       |    CAST(sum(CASE WHEN arm = 'A' THEN 1 - e ELSE 0 END) AS BIGINT) AS c1t,
       |    CAST(sum(CASE WHEN arm = 'B' THEN e ELSE 0 END) AS BIGINT) AS d2t,
       |    CAST(sum(CASE WHEN arm = 'B' THEN 1 - e ELSE 0 END) AS BIGINT) AS c2t
       |  FROM dur GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1_total,
       |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2_total
       |  FROM dur
       |), risk AS (
       |  SELECT t, d1t, d2t,
       |    n1_total - CAST(coalesce(sum(d1t + c1t) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
       |    n2_total - CAST(coalesce(sum(d2t + c2t) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2,
       |    n1_total, n2_total
       |  FROM bt CROSS JOIN tot
       |), terms AS (
       |  SELECT n1_total AS n_a, n2_total AS n_b, d1t, d2t,
       |    n1, n2, n1 + n2 AS nt, d1t + d2t AS dt
       |  FROM risk WHERE d1t + d2t > 0
       |), micro AS (
       |  SELECT n_a, n_b, d1t,
       |    CAST((CAST(dt AS HUGEINT) * n1 * 1000000) // nt AS BIGINT) AS e1_micro,
       |    CASE WHEN nt > 1 THEN
       |      CAST((CAST(dt AS HUGEINT) * n1 * n2 * (nt - dt) * 1000000)
       |        // (CAST(nt AS HUGEINT) * nt * (nt - 1)) AS BIGINT)
       |    ELSE 0 END AS v_micro
       |  FROM terms
       |), ag AS (
       |  SELECT n_a, n_b, CAST(count(*) AS BIGINT) AS n_event_times,
       |    CAST(sum(d1t) AS BIGINT) AS o1,
       |    CAST(sum(e1_micro) AS BIGINT) AS e1m,
       |    CAST(sum(v_micro) AS BIGINT) AS vm
       |  FROM micro GROUP BY 1, 2
       |), f AS (
       |  SELECT n_a, n_b, n_event_times, o1,
       |    CAST(e1m AS DOUBLE) / 1000000.0 AS e1,
       |    CAST(vm AS DOUBLE) / 1000000.0 AS v
       |  FROM ag
       |), zc AS (
       |  SELECT *, CASE WHEN v > 0 THEN
       |    (CAST(o1 AS DOUBLE) - e1) / sqrt(v) END AS z
       |  FROM f
       |), pz AS (
       |  SELECT *, abs(z) AS az, ${graft.gold.Drift.TSql} AS t FROM zc
       |)
       |SELECT n_a, n_b, n_event_times, o1, e1, v, z, z * z AS chi2,
       |  CASE WHEN z IS NOT NULL THEN ${graft.gold.Drift.TwoSidedPSql} END AS p_two
       |FROM pz""".stripMargin

  /** DuckDB mirror of [[kaplanMeier]] — list_reduce with prepended
    * identities is the same left fold as Spark's aggregate. */
  def oracleSql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS rk
      |  FROM orders
      |), ft AS (
      |  SELECT o_custkey,
      |    min(CASE WHEN rk = 1 THEN d END) AS d1,
      |    min(CASE WHEN rk = 2 THEN d END) AS d2
      |  FROM ranked GROUP BY 1
      |), hz AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders
      |), dur AS (
      |  SELECT c.c_mktsegment AS segment,
      |    CAST(CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
      |      ELSE date_diff('day', d1, h) END AS BIGINT) AS t,
      |    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM ft JOIN customer c ON ft.o_custkey = c.c_custkey CROSS JOIN hz
      |), counts AS (
      |  SELECT segment, t, CAST(sum(e) AS BIGINT) AS d,
      |    CAST(sum(1 - e) AS BIGINT) AS c
      |  FROM dur GROUP BY 1, 2
      |), rowsn AS (
      |  SELECT segment, t, d, c,
      |    CAST(sum(d + c) OVER (PARTITION BY segment) AS BIGINT)
      |      - CAST(COALESCE(sum(d + c) OVER (PARTITION BY segment ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS n
      |  FROM counts
      |), withf AS (
      |  SELECT segment, t, d, c, n,
      |    CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS factor
      |  FROM rowsn
      |), seg AS (
      |  SELECT segment,
      |    list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
      |    list(c ORDER BY t) AS cs, list(n ORDER BY t) AS ns,
      |    list(factor ORDER BY t) AS fs
      |  FROM withf GROUP BY 1
      |), rows_ AS (
      |  SELECT segment,
      |    unnest(list_transform(range(1, len(ts) + 1), i -> struct_pack(
      |      t_days := ts[i], n_risk := ns[i], n_events := ds[i],
      |      n_censored := cs[i],
      |      survival := list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fs[1:i]),
      |        (a, x) -> a * x)))) AS r
      |  FROM seg
      |)
      |SELECT segment, r.t_days AS t_days, r.n_risk AS n_risk,
      |  r.n_events AS n_events, r.n_censored AS n_censored,
      |  r.survival AS survival
      |FROM rows_ WHERE r.n_events > 0
      |ORDER BY segment, t_days""".stripMargin
}
