package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two time periods — the batch
  * analog of the reference's model-monitoring panel (the Grafana System
  * Health row tracks score drift between deploys; monitoring tools like
  * Evidently compute exactly these binned statistics).
  *
  * Everything is computed from exact integer bin counts in ONE
  * partial-agged scan of the fact table; the per-bin frame that the
  * divergence math runs over has `bins` rows (a constant, never
  * data-bound), so its partition-less windows are bounded by construction
  * — same contract as ScalableRank's offsets frame. Doubles appear only
  * downstream of exact integers (ln / division are IEEE-identical on
  * identical inputs, SURVEY §4).
  *
  * Emitted per bin:
  *  - PSI term (p−q)·ln(p/q) with add-one (Laplace) smoothing so empty
  *    bins stay finite — Σ terms is the Population Stability Index
  *    (>0.2 = major shift by the usual rule of thumb);
  *  - chi-square terms for both periods against the pooled expectation
  *    (homogeneity test);
  *  - the binned-ECDF gap |F_a − F_b| whose max over bins is the binned
  *    Kolmogorov–Smirnov statistic.
  */
object Drift {

  /** Per-bin drift stats. `binCol` must be a low-cardinality bin label,
    * `binOrd` its ordinal for the ECDF ordering, `inA` the period-A
    * predicate (period B = ¬A).
    */
  def binnedDrift(df: DataFrame, binCol: Column, binOrd: Column,
                  inA: Column, bins: Int): DataFrame = {
    val counts = df
      .groupBy(binCol.as("bin"), binOrd.as("bin_ord"))
      .agg(
        sum(when(inA, 1L).otherwise(0L)).cast("long").as("cnt_a"),
        sum(when(inA, 0L).otherwise(1L)).cast("long").as("cnt_b"))
    // `counts` has at most `bins` rows: these windows are over a
    // constant-size frame, not the data.
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("bin_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts
      .withColumn("tot_a", sum(col("cnt_a")).over(wAll))
      .withColumn("tot_b", sum(col("cnt_b")).over(wAll))
      .withColumn("cum_a", sum(col("cnt_a")).over(wCum))
      .withColumn("cum_b", sum(col("cnt_b")).over(wCum))
    val pA = (col("cnt_a") + lit(1L)).cast("double") /
      (col("tot_a") + lit(bins.toLong)).cast("double")
    val pB = (col("cnt_b") + lit(1L)).cast("double") /
      (col("tot_b") + lit(bins.toLong)).cast("double")
    val expA = (col("cnt_a") + col("cnt_b")).cast("double") *
      col("tot_a").cast("double") / (col("tot_a") + col("tot_b")).cast("double")
    val expB = (col("cnt_a") + col("cnt_b")).cast("double") *
      col("tot_b").cast("double") / (col("tot_a") + col("tot_b")).cast("double")
    tot
      .withColumn("share_a", col("cnt_a").cast("double") / col("tot_a"))
      .withColumn("share_b", col("cnt_b").cast("double") / col("tot_b"))
      .withColumn("psi_term", (pA - pB) * log(pA / pB))
      .withColumn("chi2_term",
        (col("cnt_a").cast("double") - expA) * (col("cnt_a").cast("double") - expA) / expA +
          (col("cnt_b").cast("double") - expB) * (col("cnt_b").cast("double") - expB) / expB)
      .withColumn("ecdf_gap",
        abs(col("cum_a").cast("double") / col("tot_a") -
          col("cum_b").cast("double") / col("tot_b")))
      .select("bin", "bin_ord", "cnt_a", "cnt_b", "share_a", "share_b",
        "psi_term", "chi2_term", "ecdf_gap")
      .orderBy("bin_ord")
  }

  /** Amount-tier ordinal shared with the oracle SQL. */
  def tierOrd(tier: Column): Column =
    when(tier === "micro", 0).when(tier === "low", 1)
      .when(tier === "medium", 2).when(tier === "high", 3)
      .otherwise(4).cast("long")

  /** Mann–Whitney U two-sample test (Mann & Whitney 1947) — the UNBINNED
    * companion to [[binnedDrift]]: has the distribution of a numeric
    * column shifted between two periods, judged on exact ranks with the
    * tie-corrected normal approximation. Binned PSI/KS need a bin design;
    * this needs nothing and sees pure location shifts the bin grid can
    * blur.
    *
    * Exactness (§4): the doubled-midrank machinery of the AUC family —
    * 2U = Σ_A h2 − m(m+1) is an exact BIGINT; the tie term Σ(t³−t) is an
    * exact decimal sum; μ, the tie-corrected σ, z, and the rank-biserial
    * effect size are one mirrored IEEE chain. All-tied inputs (σ = 0)
    * report NULL z instead of trapping.
    *
    * Scale: one value-grain partial-agged groupBy, one distributed prefix
    * sum over the collapsed frame, a 1-row output. */
  def mannWhitney(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val rows = df.select(value.as("_v"), inA.cast("long").as("_a"))
    val g = rows.groupBy("_v")
      .agg(count(lit(1)).as("_cnt"), sum(col("_a")).cast("long").as("_ca"))
    val c = graft.operators.ScalableRank.withGroupedPrefixSum(
      g, lit(0L), Seq(col("_v").asc), col("_cnt"), "_cum")
    val h = c.withColumn("h2", lit(2L) * col("_cum") + col("_cnt") + lit(1L))
    val agg = h.agg(
        sum(col("_ca")).cast("long").as("m"),
        sum(col("_cnt") - col("_ca")).cast("long").as("n"),
        sum(col("_ca") * col("h2")).cast("long").as("_r2a"),
        sum((col("_cnt").cast("decimal(19,0)") * col("_cnt") * col("_cnt") -
          col("_cnt")).cast("decimal(38,0)")).cast("decimal(38,0)").as("_ties"))
      .select(col("m"), col("n"),
        (col("_r2a") - col("m") * (col("m") + lit(1L))).as("u2"), col("_ties"))
    val mD = col("m").cast("double")
    val nD = col("n").cast("double")
    val bigN = (col("m") + col("n")).cast("double")
    agg
      .withColumn("u", col("u2").cast("double") / lit(2.0))
      .withColumn("mu", mD * nD / lit(2.0))
      .withColumn("sigma", sqrt(mD * nD / lit(12.0) *
        ((bigN + lit(1.0)) - col("_ties").cast("double") /
          (bigN * (bigN - lit(1.0))))))
      .withColumn("z", when(col("sigma") > 0.0,
        (col("u") - col("mu")) / col("sigma"))
        .otherwise(lit(null).cast("double")))
      .withColumn("rank_biserial", lit(2.0) * (col("u") / (mD * nD)) - lit(1.0))
      .select("m", "n", "u2", "u", "mu", "sigma", "z", "rank_biserial")
  }

  /** Per-group [[mannWhitney]]: the same doubled-midrank machinery with
    * every stage keyed by `key` — one (key, value)-grain partial-agged
    * groupBy, grouped prefix sums, a key-grain rollup. The natural input
    * to [[bhAdjust]]: a FAMILY of drift tests (one per segment) that
    * multiple testing will otherwise flood with false alarms. */
  def mannWhitneyByGroup(df: DataFrame, key: Column, value: Column,
                         inA: Column): DataFrame = {
    val rows = df.select(key.as("grp"), value.as("_v"),
      inA.cast("long").as("_a"))
    val g = rows.groupBy("grp", "_v")
      .agg(count(lit(1)).as("_cnt"), sum(col("_a")).cast("long").as("_ca"))
    val c = graft.operators.ScalableRank.withGroupedPrefixSum(
      g, col("grp"), Seq(col("_v").asc), col("_cnt"), "_cum")
    val h = c.withColumn("h2", lit(2L) * col("_cum") + col("_cnt") + lit(1L))
    val agg = h.groupBy("grp").agg(
        sum(col("_ca")).cast("long").as("m"),
        sum(col("_cnt") - col("_ca")).cast("long").as("n"),
        sum(col("_ca") * col("h2")).cast("long").as("_r2a"),
        sum((col("_cnt").cast("decimal(19,0)") * col("_cnt") * col("_cnt") -
          col("_cnt")).cast("decimal(38,0)")).cast("decimal(38,0)").as("_ties"))
      .select(col("grp"), col("m"), col("n"),
        (col("_r2a") - col("m") * (col("m") + lit(1L))).as("u2"), col("_ties"))
    val mD = col("m").cast("double")
    val nD = col("n").cast("double")
    val bigN = (col("m") + col("n")).cast("double")
    agg
      .withColumn("u", col("u2").cast("double") / lit(2.0))
      .withColumn("mu", mD * nD / lit(2.0))
      .withColumn("sigma", sqrt(mD * nD / lit(12.0) *
        ((bigN + lit(1.0)) - col("_ties").cast("double") /
          (bigN * (bigN - lit(1.0))))))
      .withColumn("z", when(col("sigma") > 0.0,
        (col("u") - col("mu")) / col("sigma"))
        .otherwise(lit(null).cast("double")))
      .select("grp", "m", "n", "u", "z")
  }

  /** Two-sided normal p-value from a z column, as an engine-portable SQL
    * expression: Abramowitz & Stegun 26.2.17 (|ε| < 7.5e-8) — PURE
    * arithmetic plus one float32-collapsed exp, so Spark and DuckDB agree
    * bit-for-bit without either having an erf built-in. Expects `az` =
    * abs(z) and `t` = 1/(1 + 0.2316419·az) as prior columns. */
  val TwoSidedPSql: String =
    """least(CAST(1.0 AS DOUBLE),
      |  2.0 * (0.3989422804014327
      |         * CAST(CAST(exp(-(az * az) / 2.0) AS FLOAT) AS DOUBLE))
      |      * (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
      |         + t * (-1.821255978 + t * 1.330274429))))))""".stripMargin

  /** The `t` substitution feeding [[TwoSidedPSql]]. */
  val TSql: String = "CAST(1.0 AS DOUBLE) / (1.0 + 0.2316419 * az)"

  /** Benjamini–Hochberg step-up FDR adjustment (Benjamini & Hochberg
    * 1995) over a FAMILY of z-tests: rank two-sided p ascending,
    * p_adj(i) = min_{j ≥ i} m·p(j)/j (the step-up monotonization),
    * discovery = p_adj ≤ alpha. Controls the expected false-discovery
    * RATE across the family — the correction a segment-grain drift
    * screen needs before paging anyone.
    *
    * Tests with NULL z (degenerate segments) pass through with NULL
    * p/rank and discovery = false. The family frame is segment-grain —
    * bounded by the segment vocabulary, never the fact table — so its
    * partition-less rank/suffix-min windows are bounded by construction
    * (the binnedDrift contract). */
  def bhAdjust(tests: DataFrame, keyCol: String, zCol: String,
               alpha: Double = 0.05): DataFrame = {
    val withP = tests
      .withColumn("az", abs(col(zCol)))
      .withColumn("t", expr(TSql))
      .withColumn("p_two", when(col(zCol).isNotNull, expr(TwoSidedPSql)))
      .drop("az", "t")
    val wAll = Window.partitionBy(lit(1))
    val wRank = Window.partitionBy(lit(1))
      .orderBy(col("p_two").asc_nulls_last, col(keyCol).asc)
    // step-up: suffix min of m·p/rank, taken from the worst rank down
    val wSuffix = Window.partitionBy(lit(1))
      .orderBy(col("bh_rank").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withP
      .withColumn("m_tests",
        sum(when(col("p_two").isNotNull, 1L).otherwise(0L)).over(wAll))
      .withColumn("bh_rank",
        when(col("p_two").isNotNull, row_number().over(wRank).cast("long")))
      .withColumn("p_adj",
        when(col("p_two").isNotNull, least(lit(1.0),
          min(col("p_two") * col("m_tests").cast("double") /
            col("bh_rank").cast("double")).over(wSuffix))))
      .withColumn("discovery",
        coalesce(col("p_adj") <= lit(alpha), lit(false)))
  }

  /** Exact (unbinned) two-sample Kolmogorov–Smirnov test per segment —
    * the third drift lens next to [[binnedDrift]]'s bin-grid KS (which
    * blurs anything between bin edges) and [[mannWhitney]] (which sees
    * location shifts but is blind to equal-median shape changes): the
    * supremum ECDF gap evaluated at EVERY distinct value, so a variance
    * or tail change with an unmoved median still fires.
    *
    *   D = max_v |F_A(v) − F_B(v)|, exactly D_num / (n_A·n_B) with
    *   D_num = max_v |cumA(v)·n_B − cumB(v)·n_A|  (exact BIGINT);
    *   λ = √(n_A·n_B/(n_A+n_B))·D; p ≈ 2(e^{−2λ²} − e^{−8λ²} + e^{−18λ²})
    *   (the asymptotic Kolmogorov series truncated at 3 terms — its
    *   tail at the λ where anyone acts is < 1e-15 — clamped to [0,1]);
    *   reject at α=0.05 ⇔ λ > 1.358.
    *
    * Exactness: D_num and the sample sizes are exact BIGINTs; the only
    * libm calls (3 exps) are float32-collapsed; sqrt is exact-rounded.
    * Degenerate segments (either side empty) report NULL stats.
    *
    * Scale shape: the fact table collapses once to (segment, value)
    * grain — the Mann–Whitney contract — then BOTH cumulative counts
    * come from [[graft.operators.ScalableRank.withGroupedPrefixSum]]
    * (no single-partition window at any scale), and the sup is one
    * segment-grain partial agg. */
  def ksExact(df: DataFrame, seg: Column, value: Column, inA: Column): DataFrame = {
    val rows = df.select(seg.as("segment"), value.as("_v"),
      inA.cast("long").as("_a"))
    val g = rows.groupBy("segment", "_v")
      .agg(count(lit(1)).as("_cnt"), sum(col("_a")).cast("long").as("_ca"))
    val c1 = graft.operators.ScalableRank.withGroupedPrefixSum(
      g, col("segment"), Seq(col("_v").asc), col("_ca"), "_cum_a_x")
    val c2 = graft.operators.ScalableRank.withGroupedPrefixSum(
      c1, col("segment"), Seq(col("_v").asc), col("_cnt"), "_cum_t_x")
    val inc = c2
      .withColumn("_ia", col("_cum_a_x") + col("_ca"))
      .withColumn("_ib", col("_cum_t_x") + col("_cnt") - col("_ia"))
    val tot = g.groupBy("segment").agg(
      sum(col("_ca")).cast("long").as("n_a"),
      sum(col("_cnt") - col("_ca")).cast("long").as("n_b"))
    val sup = inc.join(tot, "segment")
      .groupBy("segment", "n_a", "n_b")
      .agg(max(abs(col("_ia") * col("n_b") - col("_ib") * col("n_a")))
        .cast("long").as("d_num"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    def e(k: Int): Column =
      expr(s"CAST(CAST(exp(${-2.0 * k * k} * lam * lam) AS FLOAT) AS DOUBLE)")
    sup
      .withColumn("ks_stat",
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("d_num").cast("double") / (nA * nB)))
      .withColumn("lam",
        when(col("ks_stat").isNotNull,
          sqrt(nA * nB / (nA + nB)) * col("ks_stat")))
      .withColumn("p_approx",
        when(col("lam").isNotNull, least(lit(1.0),
          greatest(lit(0.0), lit(2.0) * (e(1) - e(2) + e(3))))))
      .withColumn("reject_05", coalesce(col("lam") > 1.358, lit(false)))
      .select("segment", "n_a", "n_b", "d_num", "ks_stat", "lam",
        "p_approx", "reject_05")
      .orderBy("segment")
  }

  /** DuckDB mirror of [[ksExact]] over `clean_orders` cents split at an
    * order-date boundary, segmented by priority. The plain cumulative
    * windows here stand in for the distributed prefix sums — same
    * integers either way. */
  def ksExactOracleSql(boundary: String): String =
    s"""
       |, kr AS (
       |  SELECT o_orderpriority AS segment,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
       |    CASE WHEN order_date < DATE '$boundary' THEN 1 ELSE 0 END AS a
       |  FROM clean_orders
       |), kg AS (
       |  SELECT segment, v, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(a) AS BIGINT) AS ca
       |  FROM kr GROUP BY 1, 2
       |), kc AS (
       |  SELECT segment, v, cnt, ca,
       |    sum(ca) OVER (PARTITION BY segment ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ia,
       |    sum(cnt - ca) OVER (PARTITION BY segment ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ib
       |  FROM kg
       |), kt AS (
       |  SELECT segment, CAST(sum(ca) AS BIGINT) AS n_a,
       |    CAST(sum(cnt - ca) AS BIGINT) AS n_b
       |  FROM kg GROUP BY 1
       |), ks AS (
       |  SELECT kc.segment, n_a, n_b,
       |    CAST(max(abs(ia * n_b - ib * n_a)) AS BIGINT) AS d_num
       |  FROM kc JOIN kt ON kc.segment = kt.segment
       |  GROUP BY 1, 2, 3
       |), kf AS (
       |  SELECT *,
       |    CASE WHEN n_a > 0 AND n_b > 0 THEN
       |      CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       |    END AS ks_stat
       |  FROM ks
       |), kl AS (
       |  SELECT *,
       |    CASE WHEN ks_stat IS NOT NULL THEN
       |      sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       |           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) * ks_stat
       |    END AS lam
       |  FROM kf
       |)
       |SELECT segment, n_a, n_b, d_num, ks_stat, lam,
       |  CASE WHEN lam IS NOT NULL THEN least(CAST(1.0 AS DOUBLE),
       |    greatest(CAST(0.0 AS DOUBLE), 2.0 *
       |      (CAST(CAST(exp(-2.0 * lam * lam) AS FLOAT) AS DOUBLE)
       |       - CAST(CAST(exp(-8.0 * lam * lam) AS FLOAT) AS DOUBLE)
       |       + CAST(CAST(exp(-18.0 * lam * lam) AS FLOAT) AS DOUBLE))))
       |  END AS p_approx,
       |  coalesce(lam > 1.358, false) AS reject_05
       |FROM kl ORDER BY segment""".stripMargin
}
