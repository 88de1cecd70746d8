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
