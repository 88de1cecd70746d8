package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** Revenue-concentration analytics per region — the inequality measures
  * a marketplace/fraud platform tracks to answer "is this market a few
  * whales or a long tail, and is that changing": the Gini coefficient
  * (rank-formula form G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) over an
  * explicit deterministic total order), the Herfindahl–Hirschman index
  * (Σ shareᵢ² = Σxᵢ² / T²), and the top-decile revenue share.
  *
  * Scale shape: orders collapse once to (region, customer) revenue
  * grain; ranks ride the grouped prefix-sum primitive (never a
  * per-region single-partition window over the customer base); every
  * moment is an exact integer-cents product summed as decimals
  * (rank·x ≤ 10⁹·10¹⁸ needs decimal(18)×decimal(18)); the three indices
  * form as fixed double chains mirrored in the oracle — hash-exact.
  * Tie contract: customers order by (revenue asc, custkey asc) — a
  * total order, so the rank-formula Gini is deterministic and identical
  * in both engines (the tie-averaged textbook variant differs only at
  * exactly-tied revenues; the contract here is the rank formula).
  */
object Concentration {

  def revenueConcentration(orders: DataFrame, customer: DataFrame,
                           nation: DataFrame, region: DataFrame): DataFrame = {
    val cents = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("c_custkey").as("custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * lit(100))
        .cast("long").as("x"))

    val rankedAsc = ScalableRank.withGroupedPrefixSum(
        cents, col("region"), Seq(col("x").asc, col("custkey").asc),
        lit(1L), "r0")
      .withColumn("rnk", col("r0") + 1L)
    val rankedBoth = ScalableRank.withGroupedPrefixSum(
        rankedAsc, col("region"), Seq(col("x").desc, col("custkey").asc),
        lit(1L), "rd0")
      .withColumn("rnk_desc", col("rd0") + 1L)

    val nPer = cents.groupBy("region").agg(count(lit(1)).as("n_customers"))
    rankedBoth.join(broadcast(nPer), "region")
      .groupBy("region", "n_customers").agg(
        sum(col("x").cast("decimal(38,0)")).as("t_dec"),
        sum(col("rnk").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
          .as("srx_dec"),
        sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
          .as("sxx_dec"),
        sum(when(col("rnk_desc") <= expr("(n_customers + 9) DIV 10"), col("x"))
          .otherwise(lit(0L)).cast("decimal(38,0)")).as("top_dec"))
      .withColumn("t", col("t_dec").cast("string").cast("double"))
      .withColumn("srx", col("srx_dec").cast("string").cast("double"))
      .withColumn("sxx", col("sxx_dec").cast("string").cast("double"))
      .withColumn("nd", col("n_customers").cast("double"))
      .select(col("region"), col("n_customers"),
        col("t_dec").cast("long").as("total_cents"),
        ((lit(2.0) * col("srx") - (col("nd") + 1.0) * col("t")) /
          (col("nd") * col("t"))).as("gini"),
        (col("sxx") / (col("t") * col("t"))).as("hhi"),
        (col("top_dec").cast("string").cast("double") / col("t"))
          .as("top_decile_share"))
  }

  /** DuckDB mirror of [[revenueConcentration]]. */
  def oracleSql: String =
    """WITH cents AS (
      |  SELECT r_name AS region, c_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
      |  FROM orders
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2
      |), rk AS (
      |  SELECT region, custkey, x,
      |    row_number() OVER (PARTITION BY region ORDER BY x ASC, custkey ASC) AS rnk,
      |    row_number() OVER (PARTITION BY region ORDER BY x DESC, custkey ASC) AS rnk_desc,
      |    count(*) OVER (PARTITION BY region) AS n_customers
      |  FROM cents
      |), agg AS (
      |  SELECT region, CAST(n_customers AS BIGINT) AS n_customers,
      |    CAST(CAST(sum(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS t,
      |    CAST(sum(CAST(x AS HUGEINT)) AS BIGINT) AS total_cents,
      |    CAST(CAST(sum(CAST(rnk AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS srx,
      |    CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(sum(CASE WHEN rnk_desc <= (n_customers + 9) // 10
      |      THEN CAST(x AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS VARCHAR) AS DOUBLE)
      |      AS top_x
      |  FROM rk GROUP BY region, n_customers
      |)
      |SELECT region, n_customers, total_cents,
      |  (2.0 * srx - (CAST(n_customers AS DOUBLE) + 1.0) * t)
      |    / (CAST(n_customers AS DOUBLE) * t) AS gini,
      |  sxx / (t * t) AS hhi,
      |  top_x / t AS top_decile_share
      |FROM agg ORDER BY region""".stripMargin
}
