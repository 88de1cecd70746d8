package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver-layer enrichment: dimension joins + risk scoring + tiers,
  * re-expressing the reference's geo-risk / mismatch / tier logic.
  * Ref: /root/reference/spark_jobs/silver/transform_transactions.py
  * (enrich_orders; COUNTRY_RISK_SCORES map, HIGH_RISK_THRESHOLD).
  *
  * The reference looks up country risk through a Python UDF — a per-row
  * interpreter hop that breaks codegen. Here the map is a literal CASE
  * expression (codegen'd, constant-foldable) and all dimension joins are
  * explicit `broadcast()`: nation/region/customer are tiny next to a
  * 100 TB fact table, so no shuffle of the fact side ever happens.
  */
object Enrichment {

  /** Region-level risk scores (stand-in for the reference's country risk
    * map — same shape: literal lookup + high-risk threshold). */
  val RegionRisk: Map[String, Double] = Map(
    "AFRICA" -> 0.12, "AMERICA" -> 0.03, "ASIA" -> 0.05,
    "EUROPE" -> 0.02, "MIDDLE EAST" -> 0.09)
  val HighRiskThreshold = 0.05
  val DefaultRisk = 0.05

  def regionRiskCol(regionName: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    RegionRisk.foldLeft(lit(DefaultRisk)) { case (acc, (name, risk)) =>
      when(regionName === name, lit(risk)).otherwise(acc)
    }

  /** DuckDB CASE fragment generated from the SAME RegionRisk map, so
    * oracle SQL can never drift from the Spark lookup. */
  def riskCaseSql(regionCol: String): String =
    s"CASE $regionCol" +
      RegionRisk.toSeq.sortBy(_._1)
        .map { case (n, r) => s" WHEN '$n' THEN $r" }.mkString +
      s" ELSE $DefaultRisk END"

  /** Orders enriched with customer geo dims + risk signals. */
  def enrichOrders(cleanOrders: DataFrame, customer: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"),
        col("n_name").as("nation_name"), col("r_name").as("region_name"))

    // nation/region broadcast into customer above (tiny); customer itself
    // scales with the data (not broadcastable at 100 TB) → shuffle join on
    // o_custkey, which AQE converts to broadcast at small SFs automatically.
    cleanOrders
      .join(dims, col("o_custkey") === col("c_custkey"))
      .withColumn("region_risk", regionRiskCol(col("region_name")))
      .withColumn("is_high_risk_region", col("region_risk") > lit(HighRiskThreshold))
      .withColumn("negative_balance_flag", col("c_acctbal") < 0)
      .drop("c_custkey")
  }
}
