package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, to_date}

/** SQL-surface registration: the reference's users read gold marts by
  * NAME (Postgres `gold.*` tables behind the dashboards and dbt); this
  * registers the same surface as temp views so `spark.sql("SELECT ...
  * FROM revenue_daily")` works against graft directly.
  * Ref: /root/reference/warehouse/init.sql (gold.* DDL),
  * /root/reference/monitoring/grafana (panels query these names).
  *
  * Views are lazy logical plans — registering costs nothing; each SQL
  * query against them plans/prunes/pushes down exactly like the
  * DataFrame API (same Catalyst plans underneath).
  */
object Marts {

  /** Register source tables + gold marts for `sfDir`. Returns the view
    * names registered. */
  def register(spark: SparkSession, sfDir: String): Seq[String] = {
    functions.GraftFunctions.register(spark)
    val source = Seq(
      "region" -> Tables.region(spark, sfDir),
      "nation" -> Tables.nation(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "part" -> Tables.part(spark, sfDir),
      "orders" -> Tables.orders(spark, sfDir),
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "events" -> Tables.events(spark, sfDir),
      "documents" -> Tables.documents(spark, sfDir),
      "embeddings" -> Tables.embeddings(spark, sfDir))
    source.foreach { case (t, df) => df.createOrReplaceTempView(t) }
    val clean = operators.Cleaning.cleanOrders(Tables.orders(spark, sfDir))
    val enriched = operators.Enrichment.enrichOrders(clean,
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir))
    val marts = Map(
      "clean_orders" -> clean,
      "orders_enriched" -> enriched,
      "revenue_daily" -> gold.Revenue.revenueDaily(enriched),
      "fraud_summary" -> gold.FraudSummary.fraudSummaryDaily(Tables.events(spark, sfDir)),
      "user_risk_scores" -> gold.FraudSummary.userRiskScores(Tables.events(spark, sfDir)),
      "dim_customers" -> gold.StarSchema.dimCustomers(
        Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
        Tables.region(spark, sfDir)),
      "fact_orders" -> gold.StarSchema.factOrders(clean, Tables.lineitem(spark, sfDir)),
      // r11 analytics marts: the BI/ops views the new gold queries serve
      "basket_rules" -> gold.Basket.associationRules(
        Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir)),
      "growth_trend" -> gold.Revenue.growthTrend(clean),
      "cycle_time" -> gold.Pipelines.cycleTime(clean,
        operators.Cleaning.cleanLineitem(Tables.lineitem(spark, sfDir))),
      // r11 wave 3: the attribution/experimentation/cohort marts.
      // (removal-effect attribution is NOT a view: its driver-side chain
      // iteration executes eagerly, and register() must stay job-free)
      // NOTE: attribution_shapley shares Attribution's single-live-frame
      // cache (a later direct shapley() call unpersists this view's
      // maskAgg — results stay correct; only the compute-once persist
      // property is scoped to the newest frame)
      "attribution_shapley" -> gold.Attribution.shapley(Tables.events(spark, sfDir)),
      "attribution_time_decay" -> gold.Attribution.timeDecay(Tables.events(spark, sfDir)),
      "msprt_daily" -> gold.Sequential.msprtDaily(Tables.events(spark, sfDir)),
      "cohort_ltv" -> gold.Behavior.cohortLtv(
        Tables.orders(spark, sfDir).select(col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"), col("o_totalprice")),
        "o_custkey", "order_date", "o_totalprice"))
    marts.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    source.map(_._1) ++ marts.keys.toSeq
  }
}
