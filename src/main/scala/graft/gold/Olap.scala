package graft.gold

import graft.util.Cols._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OLAP shaping operators: pivot, rollup, cube — the reshaping layer the
  * reference's dbt marts/dashboards consume.
  *
  * Pivot uses an EXPLICIT value list: without one Spark runs a separate
  * distinct job to discover pivot values — a full extra scan at 100 TB.
  * Rollup/cube sentinel-label their null group keys so downstream
  * consumers (and the oracle hash) never deal with NULL dimension values.
  */
object Olap {

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Events pivoted to one column per event type (count per user). */
  def eventTypePivot(events: DataFrame): DataFrame = {
    val pivoted = events
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    // pivot leaves NULL for absent cells; normalize to 0 like a CASE-sum
    pivoted.select(
      col("user_id") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Revenue rollup over region ⊃ nation (subtotals + grand total). */
  def revenueRollup(enrichedOrders: DataFrame): DataFrame =
    enrichedOrders
      .select(col("region_name"), col("nation_name"), col("o_totalprice"))
      .rollup(col("region_name"), col("nation_name"))
      .agg(
        sumMoney(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("order_count"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce(col("region_name"), lit("ALL")).as("region_name"),
        coalesce(col("nation_name"), lit("ALL")).as("nation_name"),
        col("revenue"), col("order_count"), col("gid"))

  /** Explicit GROUPING SETS: exactly the two marts the dashboards need
    * (by-status and by-tier), one pass — no wasted cube cells. */
  def statusTierGroupingSets(cleanOrders: DataFrame): DataFrame =
    cleanOrders
      .select(col("status_normalized"), col("amount_tier"), col("o_totalprice"))
      .groupingSets(
        Seq(Seq(col("status_normalized")), Seq(col("amount_tier"))),
        col("status_normalized"), col("amount_tier"))
      .agg(
        count(lit(1)).as("order_count"),
        sumMoney(col("o_totalprice")).as("revenue"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce(col("status_normalized"), lit("ALL")).as("status_normalized"),
        coalesce(col("amount_tier"), lit("ALL")).as("amount_tier"),
        col("order_count"), col("revenue"), col("gid"))

  /** Order-count cube over status × tier (all marginals). */
  def statusTierCube(cleanOrders: DataFrame): DataFrame =
    cleanOrders
      .select(col("status_normalized"), col("amount_tier"), col("o_totalprice"))
      .cube(col("status_normalized"), col("amount_tier"))
      .agg(
        count(lit(1)).as("order_count"),
        sumMoney(col("o_totalprice")).as("revenue"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce(col("status_normalized"), lit("ALL")).as("status_normalized"),
        coalesce(col("amount_tier"), lit("ALL")).as("amount_tier"),
        col("order_count"), col("revenue"), col("gid"))
}
