package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a JOIN materialized view — the delta-join
  * identity for insert-only deltas:
  *
  *   MV((A ∪ ΔA) ⋈ B)  =  merge( MV(A ⋈ B),  agg(ΔA ⋈ B) )
  *
  * where merge re-aggregates mergeable partial states (decimal sums,
  * counts). The CDC→gold loop ([[graft.pipeline.Medallion]]) already
  * maintains single-table aggregates incrementally; this is the
  * two-table form a nightly MV refresh actually needs: the base-side
  * result is the stored MV (here recomputed so the query is
  * self-contained and hash-checkable against the full recompute), and
  * the refresh cost is ONE join of the delta against the other table —
  * proportional to |Δ|, not |A|. Because Δ is small by construction,
  * its join side broadcasts: the nightly refresh touches no large
  * shuffle at all.
  *
  * Determinism: partial revenue states stay DECIMAL through both the
  * per-side aggregates and the merge (order-independent under any
  * shuffle schedule); one double cast at the very end.
  *
  * Ref: the reference rebuilds gold marts from silver in full each dbt
  * run (dbt/models/marts); at 100 TB the full join recompute is
  * the nightly bottleneck and this delta form is the standard fix
  * (self-maintainable views, Gupta & Mumick 1995).
  */
object DeltaView {

  private val Money = org.apache.spark.sql.types.DecimalType(18, 2)

  /** Monthly revenue MV over orders ⋈ lineitem, maintained as
    * base + delta where the delta is the trailing `deltaDays` of
    * orders (a stand-in for the day's CDC batch). Output is
    * bit-identical to the full recompute (the oracle). */
  def monthlyRevenueIncremental(orders: DataFrame, lineitem: DataFrame,
                                deltaDays: Int = 30): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_extendedprice"))
    val ord = orders.select(col("o_orderkey"), col("o_orderdate"))

    // Watermark for the simulated CDC split: one 1-row aggregate,
    // broadcast into a row-local tag (no driver collect).
    val maxDate = ord.agg(max(col("o_orderdate")).as("_max_date"))
    val tagged = ord.crossJoin(broadcast(maxDate))
      .withColumn("_is_delta",
        col("o_orderdate") >= date_sub(col("_max_date").cast("date"), deltaDays))
      .withColumn("order_month",
        date_trunc("month", col("o_orderdate")).cast("date"))
      .select("o_orderkey", "order_month", "_is_delta")

    def partial(side: DataFrame, broadcastSide: Boolean): DataFrame = {
      val joined =
        if (broadcastSide) li.join(broadcast(side), col("l_orderkey") === col("o_orderkey"))
        else li.join(side, col("l_orderkey") === col("o_orderkey"))
      joined.groupBy("order_month")
        .agg(sum(col("l_extendedprice").cast(Money)).as("_rev_state"),
          count(lit(1)).as("_cnt_state"))
    }

    // Base: the stored MV (large shuffle join, amortized — in steady
    // state this frame is READ, not recomputed). Delta: |Δ|-sized,
    // broadcast side of its join.
    val base = partial(tagged.filter(!col("_is_delta")), broadcastSide = false)
    val delta = partial(tagged.filter(col("_is_delta")), broadcastSide = true)

    base.unionByName(delta)
      .groupBy("order_month")
      .agg(sum(col("_rev_state")).cast("double").as("revenue"),
        sum(col("_cnt_state")).as("line_count"))
      .orderBy("order_month")
  }
}
