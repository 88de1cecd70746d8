package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted salted join for skewed keys — the manual remedy AQE's
  * skew-join split applies at runtime, expressed in the plan so it
  * also covers engines/paths AQE cannot touch (grouped joins feeding
  * window functions, bucketed tables, non-AQE streaming micro-batches).
  *
  * The naive salt (explode the ENTIRE build side ×S) multiplies build
  * shuffle volume by S — wrong at 100 TB where the build side is
  * itself large. This is the targeted form:
  *   1. one partial-agged pass over the probe side counts rows per
  *      key and keeps only keys above `hotThreshold` (the hot set is
  *      tiny by definition — skew means FEW keys hold MANY rows — so
  *      it broadcasts);
  *   2. probe rows of hot keys get salt = hash(row id) % S, cold rows
  *      salt 0 — a row-local projection after a broadcast hash lookup;
  *   3. build rows of hot keys replicate ×S (explode over a literal
  *      salt range), cold rows pass through once with salt 0;
  *   4. one shuffle join on (key, salt): every hot key now occupies S
  *      reducer slots instead of one straggler.
  * Join output is bit-identical to the unsalted join — salting is
  * pure partitioning, invisible to semantics (the oracle is the plain
  * join SQL).
  *
  * Ref: the reference repartitions by transaction date and accepts the
  * hot-merchant straggler (spark_jobs/silver/transform_transactions.py);
  * at 100× the hot key dominates the stage and this split is the fix.
  */
object SkewJoin {

  /** Per-priority revenue over lineitem ⋈ orders through the targeted
    * salted join. `hotThreshold` is deliberately low on the synthetic
    * data so both the salted and unsalted paths execute. */
  def revenueByPriority(lineitem: DataFrame, orders: DataFrame,
                        salts: Int = 8, hotThreshold: Int = 5): DataFrame = {
    val li = lineitem.select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), col("l_discount"))
    val ord = orders.select(col("o_orderkey"), col("o_orderpriority"))

    // 1. hot-key set from the probe side: partial-agg shuffles only
    //    (key, count) states; the surviving set is broadcast-sized.
    val hot = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotThreshold)
      .select(col("l_orderkey").as("_hot_key"))

    // 2. probe side: salt only hot keys (row-local after broadcast probe).
    val probe = li
      .join(broadcast(hot), col("l_orderkey") === col("_hot_key"), "left")
      .withColumn("_salt",
        when(col("_hot_key").isNotNull,
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
          .otherwise(lit(0)))
      .drop("_hot_key")

    // 3. build side: replicate ×S for hot keys only.
    val build = ord
      .join(broadcast(hot), col("o_orderkey") === col("_hot_key"), "left")
      .withColumn("_salt",
        explode(when(col("_hot_key").isNotNull,
          sequence(lit(0), lit(salts - 1)))
          .otherwise(sequence(lit(0), lit(0)))))
      .drop("_hot_key")

    // 4. the (key, salt) shuffle join, then the usual partial-agged cut.
    probe
      .join(build, probe("l_orderkey") === build("o_orderkey")
        && probe("_salt") === build("_salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        graft.util.Cols.sumMoneyTimes(col("l_extendedprice"),
          lit(1) - col("l_discount")).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
