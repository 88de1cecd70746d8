package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer cleansing, re-expressing the reference's bronze→silver
  * cleaning rules (null/bounds filters, dedup on business key, rounding,
  * domain normalization, tiering).
  * Ref: /root/reference/spark_jobs/silver/transform_transactions.py
  * (clean_orders, clean_payments).
  *
  * Dedup is a deterministic keep-first-by-sort-key window rather than
  * `dropDuplicates` — same single shuffle, but reproducible across runs and
  * cluster layouts (dropDuplicates keeps an arbitrary row per key, which is
  * a silent nondeterminism at 100 TB re-processing time).
  */
object Cleaning {

  /** Keep exactly one row per key, choosing by ascending `tiebreak`. */
  def deterministicDedup(df: DataFrame, keys: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak.map(col): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  private val ValidStatus = Seq("O", "F", "P")

  /** Cleaned orders: valid keys, positive bounded amounts, normalized
    * status domain, rounded money, amount tier, date-typed order date. */
  def cleanOrders(orders: DataFrame): DataFrame = {
    val filtered = orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
      .filter(col("o_totalprice") > 0 && col("o_totalprice") < 10000000)
    deterministicDedup(filtered, Seq("o_orderkey"), Seq("o_custkey", "o_totalprice"))
      .withColumn("status_normalized",
        when(col("o_orderstatus").isin(ValidStatus: _*), col("o_orderstatus"))
          .otherwise(lit("unknown")))
      .withColumn("amount_tier",
        when(col("o_totalprice") < 50000, lit("micro"))
          .when(col("o_totalprice") < 100000, lit("low"))
          .when(col("o_totalprice") < 200000, lit("medium"))
          .when(col("o_totalprice") < 400000, lit("high"))
          .otherwise(lit("premium")))
      .withColumn("order_date", col("o_orderdate").cast("date"))
  }

  /** Cleaned lineitem: bounds filters + exact net/charge money columns.
    * net_price = extprice*(1-disc); charge = extprice*(1-disc)(1+tax) —
    * computed in decimal space so re-aggregation downstream stays exact. */
  def cleanLineitem(lineitem: DataFrame): DataFrame =
    lineitem
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .filter(col("l_discount") >= 0 && col("l_discount") <= 1)
      .withColumn("net_price",
        graft.util.Cols.moneyTimes(col("l_extendedprice"), lit(1) - col("l_discount")))
      .withColumn("charge",
        graft.util.Cols.moneyTimes(col("l_extendedprice"),
          (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))
      .withColumn("is_refund", (col("l_returnflag") === "R"))
      .withColumn("ship_date", col("l_shipdate").cast("date"))
}
