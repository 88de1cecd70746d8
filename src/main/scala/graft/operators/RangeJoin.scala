package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (band) join: assign facts to value intervals from a small bands
  * dimension. The bands side is always broadcast — a range join against a
  * broadcast table is a per-row scan of a handful of intervals (nested
  * loop over ~5 rows), NOT a shuffle range-join; this is the right plan
  * shape at any fact-table scale.
  */
object RangeJoin {

  /** (band_name, lo inclusive, hi exclusive; hi NULL = open-ended). */
  val PriceBands: Seq[(String, Double, Option[Double])] = Seq(
    ("p0_cheap", 0.0, Some(500.0)),
    ("p1_low", 500.0, Some(900.0)),
    ("p2_mid", 900.0, Some(1300.0)),
    ("p3_high", 1300.0, Some(1700.0)),
    ("p4_premium", 1700.0, None))

  def bandsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    PriceBands.map { case (n, lo, hi) => (n, lo, hi.getOrElse(Double.MaxValue)) }
      .toDF("band_name", "band_lo", "band_hi")
  }

  /** Parts classified into retail-price bands + per-band rollup. */
  def partPriceBands(spark: SparkSession, part: DataFrame): DataFrame =
    part.select(col("p_partkey"), col("p_type"), col("p_retailprice"))
      .join(broadcast(bandsDf(spark)),
        col("p_retailprice") >= col("band_lo") && col("p_retailprice") < col("band_hi"))
      .select(col("p_partkey"), col("p_type"), col("p_retailprice"), col("band_name"))
}
