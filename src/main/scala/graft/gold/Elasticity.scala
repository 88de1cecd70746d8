package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-log price elasticity of demand per product category: OLS of
  * ln(quantity) on ln(net unit price) over order lines — the classic
  * econometric readout (slope = % quantity change per % price change)
  * that a revenue platform reads before repricing.
  *
  * Exactness is the zipfFit contract (SURVEY §4): each log collapses to
  * float32 and quantizes to micro-nats, so the per-category OLS moments
  * are exact decimal integer sums and the slope/intercept are one
  * mirrored IEEE chain. Scale: one fact×part join (the dim side prunes to
  * two columns; AQE broadcasts it at small SF and degrades to sort-merge
  * at scale), one category-grain partial-agged exchange.
  */
object Elasticity {

  // ln collapsed to float32 then micro-quantized — libm-portable (the
  // zipfFit contract)
  private def lnMicro(c: Column): Column =
    floor(log(c).cast("float").cast("double") * lit(1000000.0)).cast("long")

  def priceElasticity(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val lines = lineitem
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0 &&
        col("l_discount") >= 0 && col("l_discount") < 1)
      .select(col("l_partkey"),
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) /
          col("l_quantity")).as("unit_price"),
        col("l_quantity"))
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
    val xy = lines
      .withColumn("x", lnMicro(col("unit_price")))
      .withColumn("y", lnMicro(col("l_quantity")))
    val m = xy.groupBy("p_type").agg(
      count(lit(1)).as("n_lines"),
      sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"))
    m
      .withColumn("nd", col("n_lines").cast("double"))
      .withColumn("elasticity",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
          (col("nd") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("elasticity") * col("sx")) / col("nd") / lit(1000000.0))
      .select("p_type", "n_lines", "elasticity", "intercept")
  }

  val priceElasticityOracleSql: String =
    """WITH lines AS (
      |  SELECT p.p_type,
      |    (l_extendedprice * (1.0 - l_discount)) / l_quantity AS unit_price,
      |    l_quantity
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l_quantity > 0 AND l_extendedprice > 0
      |    AND l_discount >= 0 AND l_discount < 1
      |), xy AS (
      |  SELECT p_type,
      |    CAST(floor(CAST(CAST(ln(unit_price) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
      |    CAST(floor(CAST(CAST(ln(l_quantity) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS y
      |  FROM lines
      |), m AS (
      |  SELECT p_type, CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      |  FROM xy GROUP BY 1
      |)
      |SELECT p_type, n_lines,
      |  (CAST(n_lines AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n_lines AS DOUBLE) * sxx - sx * sx) AS elasticity,
      |  (sy - ((CAST(n_lines AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n_lines AS DOUBLE) * sxx - sx * sx)) * sx)
      |    / CAST(n_lines AS DOUBLE) / 1000000.0 AS intercept
      |FROM m ORDER BY p_type""".stripMargin
}
