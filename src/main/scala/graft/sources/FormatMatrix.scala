package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format source/sink round-trip matrix: the same fact slice
  * written to ORC, CSV, and JSON (the three non-parquet formats a
  * lakehouse ingests from in practice), read back through each
  * DataSource, and aggregated per format — three rows that must be
  * IDENTICAL to the parquet-derived truth, which is exactly what the
  * oracle checks. One query demonstrates: native ORC (columnar, with
  * predicate pushdown — SourcesSpec asserts PushedFilters reach the ORC
  * scan), schema-explicit CSV (header round-trip, decimal parsing), and
  * schema-explicit JSON (the bronze-ingest line format).
  *
  * Exactness: the projected slice is (bigint, bigint, decimal(12,2),
  * string) — every format round-trips these losslessly under an
  * EXPLICIT read schema (inferSchema would demote decimals to double —
  * the classic silent-corruption path this query exists to guard).
  * Aggregates are exact count/decimal sums.
  *
  * Scale: each write/read is a full parallel scan — format conversion
  * is embarrassingly parallel; the per-format aggregate partial-aggs
  * before one 3-row exchange. */
object FormatMatrix {

  private val ReadSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_quantity", DecimalType(12, 2)),
    StructField("l_returnflag", StringType)))

  /** Write the slice to orc/csv/json under `root`, read each back, and
    * aggregate per format. */
  def roundTrip(lineitem: DataFrame, root: String): DataFrame = {
    val spark = lineitem.sparkSession
    val slice = lineitem.select(col("l_orderkey"), col("l_partkey"),
      col("l_quantity").cast(DecimalType(12, 2)).as("l_quantity"),
      col("l_returnflag"))
    slice.write.mode("overwrite").orc(s"$root/orc")
    slice.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
    slice.write.mode("overwrite").json(s"$root/json")
    val back = Seq(
      ("orc", spark.read.schema(ReadSchema).orc(s"$root/orc")),
      ("csv", spark.read.schema(ReadSchema).option("header", "true")
        .csv(s"$root/csv")),
      ("json", spark.read.schema(ReadSchema).json(s"$root/json")))
    back.map { case (fmt, df) =>
      df.groupBy(lit(fmt).as("format"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).cast("decimal(38,2)").cast("double").as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_returnflag")).as("n_flags"))
    }.reduce(_.unionByName(_))
  }

  /** Oracle: the same aggregate from the parquet table, one row per
    * format label — identical rows prove the lossless round-trip. */
  def oracleSql: String =
    """SELECT fmt AS format, n_rows, sum_qty, n_orders, n_flags
      |FROM (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
      |  FROM lineitem
      |) CROSS JOIN (VALUES ('orc'), ('csv'), ('json')) AS t(fmt)
      |ORDER BY format""".stripMargin
}
