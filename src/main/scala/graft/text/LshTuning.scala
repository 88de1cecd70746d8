package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSH banding design table: for every (bands b × rows r) factorization
  * of the MinHash signature budget, the closed-form candidate
  * probability P(candidate | jaccard = s) = 1 − (1 − s^r)^b over a
  * similarity grid, with the miss rate relative to the design threshold
  * (false-positive mass below it, false-negative mass above). This is
  * the table a practitioner actually consults before picking the
  * [[MinHash.Bands]]×[[MinHash.RowsPerBand]] geometry — steeper S-curves
  * cost more bands; the tuning trade is explicit here instead of folk
  * wisdom.
  *
  * Hash-exactness: the powers are expanded into EXPLICIT left-associated
  * multiplication chains (s·s·…, never pow()) — IEEE multiplication is
  * bit-deterministic across engines where libm pow is not — and the
  * oracle SQL is generated from the same constants with the same chain
  * shapes, so the doubles match bit for bit. Plan cost: a literal
  * 19-row grid per factorization; nothing touches data. */
object LshTuning {

  val GridStep = 0.05
  val GridPoints = 19

  private def chain(c: Column, n: Int): Column =
    (1 until n).foldLeft(c)((acc, _) => acc * c)

  private def chainSql(term: String, n: Int): String =
    Seq.fill(n)(term).mkString(" * ")

  /** Factorizations (b, r) of the signature budget, rarest-first. */
  def combos(numHashes: Int = MinHash.NumHashes): Seq[(Int, Int)] =
    (1 to numHashes).filter(numHashes % _ == 0).map(r => (numHashes / r, r))

  def sCurve(spark: SparkSession, numHashes: Int = MinHash.NumHashes,
             threshold: Double = 0.5): DataFrame = {
    combos(numHashes).map { case (b, r) =>
      val grid = spark.range(1, GridPoints + 1)
        .select((col("id").cast("double") * lit(GridStep)).as("s"))
      val pCand = lit(1.0) - chain(lit(1.0) - chain(col("s"), r), b)
      grid.select(
        lit(b.toLong).as("bands"),
        lit(r.toLong).as("rows_per_band"),
        col("s"),
        pCand.as("p_candidate"),
        when(col("s") >= threshold, lit(1.0) - pCand).otherwise(pCand)
          .as("miss_rate"),
        when(col("s") >= threshold, lit("target")).otherwise(lit("non_target"))
          .as("region"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB mirror — same constants, same multiplication chains. */
  def sCurveOracleSql(numHashes: Int = MinHash.NumHashes,
                      threshold: Double = 0.5): String = {
    val selects = combos(numHashes).map { case (b, r) =>
      val sr = chainSql("s", r)
      val q = s"(1.0 - ($sr))"
      val p = s"(1.0 - (${chainSql(q, b)}))"
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band, s,
         |  $p AS p_candidate,
         |  CASE WHEN s >= $threshold THEN 1.0 - $p ELSE $p END AS miss_rate,
         |  CASE WHEN s >= $threshold THEN 'target' ELSE 'non_target' END AS region
         |FROM grid""".stripMargin
    }
    s"""WITH grid AS (
       |  SELECT CAST(g AS DOUBLE) * $GridStep AS s
       |  FROM generate_series(1, $GridPoints) t(g)
       |)
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY bands, s""".stripMargin
  }
}
