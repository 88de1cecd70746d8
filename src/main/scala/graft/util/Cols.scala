package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by all operators.
  *
  * Determinism contract (SURVEY.md §4): money aggregates are summed as
  * decimals (exact, order-independent — safe under any shuffle/partial-agg
  * schedule on a 1000-executor cluster) and only converted to double at the
  * very end. Doubles are never summed directly: parallel double summation is
  * order-dependent and would make results nondeterministic run-to-run.
  * Derived doubles are produced by single IEEE ops on exact operands (e.g.
  * exact-sum / count), never `round()`ed afterwards — Spark's round() works
  * on the shortest decimal representation while DuckDB's works on the binary
  * value, so rounding computed doubles can diverge at half-way boundaries.
  */
object Cols {
  private val Money = DecimalType(18, 2)
  // Factors like (1-discount) / (1-discount)(1+tax) have ≤4 exact decimal
  // digits in this domain; scale 4 keeps products at scale 6, so sums stay
  // below 2^53 and the final decimal→double cast is EXACT in both Spark and
  // DuckDB (no half-way rescale, which the two engines round differently).
  private val Factor = DecimalType(18, 4)
  private val Exact6 = DecimalType(18, 6)

  /** Exact money sum → double. */
  def sumMoney(c: Column): Column =
    sum(c.cast(Money)).cast("double")

  /** Exact sum of a scale-6 value (e.g. a money×factor product) → double. */
  def sumExact6(c: Column): Column =
    sum(c.cast(Exact6)).cast("double")

  /** Exact sum of money*(double factor) in decimal space → double. */
  def sumMoneyTimes(money: Column, factor: Column): Column =
    sum(money.cast(Money) * factor.cast(Factor)).cast("double")

  /** Scalar money*(factor), exact at scale 6 → double (exact). */
  def moneyTimes(money: Column, factor: Column): Column =
    (money.cast(Money) * factor.cast(Factor)).cast("double")

  /** Exact money sum whose unscaled value may exceed 2^53 (e.g. sums of
    * SQUARES) → double via the decimal's TEXT form: decimal→string is
    * exact, and string→double parsing is correctly rounded to the nearest
    * double in every engine (one rounding of the exact rational) — unlike
    * direct decimal→double casts, whose internal path (int128→double then
    * scale division in DuckDB vs BigDecimal.doubleValue in Spark) can
    * differ by 1 ulp above 2^53. */
  def sumMoneyBig(c: Column): Column =
    sum(c.cast(Money)).cast("string").cast("double")

  /** Exact sum of a money×money product (scale 4) via the text path —
    * for second moments, which overflow the 2^53 exactness bound. */
  def sumMoneySqBig(a: Column, b: Column): Column =
    sum(a.cast(Money) * b.cast(Money)).cast("string").cast("double")

  /** Exact average: decimal sum cast double, one IEEE division by count. */
  def avgMoney(c: Column): Column =
    sumMoney(c) / count(lit(1))

  /** Deterministic surrogate key, mirroring the reference's dbt
    * generate_surrogate_key macro (md5 of pipe-joined columns).
    * Ref: /root/reference/dbt/macros/generate_surrogate_key.sql */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))
}
