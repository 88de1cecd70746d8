package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (16-bit here; width is a constant).
  *
  * Per token: a 32-bit hash from the md5 hex prefix. Per bit b: the doc
  * accumulates +1/-1 by whether the token's bit b is set; simhash bit b is
  * 1 iff the sum is positive. Computed explode-free per document via
  * higher-order functions — tokens never leave their row, so the operator
  * is a pure projection (no shuffle at any scale). Near-dup candidates are
  * docs whose fingerprints match (or differ within a Hamming radius via
  * band rotation — here: exact-bucket grouping).
  */
object SimHash {

  val Bits = 16

  /** doc_id, token_count, simhash (long). */
  def simhash(documents: DataFrame): DataFrame = {
    // per-token 32-bit hash: conv(first 8 md5 hex chars) — portable to the
    // oracle engine (DuckDB: CAST('0x'||substr AS BIGINT)).
    val tokenHashes =
      expr("transform(split(text, ' '), t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))")
    val bitCols = (0 until Bits).map { b =>
      // sum over tokens of (+1 if bit set else -1) > 0  →  bit b set
      val votes = expr(
        s"aggregate(th, 0L, (acc, h) -> acc + CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END)")
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    documents
      .select(col("doc_id"), col("lang"), tokenHashes.as("th"))
      .select(col("doc_id"), col("lang"),
        size(col("th")).cast("long").as("token_count"),
        bitCols.reduce(_ + _).as("simhash"))
  }

  /** Groups of documents sharing an identical fingerprint. */
  def simhashBuckets(documents: DataFrame): DataFrame =
    simhash(documents)
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("doc_count"))

  /** The DuckDB-mirror SQL for `simhash` (generated from the same
    * constants so Spark and oracle can never drift). */
  def oracleSql: String = {
    val bitTerms = (0 until Bits).map { b =>
      s"CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString("\n      + ")
    s"""WITH tk AS (
       |  SELECT doc_id, lang,
       |    list_transform(string_split(text, ' '),
       |      t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS th
       |  FROM documents
       |)
       |SELECT doc_id, lang, CAST(len(th) AS BIGINT) AS token_count,
       |  CAST($bitTerms AS BIGINT) AS simhash
       |FROM tk ORDER BY doc_id""".stripMargin
  }
}
