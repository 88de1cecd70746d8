package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-level (domain-level) reputation scoring — the curation cut web
  * pipelines apply ABOVE the document grain (RefinedWeb / CCNet style:
  * a domain that is mostly boilerplate duplicates or stub pages is dropped
  * wholesale, before per-document quality even runs; cheap, and removes
  * whole failure modes one doc-level filter can't see).
  *
  * Reputation signals, all exact-integer aggregates (bit-reproducible per
  * SURVEY §4 — the only doubles are divisions of exact ints):
  *   dup_share   — fraction of the source's docs whose exact text hash
  *                 appears more than once ANYWHERE in the corpus (a source
  *                 whose content is copied is boilerplate, whether the
  *                 copies are internal or cross-source);
  *   avg_chars   — mean document length;
  *   short_share — fraction of stub docs (< minChars).
  *
  * Scale shape: one hash+length projection of the corpus, copy counts at
  * hash grain (map-side-combined shuffle), one doc-grain join back at hash
  * grain, then a source-grain aggregate — source cardinality is web-domain
  * bounded (≤10⁷ at 100 TB), and every aggregate partial-aggregates before
  * its exchange. The per-doc verdict join broadcasts when the source frame
  * is small and degrades to a shuffle join under AQE, never fails.
  */
object SourceReputation {

  /** Per-source reputation with the keep/drop verdict. */
  def sourceReputation(documents: DataFrame,
                       dupShareMax: Double = 0.5,
                       minAvgChars: Double = 150.0,
                       minChars: Int = 100): DataFrame = {
    val hashed = documents.select(
      col("source"), md5(col("text")).as("h"),
      length(col("text")).cast("long").as("len"))
    val copies = hashed.groupBy("h").agg(count(lit(1)).as("n_copies"))
    hashed.join(copies, "h")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, lit(1L)).otherwise(lit(0L))).as("dup_docs"),
        sum(col("len")).as("total_chars"),
        sum(when(col("len") < minChars, lit(1L)).otherwise(lit(0L))).as("short_docs"))
      .withColumn("dup_share",
        col("dup_docs").cast("double") / col("n_docs").cast("double"))
      .withColumn("avg_chars",
        col("total_chars").cast("double") / col("n_docs").cast("double"))
      .withColumn("short_share",
        col("short_docs").cast("double") / col("n_docs").cast("double"))
      .withColumn("keep",
        col("dup_share") <= lit(dupShareMax) && col("avg_chars") >= lit(minAvgChars))
  }

  /** Documents surviving the source-level cut, tagged with their source's
    * reputation columns. */
  def filterBySource(documents: DataFrame,
                     dupShareMax: Double = 0.5,
                     minAvgChars: Double = 150.0): DataFrame = {
    val rep = sourceReputation(documents, dupShareMax, minAvgChars)
      .filter(col("keep"))
      .select(col("source"), col("dup_share"), col("avg_chars"))
    documents.join(rep, "source")
  }

  /** DuckDB mirror of `sourceReputation` for the correctness oracle. */
  def oracleSql(dupShareMax: Double, minAvgChars: Double, minChars: Int): String =
    s"""WITH hashed AS (
      |  SELECT source, md5(text) AS h, CAST(length(text) AS BIGINT) AS len
      |  FROM documents
      |), copies AS (
      |  SELECT h, count(*) AS n_copies FROM hashed GROUP BY 1
      |), per_source AS (
      |  SELECT source, count(*) AS n_docs,
      |    sum(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS dup_docs,
      |    sum(len) AS total_chars,
      |    sum(CASE WHEN len < $minChars THEN 1 ELSE 0 END) AS short_docs
      |  FROM hashed JOIN copies c USING (h) GROUP BY source
      |)
      |SELECT source, n_docs,
      |  CAST(dup_docs AS BIGINT) AS dup_docs,
      |  CAST(total_chars AS BIGINT) AS total_chars,
      |  CAST(short_docs AS BIGINT) AS short_docs,
      |  CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_share,
      |  CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_chars,
      |  CAST(short_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_share,
      |  (CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) <= $dupShareMax
      |   AND CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) >= $minAvgChars) AS keep
      |FROM per_source ORDER BY source""".stripMargin
}
