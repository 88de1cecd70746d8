package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability statistics per language — Automated Readability Index
  * (Smith & Senter 1967) and Coleman–Liau (Coleman & Liau 1975). Both
  * formulas need only character/word/sentence COUNTS (no syllable
  * heuristics), so every per-document input is an exact integer and the
  * per-language scores are ONE mirrored IEEE chain over exact integer
  * sums — hash-exact against the oracle by construction (the repo's §4
  * float rule: never sum doubles across rows).
  *
  * Shape: a map-only projection (counts are codegen'd regexp/length
  * chains) into one lang-grain partial-agged exchange of 5 integer sums —
  * scan-bound at any corpus size.
  */
object Readability {

  private def countsPerDoc(documents: DataFrame): DataFrame = {
    // words: whitespace-separated tokens; sentences: terminal-mark count
    // floored at 1 (a mark-free document is one sentence); letters:
    // [A-Za-z]; chars: non-whitespace. All definitions mirrored verbatim
    // in the oracle (DuckDB regexp_replace needs the explicit 'g' flag;
    // Spark's is global by default).
    def strippedLen(re: String): Column =
      length(regexp_replace(col("text"), re, "")).cast("long")
    documents.select(
      col("lang"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), "\\s+")).cast("long")).as("words"),
      greatest(lit(1L),
        (length(col("text")) - length(regexp_replace(col("text"), "[.!?]", "")))
          .cast("long")).as("sentences"),
      strippedLen("[^A-Za-z]").as("letters"),
      strippedLen("\\s").as("chars"))
  }

  /** Per-language corpus readability: micro-averaged ARI and Coleman–Liau
    * over exact count sums. */
  def byLanguage(documents: DataFrame): DataFrame = {
    val sums = countsPerDoc(documents)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("words"), sum("sentences").as("sentences"),
        sum("letters").as("letters"), sum("chars").as("chars"))
    val w = col("words").cast("double")
    val s = col("sentences").cast("double")
    sums.select(col("lang"), col("n_docs"), col("words"), col("sentences"),
      col("letters"), col("chars"),
      (lit(4.71) * (col("chars").cast("double") / w) +
        lit(0.5) * (w / s) - lit(21.43)).as("ari"),
      (lit(0.0588) * ((col("letters").cast("double") / w) * lit(100.0)) -
        lit(0.296) * ((s / w) * lit(100.0)) - lit(15.8)).as("cli"))
  }

  val byLanguageOracleSql: String =
    """WITH counts AS (
      |  SELECT lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS words,
      |    greatest(1, length(text) - length(regexp_replace(text, '[.!?]', '', 'g'))) AS sentences,
      |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters,
      |    length(regexp_replace(text, '\s', '', 'g')) AS chars
      |  FROM documents
      |), sums AS (
      |  SELECT lang, count(*) AS n_docs, CAST(sum(words) AS BIGINT) AS words,
      |    CAST(sum(sentences) AS BIGINT) AS sentences,
      |    CAST(sum(letters) AS BIGINT) AS letters, CAST(sum(chars) AS BIGINT) AS chars
      |  FROM counts GROUP BY lang
      |)
      |SELECT lang, n_docs, words, sentences, letters, chars,
      |  4.71 * (CAST(chars AS DOUBLE) / CAST(words AS DOUBLE)) +
      |    0.5 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) - 21.43 AS ari,
      |  0.0588 * ((CAST(letters AS DOUBLE) / CAST(words AS DOUBLE)) * 100.0) -
      |    0.296 * ((CAST(sentences AS DOUBLE) / CAST(words AS DOUBLE)) * 100.0) - 15.8 AS cli
      |FROM sums ORDER BY lang""".stripMargin
}
