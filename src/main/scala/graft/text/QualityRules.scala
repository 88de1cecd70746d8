package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1 — the rule set most later corpora, e.g. RefinedWeb and
  * Dolma, derive their quality gates from), complementing the
  * ratio-based heuristic scoring in [[TextAnalysis]] (`q_text_quality`)
  * and the repetition gate in [[Curation]] (`q_rep_filter`): each rule
  * is a hard pass/fail with its measured evidence column, so a corpus
  * cut is reproducible and auditable per document.
  *
  * Rules (per document):
  *  - word count within [minWords, maxWords]
  *  - mean word length within [minMeanWordLen, maxMeanWordLen]
  *  - symbol-word ratio (words containing '#' or '...') ≤ maxSymbolRatio
  *  - alphabetic-word ratio (words with ≥1 letter) ≥ minAlphaWordRatio
  *  - stop-word hits ≥ minStopWords (Gopher's 2-of-8 English stop set)
  *  - bullet-started line ratio ≤ maxBulletRatio and ellipsis-ended line
  *    ratio ≤ maxEllipsisRatio
  *
  * Scale shape: one narrow projection — every metric is a codegen'd
  * higher-order function over the token/line arrays of the row itself
  * (no shuffle, no join, no UDF), so the filter runs at scan speed and
  * composes with partition pruning. Counts are exact integers; ratios
  * are single IEEE divisions of those integers, so the whole frame is
  * hash-exact against the DuckDB oracle (SURVEY §4 rules).
  */
object QualityRules {

  /** Gopher's stop set: a document with ≥2 of these is likely running
    * English prose rather than a listing or table dump. */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQuality(documents: DataFrame,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanWordLen: Double = 3.0,
                    maxMeanWordLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    minAlphaWordRatio: Double = 0.8,
                    minStopWords: Int = 2,
                    maxBulletRatio: Double = 0.9,
                    maxEllipsisRatio: Double = 0.3,
                    keepText: Boolean = false): DataFrame = {
    val stopList = StopWords.map(w => s"'$w'").mkString(", ")
    def bigint(c: Column): Column = c.cast("long")
    val carry = if (keepText) Seq(col("text")) else Seq.empty
    documents
      .select(Seq(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("toks"),
        split(col("text"), "\n").as("lines")) ++ carry: _*)
      .select(Seq(col("doc_id"), col("lang"), col("source")) ++ carry ++ Seq(
        bigint(size(col("toks"))).as("n_words"),
        bigint(expr("aggregate(transform(toks, w -> length(w)), 0L, (a, x) -> a + x)"))
          .as("word_chars"),
        bigint(expr(
          "size(filter(toks, w -> contains(w, '#') OR contains(w, '...')))"))
          .as("n_symbol_words"),
        bigint(expr("size(filter(toks, w -> w rlike '[a-zA-Z]'))"))
          .as("n_alpha_words"),
        bigint(expr(s"size(filter(toks, w -> lower(w) IN ($stopList)))"))
          .as("n_stop_words"),
        bigint(size(col("lines"))).as("n_lines"),
        bigint(expr(
          "size(filter(lines, l -> startswith(ltrim(l), '-') OR " +
            "startswith(ltrim(l), '*') OR startswith(ltrim(l), '•')))"))
          .as("n_bullet_lines"),
        bigint(expr("size(filter(lines, l -> endswith(rtrim(l), '...')))"))
          .as("n_ellipsis_lines")): _*)
      .withColumn("mean_word_len",
        col("word_chars").cast("double") / col("n_words"))
      .withColumn("symbol_ratio",
        col("n_symbol_words").cast("double") / col("n_words"))
      .withColumn("alpha_ratio",
        col("n_alpha_words").cast("double") / col("n_words"))
      .withColumn("bullet_ratio",
        col("n_bullet_lines").cast("double") / col("n_lines"))
      .withColumn("ellipsis_ratio",
        col("n_ellipsis_lines").cast("double") / col("n_lines"))
      .withColumn("pass_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_word_len",
        col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
      .withColumn("pass_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("pass_alpha", col("alpha_ratio") >= minAlphaWordRatio)
      .withColumn("pass_stops", col("n_stop_words") >= minStopWords)
      .withColumn("pass_lines",
        col("bullet_ratio") <= maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisRatio)
      .withColumn("passes_gopher",
        col("pass_word_count") && col("pass_word_len") &&
          col("pass_symbols") && col("pass_alpha") && col("pass_stops") &&
          col("pass_lines"))
      .select((Seq("doc_id", "lang", "source", "n_words", "word_chars",
        "mean_word_len", "n_symbol_words", "symbol_ratio", "n_alpha_words",
        "alpha_ratio", "n_stop_words", "n_lines", "n_bullet_lines",
        "n_ellipsis_lines", "bullet_ratio", "ellipsis_ratio",
        "pass_word_count", "pass_word_len", "pass_symbols", "pass_alpha",
        "pass_stops", "pass_lines", "passes_gopher") ++
        (if (keepText) Seq("text") else Nil)).map(col): _*)
  }

  /** The DuckDB mirror of [[gopherQuality]] at default thresholds. */
  def gopherOracleSql(minWords: Int = 50, maxWords: Int = 100000,
                      minMeanWordLen: Double = 3.0,
                      maxMeanWordLen: Double = 10.0,
                      maxSymbolRatio: Double = 0.1,
                      minAlphaWordRatio: Double = 0.8,
                      minStopWords: Int = 2,
                      maxBulletRatio: Double = 0.9,
                      maxEllipsisRatio: Double = 0.3): String = {
    val stopList = StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang, source,
       |    string_split(text, ' ') AS toks,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS word_chars,
       |    CAST(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS n_symbol_words,
       |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST(len(list_filter(toks, w -> lower(w) IN ($stopList))) AS BIGINT) AS n_stop_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet_lines,
       |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ellipsis_lines
       |  FROM t
       |), r AS (
       |  SELECT *,
       |    CAST(word_chars AS DOUBLE) / n_words AS mean_word_len,
       |    CAST(n_symbol_words AS DOUBLE) / n_words AS symbol_ratio,
       |    CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_ratio,
       |    CAST(n_bullet_lines AS DOUBLE) / n_lines AS bullet_ratio,
       |    CAST(n_ellipsis_lines AS DOUBLE) / n_lines AS ellipsis_ratio
       |  FROM m
       |), p AS (
       |  SELECT *,
       |    (n_words >= $minWords AND n_words <= $maxWords) AS pass_word_count,
       |    (mean_word_len >= $minMeanWordLen AND mean_word_len <= $maxMeanWordLen) AS pass_word_len,
       |    (symbol_ratio <= $maxSymbolRatio) AS pass_symbols,
       |    (alpha_ratio >= $minAlphaWordRatio) AS pass_alpha,
       |    (n_stop_words >= $minStopWords) AS pass_stops,
       |    (bullet_ratio <= $maxBulletRatio AND ellipsis_ratio <= $maxEllipsisRatio) AS pass_lines
       |  FROM r
       |)
       |SELECT doc_id, lang, source, n_words, word_chars, mean_word_len,
       |  n_symbol_words, symbol_ratio, n_alpha_words, alpha_ratio,
       |  n_stop_words, n_lines, n_bullet_lines, n_ellipsis_lines,
       |  bullet_ratio, ellipsis_ratio,
       |  pass_word_count, pass_word_len, pass_symbols, pass_alpha,
       |  pass_stops, pass_lines,
       |  (pass_word_count AND pass_word_len AND pass_symbols AND pass_alpha
       |    AND pass_stops AND pass_lines) AS passes_gopher
       |FROM p ORDER BY doc_id""".stripMargin
  }
}
