package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-pipeline curation: token counting, quality
  * scoring, language-ID heuristics. All pure projections (codegen'd
  * expressions, no UDF, no shuffle).
  */
object TextAnalysis {

  /** BPE-ish tokenizer regex: letter runs, digit runs, single punct. */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Whitespace + regex token counts, char stats. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("regex_tokens", regexp_count(col("text"), lit(TokenRegex)).cast("long"))
      .withColumn("char_count", length(col("text")).cast("long"))
      .withColumn("non_space_chars", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("avg_token_len",
        col("non_space_chars").cast("double") / col("ws_tokens"))
      .drop("text")

  /** Common function words used by the quality score's stopword ratio. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality features + a composite score (length, dup-word ratio,
    * stopword ratio, token shape), mirroring reference-style curation
    * heuristics. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val stopArr = array(Stopwords.map(lit): _*)
    documents
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("n_tokens", size(words).cast("long"))
      .withColumn("n_distinct", size(array_distinct(words)).cast("long"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("stopword_hits",
        size(filter(words, w => array_contains(stopArr, w))).cast("long"))
      .withColumn("stopword_ratio",
        col("stopword_hits").cast("double") / col("n_tokens"))
      .withColumn("len_score",
        when(col("n_tokens") >= 20 && col("n_tokens") <= 200, lit(1.0))
          .when(col("n_tokens") < 20, col("n_tokens").cast("double") / lit(20.0))
          .otherwise(lit(200.0) / col("n_tokens")))
      .withColumn("quality_score",
        col("len_score") * lit(0.4)
          + (lit(1.0) - col("dup_ratio")) * lit(0.4)
          + col("stopword_ratio") * lit(0.2))
      .withColumn("quality_bucket",
        when(col("quality_score") >= 0.7, lit("high"))
          .when(col("quality_score") >= 0.4, lit("medium"))
          .otherwise(lit("low")))
      .drop("text")
  }

  /** Per-language top-k documents by quality score — the corpus-curation
    * cut ("keep the best k per stratum"), computed with the two-phase
    * grouped top-k (no per-language single-partition window: a language can
    * span most of a 100 TB corpus). */
  def topDocsPerLang(documents: DataFrame, k: Int = 5): DataFrame =
    graft.operators.ScalableRank.topKPerGroup(
        qualityScore(documents), Seq(col("lang")),
        Seq(col("quality_score").desc, col("doc_id").asc), k, "rank_in_lang")
      .select("lang", "rank_in_lang", "doc_id", "quality_score", "quality_bucket")

  /** Marker-word lists per language for the ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("table", "scan", "merge", "window"),
    "en" -> Seq("the", "a", "fast", "key", "order"),
    "es" -> Seq("data", "row", "column", "value"),
    "fr" -> Seq("query", "join", "filter", "sort"),
    "zh" -> Seq("spark", "batch", "stream", "big"))

  /** N-gram/stopword language-ID: score = marker hits per language,
    * argmax with alphabetical tie-break. */
  def languageId(documents: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    def score(lang: String): Column = {
      val markers = array(LangMarkers(lang).map(lit): _*)
      size(filter(words, w => array_contains(markers, w))).cast("long")
    }
    val scored = documents
      .select(col("doc_id"), col("lang").as("actual_lang"), col("text"))
      .withColumn("s_de", score("de"))
      .withColumn("s_en", score("en"))
      .withColumn("s_es", score("es"))
      .withColumn("s_fr", score("fr"))
      .withColumn("s_zh", score("zh"))
      .drop("text")
    scored
      .withColumn("predicted_lang",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
          col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), lit("de"))
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_zh"), lit("en"))
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), lit("es"))
          .when(col("s_fr") >= col("s_zh"), lit("fr"))
          .otherwise(lit("zh")))
      .withColumn("correct", col("predicted_lang") === col("actual_lang"))
  }
}
