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

  /** Confusion matrix + accuracy rollup of [[languageId]] against the
    * labeled `lang` column — the eval table that turns the classifier
    * into a measured component (which languages bleed into which, where
    * the marker lists need work). One (actual, predicted)-grain
    * partial-agg exchange; the marginals and windows run over the
    * ≤|langs|² cell frame — bounded by the label space, never the data;
    * accuracy and shares are single IEEE divisions of exact BIGINTs.
    */
  def langIdConfusion(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = languageId(documents)
      .groupBy("actual_lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))
    val wActual = Window.partitionBy("actual_lang")
    val wAll = Window.partitionBy(lit(1))
    cells
      .withColumn("actual_n", sum(col("n")).over(wActual))
      .withColumn("total_n", sum(col("n")).over(wAll))
      .withColumn("correct_n",
        sum(when(col("actual_lang") === col("predicted_lang"), col("n"))
          .otherwise(lit(0L))).over(wAll))
      .withColumn("share_of_actual",
        col("n").cast("double") / col("actual_n").cast("double"))
      .withColumn("accuracy",
        col("correct_n").cast("double") / col("total_n").cast("double"))
      .select("actual_lang", "predicted_lang", "n", "actual_n",
        "share_of_actual", "accuracy")
  }

  /** The [[languageId]] oracle as a CTE chain ending in `t2` (doc grain,
    * actual + predicted), shared by q_lang_id and q_langid_confusion. */
  def langIdOracleCtes: String = {
    def mk(lang: String): String = {
      val list = LangMarkers(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($list))) AS BIGINT) AS s_$lang"
    }
    s"""WITH t AS (
       |  SELECT doc_id, lang AS actual_lang,
       |    ${Seq("de", "en", "es", "fr", "zh").map(mk).mkString(",\n    ")}
       |  FROM documents
       |), t2 AS (
       |  SELECT *,
       |    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |         WHEN s_fr >= s_zh THEN 'fr'
       |         ELSE 'zh' END AS predicted_lang
       |  FROM t
       |)""".stripMargin
  }

  /** Heaps'-law vocabulary-growth curve: walking the corpus in doc_id
    * order, the cumulative token count vs the cumulative count of NOVEL
    * token types — the statistic that sizes a tokenizer vocabulary and
    * detects template-heavy corpora (a flattening curve = new documents
    * stop contributing new words long before they stop contributing
    * tokens).
    *
    * Exact and distributed: "novel at doc d" = min(first-occurrence
    * doc_id) per token — one token-grain groupBy, never a running
    * distinct; both cumulative sums ride the grouped prefix-sum primitive
    * (no single-partition window). All integers → hash-exact. */
  def vocabGrowth(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val newTypes = toks.groupBy("token").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_new_types"))
    val joined = perDoc.join(newTypes, Seq("doc_id"), "left")
      .withColumn("n_new_types", coalesce(col("n_new_types"), lit(0L)))
    val g = lit(1)
    val c = graft.operators.ScalableRank.withGroupedPrefixSum(
      graft.operators.ScalableRank.withGroupedPrefixSum(
        joined, g, Seq(col("doc_id").asc), col("n_tokens"), "_xt"),
      g, Seq(col("doc_id").asc), col("n_new_types"), "_xy")
    c.select(col("doc_id"), col("n_tokens"), col("n_new_types"),
      (col("_xt") + col("n_tokens")).as("cum_tokens"),
      (col("_xy") + col("n_new_types")).as("cum_types"))
  }

  /** DuckDB mirror of [[vocabGrowth]]. */
  def vocabGrowthOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      |  FROM documents
      |), pd AS (
      |  SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1
      |), fs AS (
      |  SELECT token, min(doc_id) AS doc_id FROM tok GROUP BY 1
      |), nt AS (
      |  SELECT doc_id, count(*) AS n_new_types FROM fs GROUP BY 1
      |), j AS (
      |  SELECT pd.doc_id, pd.n_tokens, COALESCE(nt.n_new_types, 0) AS n_new_types
      |  FROM pd LEFT JOIN nt USING (doc_id)
      |)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_new_types AS BIGINT) AS n_new_types,
      |  CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
      |  CAST(sum(n_new_types) OVER (ORDER BY doc_id) AS BIGINT) AS cum_types
      |FROM j ORDER BY doc_id""".stripMargin
}
