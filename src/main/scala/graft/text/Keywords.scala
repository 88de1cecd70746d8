package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
  * Extraction from Individual Documents"): candidate phrases are maximal
  * runs of content words between stopword/non-alpha breaks; a word scores
  * degree/frequency where degree sums the lengths of every phrase the
  * word appears in (its within-phrase co-occurrence count, self included)
  * and frequency counts its phrase occurrences; a phrase scores the sum
  * of its word scores.
  *
  * Scale shape: one tokenize pass; phrase segmentation is a per-document
  * prefix sum (window partitioned by doc_id — bounded by document length,
  * never corpus-spanning); phrase length is a second bounded window over
  * (doc, phrase); word statistics are ONE word-grain partial-agg shuffle
  * (vocabulary grain, the same shape as TF-IDF/collocations); phrase
  * scoring joins the word table back at token grain — shuffle-joined,
  * never broadcast (vocabularies are unbounded at crawl scale).
  *
  * Float discipline (SURVEY §4): a word's score is ONE double division of
  * exact BIGINTs (IEEE-identical cross-engine). Phrase scores sum across
  * words, and float addition order is engine-dependent — so the summed
  * quantity is the EXACT integer micro-score (degree·1e6 div freq, BIGINT)
  * and only the final display value divides once.
  *
  * Reference scope: text-analysis extension surface (the reference has no
  * NLP layer); companion to PMI collocations (Colloc.scala) and TF-IDF.
  */
object Keywords {

  /** Stopword inventory shared with the Gopher rules plus the bare
    * function words the RAKE paper breaks on. Kept deliberately small and
    * fixed: the contract is determinism, not linguistic coverage. */
  val RakeStops: Seq[String] =
    (QualityRules.StopWords ++ Seq("a", "an", "in", "on", "for", "is",
      "are", "was", "were", "it", "this", "as", "at", "by", "or")).distinct

  private def stopList: String = RakeStops.map(w => s"'$w'").mkString(", ")

  /** Token stream with phrase ids: one row per CONTENT token —
    * (doc_id, i, tok, phrase_id, phrase_len). */
  private def phraseTokens(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        posexplode(expr("filter(split(lower(text), ' '), t -> t <> '')"))
          .as(Seq("i0", "tok")))
      .withColumn("i", col("i0") + 1) // 1-based, mirrors the oracle's list index
      .withColumn("brk",
        when(col("tok").isin(RakeStops: _*) || !col("tok").rlike("[a-z]"), 1L)
          .otherwise(0L))
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPhrase = Window.partitionBy("doc_id", "phrase_id")
    toks
      .withColumn("phrase_id", sum(col("brk")).over(wDoc))
      .filter(col("brk") === 0L)
      .withColumn("phrase_len", count(lit(1)).over(wPhrase))
      .select("doc_id", "i", "tok", "phrase_id", "phrase_len")
  }

  /** Word-grain RAKE table: (word, freq, degree, score_micro, score).
    * score = degree/freq as one double division; score_micro is the exact
    * BIGINT degree·1e6 div freq that phrase scoring sums. */
  def rakeWordScores(documents: DataFrame): DataFrame =
    phraseTokens(documents)
      .groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("freq"), sum(col("phrase_len")).as("degree"))
      .withColumn("score_micro", expr("(degree * 1000000L) div freq"))
      .withColumn("score", col("degree").cast("double") / col("freq"))

  /** Phrase-grain RAKE table: distinct candidate phrases with occurrence
    * counts and the exact integer sum of member-word micro-scores. */
  def rakePhrases(documents: DataFrame): DataFrame = {
    val words = rakeWordScores(documents).select("word", "score_micro")
    phraseTokens(documents)
      .join(words, col("tok") === col("word"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("score_micro")).as("score_micro"))
      .groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("occurrences"),
        max(col("score_micro")).as("score_micro"))
      .withColumn("score", col("score_micro").cast("double") / lit(1000000.0))
  }

  /** TextRank keyword ranking (Mihalcea & Tarau 2004, the graph
    * counterpart of RAKE): nodes are content words, edges join words
    * ADJACENT in the stopword-filtered token sequence (the paper's
    * unweighted window-2 graph), scores are
    * [[graft.gold.Graph.pageRank]]'s integer-exact fixed-point PageRank —
    * the same deterministic arithmetic the device-graph query proves, so
    * an ITERATIVE graph computation over text stays hash-exact against
    * the DuckDB recursive oracle.
    *
    * Scale shape: adjacency is one per-doc lead() window (bounded by
    * document length), pair dedup is one vocab²-bounded exchange, and the
    * rank loop inherits pageRank's edge-grain join + partial-agg rounds —
    * nothing node×node, nothing driver-side. */
  def textrank(documents: DataFrame, iterations: Int = graft.gold.Graph.Iterations): DataFrame = {
    val wNext = Window.partitionBy("doc_id").orderBy("i")
    val pairs = phraseTokens(documents)
      .withColumn("nxt", lead(col("tok"), 1).over(wNext))
      .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
      .select(least(col("tok"), col("nxt")).as("user_a"),
        greatest(col("tok"), col("nxt")).as("user_b"))
      .distinct()
    graft.gold.Graph.pageRank(pairs, iterations)
      .withColumnRenamed("user_id", "token")
  }

  /** DuckDB mirror of [[textrank]]: the adjacency CTEs feed the same
    * recursive-iteration template as the device-PageRank oracle. */
  def textrankOracleSql(iterations: Int = graft.gold.Graph.Iterations): String = {
    val iters = (1 to iterations).map { i =>
      s""", p$i AS (
         |  SELECT n.node, n.degree, n.tele,
         |    CAST(n.tele + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.pr // p.degree) AS m
         |    FROM p${i - 1} p JOIN edges e ON p.node = e.src GROUP BY 1
         |  ) s USING (node))""".stripMargin
    }.mkString("\n")
    s"""WITH toksf AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      |  FROM documents
      |), idx AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM toksf
      |), ct AS (
      |  SELECT doc_id, i, toks[i] AS tok FROM idx
      |  WHERE NOT (toks[i] IN ($stopList)
      |    OR NOT regexp_matches(toks[i], '[a-z]'))
      |), adj AS (
      |  SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
      |  FROM ct
      |), pairs AS (
      |  SELECT DISTINCT least(tok, nxt) AS a, greatest(tok, nxt) AS b
      |  FROM adj WHERE nxt IS NOT NULL AND tok <> nxt
      |), edges AS (
      |  SELECT a AS src, b AS dst FROM pairs
      |  UNION ALL SELECT b, a FROM pairs
      |), deg AS (
      |  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
      |  FROM edges GROUP BY 1
      |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)
      |, nodes AS (
      |  SELECT node, degree,
      |    (15 * (1000000000000 // n)) // 100 AS tele,
      |    1000000000000 // n AS pr0
      |  FROM deg CROSS JOIN nn)
      |, p0 AS (SELECT node, degree, tele, pr0 AS pr FROM nodes)
      |$iters
      |SELECT node AS token, degree, CAST(pr AS BIGINT) AS pr_units,
      |  CAST(pr AS DOUBLE) / 1000000000000.0 AS pr_score
      |FROM p$iterations ORDER BY token""".stripMargin
  }

  /** Shared oracle CTE prefix mirroring [[phraseTokens]] and the word
    * table (DuckDB). */
  private def oracleCtes: String =
    s"""WITH toksf AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      |  FROM documents
      |), idx AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM toksf
      |), t AS (
      |  SELECT doc_id, i, toks[i] AS tok,
      |    CASE WHEN toks[i] IN ($stopList)
      |      OR NOT regexp_matches(toks[i], '[a-z]') THEN 1 ELSE 0 END AS brk
      |  FROM idx
      |), ph AS (
      |  SELECT doc_id, i, tok, brk,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
      |  FROM t
      |), pl AS (
      |  SELECT doc_id, i, tok, phrase_id,
      |    count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
      |  FROM ph WHERE brk = 0
      |), ws AS (
      |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(phrase_len) AS BIGINT) AS degree
      |  FROM pl GROUP BY 1
      |), wm AS (
      |  SELECT word, freq, degree,
      |    CAST((degree * 1000000) // freq AS BIGINT) AS score_micro
      |  FROM ws
      |)""".stripMargin

  def wordOracleSql: String =
    oracleCtes +
      """
      |SELECT word, freq, degree, score_micro,
      |  CAST(degree AS DOUBLE) / freq AS score
      |FROM wm ORDER BY word""".stripMargin

  def phraseOracleSql: String =
    oracleCtes +
      """
      |, pw AS (
      |  SELECT pl.doc_id, pl.phrase_id, pl.i, pl.tok, wm.score_micro
      |  FROM pl JOIN wm ON pl.tok = wm.word
      |), phr AS (
      |  SELECT doc_id, phrase_id,
      |    string_agg(tok, ' ' ORDER BY i) AS phrase,
      |    CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(score_micro) AS BIGINT) AS score_micro
      |  FROM pw GROUP BY 1, 2
      |)
      |SELECT phrase, max(n_words) AS n_words,
      |  CAST(count(*) AS BIGINT) AS occurrences,
      |  max(score_micro) AS score_micro,
      |  CAST(max(score_micro) AS DOUBLE) / 1000000.0 AS score
      |FROM phr GROUP BY 1 ORDER BY phrase""".stripMargin
}
