package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Moore–Lewis cross-entropy-difference data selection (Moore & Lewis
  * 2010, "Intelligent Selection of Language Model Training Data"): score
  * every candidate document by
  *   Δ(d) = log P_in(d) − log P_gen(d)   (per-token),
  * the in-domain LM's preference over a general-corpus LM. Selecting
  * Δ > 0 keeps text that looks more like the target domain than like the
  * background crawl — the standard recipe for carving a domain slice out
  * of a web-scale corpus (and the ancestor of DSIR, whose hashed-n-gram
  * variant `q_dsir_weights` already implements; this is the exact-unigram
  * original).
  *
  * Model shapes: both LMs are unigram with the 0.5/N out-of-vocabulary
  * floor (the [[StupidBackoff]] floor discipline). In-domain = the `en`
  * documents of the train split; general = the WHOLE train split; scored
  * = the held-out split across all languages, so the query demonstrates
  * both acceptance (English-looking docs) and rejection.
  *
  * Determinism: both log-probs are float32-collapsed and micro-nat
  * quantized PER TOKEN, the per-token delta is an integer subtraction,
  * and per-doc sums are exact integer sums — hash-exact vs the DuckDB
  * mirror (the UnigramLm contract).
  *
  * Scale shape: two (word)-grain count tables (partial-agg shuffles);
  * scoring joins the eval token stream against each at word grain
  * (shuffle joins — web-scale vocabularies are beyond broadcast); the two
  * 1-row totals broadcast. Linear end to end; selection is a row-local
  * threshold on the integer sum.
  */
object MooreLewis {

  /** OOV floor numerator, same literal both engines. */
  val OovNum = "0.5"

  /** Train/score split (the StupidBackoff/KneserNey convention). */
  def defaultTrainPred: Column = col("doc_id") % 5 =!= 0

  /** In-domain language for the default query surface. */
  val InDomainLang = "en"

  private def tokens(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")

  /** Per-token micro-nat log-prob under a (word, c) count table with
    * total N: floor(1e6 · float32(ln(p))) with p = c/N or the OOV floor. */
  private def lpMicroSql(cCol: String, nCol: String): String =
    s"""CAST(floor(CAST(CAST(ln(
       |  CASE WHEN $cCol IS NOT NULL
       |         THEN CAST($cCol AS DOUBLE) / CAST($nCol AS DOUBLE)
       |       ELSE $OovNum / CAST($nCol AS DOUBLE) END
       |) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT)""".stripMargin

  /** Held-out per-document cross-entropy-difference scores:
    * (doc_id, lang, n_tokens, sum_delta_micro, avg_delta_nats, selected).
    * `selected` = the document reads as more in-domain than general. */
  def docScores(documents: DataFrame,
                trainPred: Column = defaultTrainPred,
                inDomainLang: String = InDomainLang): DataFrame = {
    val train = tokens(documents.filter(trainPred))
    val eval = tokens(documents.filter(!trainPred))

    val cIn = train.filter(col("lang") === inDomainLang)
      .groupBy("word").agg(count(lit(1)).as("c_in"))
    val cGen = train.groupBy("word").agg(count(lit(1)).as("c_gen"))
    val nIn = cIn.agg(sum(col("c_in")).as("n_in"))
    val nGen = cGen.agg(sum(col("c_gen")).as("n_gen"))

    eval
      .join(cIn.hint("merge"), Seq("word"), "left")
      .join(cGen.hint("merge"), Seq("word"), "left")
      .crossJoin(broadcast(nIn))
      .crossJoin(broadcast(nGen))
      .withColumn("delta_micro",
        expr(lpMicroSql("c_in", "n_in")) - expr(lpMicroSql("c_gen", "n_gen")))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("delta_micro")).as("sum_delta_micro"))
      .withColumn("avg_delta_nats",
        col("sum_delta_micro").cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double"))
      .withColumn("selected", col("sum_delta_micro") > 0L)
  }

  /** DuckDB mirror of [[docScores]] at the defaults. */
  def oracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, (doc_id % 5 <> 0) AS is_train,
       |    unnest(string_split(text, ' ')) AS word
       |  FROM documents
       |), tok2 AS (
       |  SELECT * FROM tok WHERE word <> ''
       |), cin AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS c_in FROM tok2
       |  WHERE is_train AND lang = '$InDomainLang' GROUP BY 1
       |), cgen AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS c_gen FROM tok2
       |  WHERE is_train GROUP BY 1
       |), nin AS (SELECT CAST(sum(c_in) AS BIGINT) AS n_in FROM cin),
       |ngen AS (SELECT CAST(sum(c_gen) AS BIGINT) AS n_gen FROM cgen),
       |scored AS (
       |  SELECT e.doc_id, e.lang,
       |    ${lpMicroSql("c_in", "n_in")}
       |      - ${lpMicroSql("c_gen", "n_gen")} AS delta_micro
       |  FROM tok2 e
       |  LEFT JOIN cin USING (word)
       |  LEFT JOIN cgen USING (word)
       |  CROSS JOIN nin CROSS JOIN ngen
       |  WHERE NOT e.is_train
       |), agg AS (
       |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(delta_micro) AS BIGINT) AS sum_delta_micro
       |  FROM scored GROUP BY 1, 2
       |)
       |SELECT doc_id, lang, n_tokens, sum_delta_micro,
       |  CAST(sum_delta_micro AS DOUBLE) / 1000000.0 / CAST(n_tokens AS DOUBLE)
       |    AS avg_delta_nats,
       |  sum_delta_micro > 0 AS selected
       |FROM agg ORDER BY doc_id""".stripMargin
}
