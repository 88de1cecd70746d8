package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model scoring — the next rung above
  * UnigramLm on the KenLM ladder: p(cur | prev) = λ·p_bi + (1−λ)·p_uni
  * with a `<s>` start symbol so every token has a history. Bigram
  * perplexity separates corpus-like WORD ORDER from shuffled/boilerplate
  * text that unigram statistics cannot distinguish (same words, wrong
  * order scores the same under a unigram LM).
  *
  * Determinism across engines (the UnigramLm contract): each token's
  * interpolated probability is computed from exact integer counts in fixed
  * expression order, ln is float32-collapsed, quantized once to fixed-point
  * micro-nats, and per-document sums run on exact integers — no
  * order-dependent double sums anywhere.
  *
  * Scale shape: bigram construction is ROW-LOCAL (a zip of the token array
  * with its shifted self — never a corpus self-join at token grain); counts
  * are partial-agg shuffles at (prev,cur) / prev / cur grain; the LM table
  * is bigram-vocabulary grain and joins back onto the exploded bigram
  * stream as a SHUFFLE join (web-scale bigram vocabularies are far beyond
  * broadcast, same reasoning as UnigramLm's token join); the per-doc
  * reduction is a (doc_id) partial agg. Linear, no self-joins.
  */
object BigramLm {

  val Start = "<s>"
  /** Interpolation weight on the bigram term; (1 − λ) spelled as its own
    * exact literal in BOTH engines. */
  val Lambda = "0.75"
  val OneMinusLambda = "0.25"

  def docLogProb(documents: DataFrame): DataFrame = {
    val withBigrams = documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("ws", expr(s"concat(array('$Start'), toksf)"))
      .withColumn("bg", explode(expr(
        "zip_with(slice(ws, 1, size(toksf)), toksf, (p, c) -> named_struct('prev', p, 'cur', c))")))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))

    val cbi = withBigrams.groupBy("prev", "cur").agg(count(lit(1)).as("c_bi"))
    // The lower-order tables are exact integer rollups of the bigram
    // table (c_left(prev) = Σ_cur c_bi, c_uni(cur) = Σ_prev c_bi): derive
    // them from cbi instead of re-aggregating the exploded token stream —
    // two fewer full corpus passes (guide §2.3), and the shared cbi
    // exchange is reused across the rollups. Identical integers, so the
    // hash-exact contract is untouched.
    val cleft = cbi.groupBy("prev").agg(sum(col("c_bi")).as("c_left"))
    val cuni = cbi.groupBy("cur").agg(sum(col("c_bi")).as("c_uni"))
    val total = cuni.agg(sum(col("c_uni")).as("total_tokens"))

    // Fixed-point micro-nat log-prob per bigram-vocabulary entry.
    val lm = cbi
      .join(cleft.hint("merge"), Seq("prev"))
      .join(cuni.hint("merge"), Seq("cur"))
      .crossJoin(broadcast(total))
      .withColumn("lp_micro",
        floor(expr(
          s"""CAST(CAST(ln($Lambda * (CAST(c_bi AS DOUBLE) / CAST(c_left AS DOUBLE))
             | + $OneMinusLambda * (CAST(c_uni AS DOUBLE) / CAST(total_tokens AS DOUBLE))) AS FLOAT) AS DOUBLE)""".stripMargin)
          * lit(1000000.0)).cast("long"))
      .select("prev", "cur", "lp_micro")

    withBigrams
      .join(lm.hint("merge"), Seq("prev", "cur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("sum_lp_micro"))
      .withColumn("avg_logprob",
        col("sum_lp_micro").cast("double") / lit(1000000.0) / col("n_tokens"))
      .withColumn("bits_per_token",
        -col("avg_logprob") / lit(UnigramLm.Ln2Literal.toDouble))
      .select("doc_id", "n_tokens", "sum_lp_micro", "avg_logprob", "bits_per_token")
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): every document
    * ranked by LM fluency (per-token log-prob desc — the low-perplexity
    * "head" first) and cut into head/middle/tail terciles. This is the
    * quality stratification CCNet uses to decide which crawl slice trains
    * at full weight and which is downsampled/dropped.
    *
    * Exactness: the rank key is one IEEE division of the exact
    * micro-nat BIGINT sum by the exact token count (identical in both
    * engines), tiebroken by doc_id; the tercile cut is pure integer
    * arithmetic on (rank, corpus size). The global rank rides
    * ScalableRank.withGlobalRowNumber (two bounded passes, no
    * single-partition window); the 1-row corpus count broadcasts. */
  def pplBuckets(documents: DataFrame): DataFrame = {
    val scored = docLogProb(documents)
    val rankedDocs = graft.operators.ScalableRank.withGlobalRowNumber(
      scored, Seq(col("avg_logprob").desc, col("doc_id").asc), "ppl_rank")
    // corpus size counted over the RANKED frame (row count preserved by
    // construction): reads ScalableRank's persisted range exchange instead
    // of recomputing the whole LM scoring chain a second time
    val total = rankedDocs.agg(count(lit(1)).as("n_docs"))
    rankedDocs
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("sum_lp_micro"),
        col("ppl_rank"),
        when(col("ppl_rank") * 3 <= col("n_docs"), lit("head"))
          .when(col("ppl_rank") * 3 <= col("n_docs") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** DuckDB mirror of `docLogProb` for the correctness oracle. */
  def oracleSql: String =
    "WITH " + oracleCtes + s"""
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
      |  CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens AS avg_logprob,
      |  -(CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens) / ${UnigramLm.Ln2Literal} AS bits_per_token
      |FROM agg ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[pplBuckets]]: the same LM CTE chain + a global
    * row_number over the identical IEEE rank key + integer tercile cut. */
  def pplBucketsOracleSql: String =
    "WITH " + oracleCtes + s"""
      |, nn AS (
      |  SELECT count(*) AS n_docs FROM agg
      |), rk AS (
      |  SELECT doc_id, n_tokens, sum_lp_micro,
      |    CAST(row_number() OVER (ORDER BY
      |      CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens DESC,
      |      doc_id ASC) AS BIGINT) AS ppl_rank
      |  FROM agg
      |)
      |SELECT r.doc_id, CAST(r.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(r.sum_lp_micro AS BIGINT) AS sum_lp_micro, r.ppl_rank,
      |  CASE WHEN r.ppl_rank * 3 <= nn.n_docs THEN 'head'
      |       WHEN r.ppl_rank * 3 <= nn.n_docs * 2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM rk r CROSS JOIN nn ORDER BY r.doc_id""".stripMargin

  /** The CTE chain ending in `agg` (doc_id, n_tokens, sum_lp_micro) —
    * shared by the log-prob oracle and the perplexity-bucket oracle. */
  private def oracleCtes: String =
    s"""toksf AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), idx AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM toksf
      |), big AS (
      |  SELECT doc_id,
      |    CASE WHEN i = 1 THEN '$Start' ELSE toks[i - 1] END AS prev,
      |    toks[i] AS cur
      |  FROM idx
      |), cbi AS (
      |  SELECT prev, cur, count(*) AS c_bi FROM big GROUP BY 1, 2
      |), cleft AS (
      |  SELECT prev, count(*) AS c_left FROM big GROUP BY 1
      |), cuni AS (
      |  SELECT cur, count(*) AS c_uni FROM big GROUP BY 1
      |), tot AS (
      |  SELECT sum(c_uni) AS total_tokens FROM cuni
      |), lm AS (
      |  SELECT prev, cur,
      |    CAST(floor(CAST(CAST(ln($Lambda * (CAST(c_bi AS DOUBLE) / CAST(c_left AS DOUBLE))
      |       + $OneMinusLambda * (CAST(c_uni AS DOUBLE) / CAST(t.total_tokens AS DOUBLE))) AS FLOAT) AS DOUBLE)
      |      * 1000000.0) AS BIGINT) AS lp_micro
      |  FROM cbi JOIN cleft USING (prev) JOIN cuni USING (cur) CROSS JOIN tot t
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_tokens, sum(lp_micro) AS sum_lp_micro
      |  FROM big JOIN lm USING (prev, cur) GROUP BY 1
      |)""".stripMargin
}
