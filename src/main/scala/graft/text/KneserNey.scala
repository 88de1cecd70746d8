package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
  * Chen & Goodman 1999 §2.7) — the quality rung above [[StupidBackoff]]
  * on the LM ladder: absolute discounting plus a CONTINUATION-COUNT
  * lower-order distribution,
  *
  *   P(w | v) = max(c(vw) − D, 0)/c(v·) + λ(v)·P_cont(w)
  *   λ(v)     = D · N1+(v·) / c(v·)
  *   P_cont(w)= N1+(·w) / N1+(··)
  *
  * where N1+(v·) = #distinct continuations of v, N1+(·w) = #distinct
  * histories preceding w, N1+(··) = #distinct bigram types. The
  * continuation distribution is the model's point: a word that occurs
  * often but always after the SAME history ("Francisco") gets a LOW
  * unigram-tier probability — raw-frequency backoff (StupidBackoff's
  * unigram tier) overestimates exactly those words. D = 0.75, the classic
  * absolute-discount constant (Chen & Goodman's benchmark setting).
  *
  * Out-of-model edges, mirroring StupidBackoff's floor discipline:
  * a word never seen as a continuation scores the 0.5/N1+(··) floor in
  * the continuation tier; an UNSEEN HISTORY (c(v·) = 0) routes the whole
  * mass to P_cont(w). Per-token tier counts (bi / cont / oov) ride along
  * as the coverage diagnostic.
  *
  * Determinism (the UnigramLm/BigramLm/StupidBackoff contract): every
  * count is an exact integer (counts and count-distincts are both
  * partial-aggregable), the score is ONE fixed-order IEEE expression
  * spelled identically in both engines, ln is float32-collapsed and
  * quantized once to micro-nats, and per-document sums are exact integer
  * sums — hash-exact vs the DuckDB mirror.
  *
  * Scale shape: bigram construction is ROW-LOCAL (one transform over the
  * padded token array); the four count tables are partial-agg shuffles at
  * (v,w)/(v)/(w) grain (count-distinct at history/continuation grain is
  * the standard two-phase distinct agg); scoring joins the eval bigram
  * stream against each table at gram grain (SHUFFLE joins — web-scale
  * vocabularies are beyond broadcast); the 1-row type total broadcasts.
  * Linear end to end — KN's discount needs no EM or renormalization pass,
  * which is why it survives at corpus scale.
  */
object KneserNey {

  val Start = "<s>"
  /** Absolute discount, spelled as the same literal in both engines. */
  val D = "0.75"
  /** Floor numerator for never-seen continuations (0.5/N1+(··)). */
  val OovNum = "0.5"

  /** Default LM split: train on ~80% of docs, score the held-out rest
    * (same split as [[StupidBackoff]]). */
  def defaultTrainPred: Column = col("doc_id") % 5 =!= 0

  /** (doc_id, prev, cur) bigram stream with one start pad — row-local. */
  private def bigrams(documents: DataFrame): DataFrame =
    documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("ws1", expr(s"concat(array('$Start'), toksf)"))
      .withColumn("bg", explode(expr(
        """transform(sequence(1, size(toksf)), i -> named_struct(
          |  'prev', element_at(ws1, i),
          |  'cur', element_at(toksf, i)))""".stripMargin)))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))

  /** Continuation-tier probability: spelled once, used by both engines. */
  private val PContSql =
    s"""CASE WHEN n1p_cont IS NOT NULL
       |       THEN CAST(n1p_cont AS DOUBLE) / CAST(n_types AS DOUBLE)
       |     ELSE $OovNum / CAST(n_types AS DOUBLE) END""".stripMargin

  /** Full interpolated score given a `p_cont` column. */
  private val ScoreSql =
    s"""CASE WHEN c_hist IS NULL THEN p_cont
       |     ELSE (CASE WHEN c_bi IS NOT NULL
       |                  THEN CAST(c_bi AS DOUBLE) - $D
       |                ELSE CAST(0.0 AS DOUBLE) END) / CAST(c_hist AS DOUBLE)
       |          + (($D * CAST(n1p_hist AS DOUBLE)) / CAST(c_hist AS DOUBLE)) * p_cont
       |     END""".stripMargin

  /** Held-out per-document log-probability under the interpolated-KN LM
    * trained on `trainPred` docs: (doc_id, n_tokens, sum_lp_micro, n_bi,
    * n_cont, n_oov, avg_logprob, bits_per_token). Tier labels: `bi` =
    * bigram seen (discounted term non-zero), `cont` = scored from the
    * continuation distribution (unseen bigram or unseen history), `oov` =
    * word never seen as a continuation (floor). */
  def docLogProb(documents: DataFrame,
                 trainPred: Column = defaultTrainPred): DataFrame = {
    val train = bigrams(documents.filter(trainPred))
    val eval = bigrams(documents.filter(!trainPred))

    val cBi = train.groupBy("prev", "cur").agg(count(lit(1)).as("c_bi"))
    // The history and continuation tables are exact rollups of the bigram
    // table — c_hist(prev) = Σ_cur c_bi, n1p_hist(prev) = #cBi rows per
    // prev, n1p_cont(cur) = #cBi rows per cur (that IS the
    // distinct-continuation/history count) — so derive them from cBi
    // instead of re-aggregating the exploded bigram stream: two fewer full
    // corpus passes (guide §2.3), the cBi exchange reused across rollups,
    // and countDistinct's expand disappears. Identical integers.
    val hist = cBi.groupBy("prev")
      .agg(sum(col("c_bi")).as("c_hist"), count(lit(1)).as("n1p_hist"))
    val cont = cBi.groupBy("cur").agg(count(lit(1)).as("n1p_cont"))
    val types = cBi.agg(count(lit(1)).as("n_types"))

    eval
      .join(cBi.hint("merge"), Seq("prev", "cur"), "left")
      .join(hist.hint("merge"), Seq("prev"), "left")
      .join(cont.hint("merge"), Seq("cur"), "left")
      .crossJoin(broadcast(types))
      .withColumn("tier",
        when(col("c_bi").isNotNull, "bi")
          .when(col("n1p_cont").isNotNull, "cont")
          .otherwise("oov"))
      .withColumn("p_cont", expr(PContSql))
      .withColumn("lp_micro",
        floor(expr(s"CAST(CAST(ln($ScoreSql) AS FLOAT) AS DOUBLE)")
          * lit(1000000.0)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp_micro")).as("sum_lp_micro"),
        sum(when(col("tier") === "bi", 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("tier") === "cont", 1L).otherwise(0L)).as("n_cont"),
        sum(when(col("tier") === "oov", 1L).otherwise(0L)).as("n_oov"))
      .withColumn("avg_logprob",
        col("sum_lp_micro").cast("double") / lit(1000000.0) / col("n_tokens"))
      .withColumn("bits_per_token",
        -col("avg_logprob") / lit(UnigramLm.Ln2Literal.toDouble))
  }

  /** DuckDB mirror of [[docLogProb]] at the default split. */
  def oracleSql: String =
    s"""WITH tokd AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks,
       |    (doc_id % 5 <> 0) AS is_train
       |  FROM documents
       |), bg AS (
       |  SELECT doc_id, is_train,
       |    CASE WHEN i <= 1 THEN '$Start' ELSE toks[i - 1] END AS prev,
       |    toks[i] AS cur
       |  FROM (SELECT doc_id, is_train, toks,
       |          unnest(generate_series(1, len(toks))) AS i FROM tokd)
       |), tr AS (SELECT prev, cur FROM bg WHERE is_train),
       |ev AS (SELECT doc_id, prev, cur FROM bg WHERE NOT is_train),
       |cbi AS (SELECT prev, cur, count(*) AS c_bi FROM tr GROUP BY 1, 2),
       |hist AS (SELECT prev, count(*) AS c_hist,
       |           count(DISTINCT cur) AS n1p_hist FROM tr GROUP BY 1),
       |cont AS (SELECT cur, count(DISTINCT prev) AS n1p_cont FROM tr GROUP BY 1),
       |typ AS (SELECT count(*) AS n_types FROM cbi),
       |tiered AS (
       |  SELECT e.doc_id,
       |    CASE WHEN c_bi IS NOT NULL THEN 'bi'
       |         WHEN n1p_cont IS NOT NULL THEN 'cont'
       |         ELSE 'oov' END AS tier,
       |    c_bi, c_hist, n1p_hist,
       |    $PContSql AS p_cont
       |  FROM ev e
       |  LEFT JOIN cbi USING (prev, cur)
       |  LEFT JOIN hist USING (prev)
       |  LEFT JOIN cont USING (cur)
       |  CROSS JOIN typ
       |), scored AS (
       |  SELECT doc_id, tier,
       |    CAST(floor(CAST(CAST(ln($ScoreSql) AS FLOAT) AS DOUBLE)
       |      * 1000000.0) AS BIGINT) AS lp_micro
       |  FROM tiered
       |), agg AS (
       |  SELECT doc_id, count(*) AS n_tokens, sum(lp_micro) AS sum_lp_micro,
       |    sum(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END) AS n_bi,
       |    sum(CASE WHEN tier = 'cont' THEN 1 ELSE 0 END) AS n_cont,
       |    sum(CASE WHEN tier = 'oov' THEN 1 ELSE 0 END) AS n_oov
       |  FROM scored GROUP BY 1
       |)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
       |  CAST(n_bi AS BIGINT) AS n_bi, CAST(n_cont AS BIGINT) AS n_cont,
       |  CAST(n_oov AS BIGINT) AS n_oov,
       |  CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens AS avg_logprob,
       |  -(CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens) / ${UnigramLm.Ln2Literal} AS bits_per_token
       |FROM agg ORDER BY doc_id""".stripMargin
}
