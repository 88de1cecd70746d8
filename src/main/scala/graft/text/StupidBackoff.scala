package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trigram language model with Stupid Backoff (Brants et al. 2007, "Large
  * Language Models in Machine Translation") — the web-scale rung above
  * [[BigramLm]] on the KenLM ladder: no discounting or normalization to
  * coordinate across the cluster, just relative frequencies with a fixed
  * backoff multiplier,
  *   S(w | u, v) = c(uvw)/c(uv)            when the trigram was seen,
  *               = α · c(vw)/c(v)           else if the bigram was seen,
  *               = α² · c(w)/N              else if the word was seen,
  *               = α² · 0.5/N               for out-of-vocabulary words,
  * with α = 0.4 (the paper's constant). Brants' point is exactly the
  * 100 TB point: backoff scores need only count tables, so the model is
  * embarrassingly partial-aggregatable — no EM, no renormalization pass.
  *
  * Train/score split: the LM trains on one hash-split of the corpus and
  * scores the complement — scoring the training split would never leave
  * the trigram tier (every observed trigram has c ≥ 1), so the held-out
  * split is what exercises the backoff ladder, mirroring how a CCNet-style
  * filter trains on a reference corpus and scores the crawl. Per-token
  * tier counts (trigram hit / bigram / unigram backoff / OOV) ride along —
  * the coverage diagnostic that tells a pipeline whether its reference
  * corpus is big enough.
  *
  * Determinism (the UnigramLm/BigramLm contract): scores are computed
  * from exact integer counts in fixed expression order, ln is
  * float32-collapsed, quantized once to micro-nats, and per-document sums
  * are exact integer sums — hash-exact vs the DuckDB mirror.
  *
  * Scale shape: trigram construction is ROW-LOCAL (transform over the
  * padded token array — never a corpus self-join); count tables are
  * partial-agg shuffles at (u,v,w)/(u,v)/(v,w)/(v)/(w) grain; scoring
  * joins the eval trigram stream against each table at gram grain
  * (SHUFFLE joins — web-scale gram vocabularies are beyond broadcast,
  * the BigramLm reasoning); the 1-row N broadcasts. Linear end to end.
  */
object StupidBackoff {

  val Start = "<s>"
  /** Backoff multiplier and its square, spelled as the same exact
    * literals in both engines. */
  val Alpha = "0.4"
  val AlphaSq = "0.16"
  /** OOV numerator (the 0.5/N floor). */
  val OovNum = "0.5"

  /** Default LM split: train on ~80% of docs, score the held-out rest. */
  def defaultTrainPred: Column = col("doc_id") % 5 =!= 0

  /** (doc_id, p2, p1, cur) trigram stream with two start pads — row-local:
    * one transform over the padded token array. */
  private def trigrams(documents: DataFrame): DataFrame =
    documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("ws2", expr(s"concat(array('$Start', '$Start'), toksf)"))
      .withColumn("tg", explode(expr(
        """transform(sequence(1, size(toksf)), i -> named_struct(
          |  'p2', element_at(ws2, i),
          |  'p1', element_at(ws2, i + 1),
          |  'cur', element_at(toksf, i)))""".stripMargin)))
      .select(col("doc_id"), col("tg.p2").as("p2"), col("tg.p1").as("p1"),
        col("tg.cur").as("cur"))

  /** Held-out per-document log-probability under the Stupid-Backoff LM
    * trained on `trainPred` docs: (doc_id, n_tokens, sum_lp_micro,
    * n_tri, n_bi, n_uni, n_oov, avg_logprob, bits_per_token). */
  def docLogProb(documents: DataFrame,
                 trainPred: Column = defaultTrainPred): DataFrame = {
    val train = trigrams(documents.filter(trainPred))
    val eval = trigrams(documents.filter(!trainPred))

    val cTri = train.groupBy("p2", "p1", "cur").agg(count(lit(1)).as("c_tri"))
    // Every lower-order table is an exact integer rollup of the trigram
    // table (each train position contributes exactly one row to each
    // grain): deriving them from cTri instead of re-aggregating the
    // exploded trigram stream removes four full corpus passes (guide
    // §2.3); the shared cTri exchange is reused across the rollups.
    // Identical integers — the hash-exact contract is untouched.
    val cHist2 = cTri.groupBy("p2", "p1").agg(sum(col("c_tri")).as("c_hist2"))
    val cBi = cTri.groupBy("p1", "cur").agg(sum(col("c_tri")).as("c_bi"))
    val cHist1 = cTri.groupBy("p1").agg(sum(col("c_tri")).as("c_hist1"))
    val cUni = cTri.groupBy("cur").agg(sum(col("c_tri")).as("c_uni"))
    val total = cUni.agg(sum(col("c_uni")).as("n_total"))

    val scoreSql =
      s"""CASE WHEN c_tri IS NOT NULL
         |       THEN CAST(c_tri AS DOUBLE) / CAST(c_hist2 AS DOUBLE)
         |     WHEN c_bi IS NOT NULL
         |       THEN $Alpha * (CAST(c_bi AS DOUBLE) / CAST(c_hist1 AS DOUBLE))
         |     WHEN c_uni IS NOT NULL
         |       THEN $AlphaSq * (CAST(c_uni AS DOUBLE) / CAST(n_total AS DOUBLE))
         |     ELSE $AlphaSq * ($OovNum / CAST(n_total AS DOUBLE)) END""".stripMargin

    eval
      .join(cTri.hint("merge"), Seq("p2", "p1", "cur"), "left")
      .join(cHist2.hint("merge"), Seq("p2", "p1"), "left")
      .join(cBi.hint("merge"), Seq("p1", "cur"), "left")
      .join(cHist1.hint("merge"), Seq("p1"), "left")
      .join(cUni.hint("merge"), Seq("cur"), "left")
      .crossJoin(broadcast(total))
      .withColumn("tier",
        when(col("c_tri").isNotNull, "tri")
          .when(col("c_bi").isNotNull, "bi")
          .when(col("c_uni").isNotNull, "uni")
          .otherwise("oov"))
      .withColumn("lp_micro",
        floor(expr(s"CAST(CAST(ln($scoreSql) AS FLOAT) AS DOUBLE)")
          * lit(1000000.0)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp_micro")).as("sum_lp_micro"),
        sum(when(col("tier") === "tri", 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("tier") === "bi", 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("tier") === "uni", 1L).otherwise(0L)).as("n_uni"),
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
       |), tg AS (
       |  SELECT doc_id, is_train,
       |    CASE WHEN i <= 2 THEN '$Start' ELSE toks[i - 2] END AS p2,
       |    CASE WHEN i <= 1 THEN '$Start' ELSE toks[i - 1] END AS p1,
       |    toks[i] AS cur
       |  FROM (SELECT doc_id, is_train, toks,
       |          unnest(generate_series(1, len(toks))) AS i FROM tokd)
       |), tr AS (SELECT p2, p1, cur FROM tg WHERE is_train),
       |ev AS (SELECT doc_id, p2, p1, cur FROM tg WHERE NOT is_train),
       |ctri AS (SELECT p2, p1, cur, count(*) AS c_tri FROM tr GROUP BY 1, 2, 3),
       |ch2 AS (SELECT p2, p1, count(*) AS c_hist2 FROM tr GROUP BY 1, 2),
       |cbi AS (SELECT p1, cur, count(*) AS c_bi FROM tr GROUP BY 1, 2),
       |ch1 AS (SELECT p1, count(*) AS c_hist1 FROM tr GROUP BY 1),
       |cuni AS (SELECT cur, count(*) AS c_uni FROM tr GROUP BY 1),
       |tot AS (SELECT count(*) AS n_total FROM tr),
       |scored AS (
       |  SELECT e.doc_id,
       |    CASE WHEN c_tri IS NOT NULL THEN 'tri'
       |         WHEN c_bi IS NOT NULL THEN 'bi'
       |         WHEN c_uni IS NOT NULL THEN 'uni'
       |         ELSE 'oov' END AS tier,
       |    CAST(floor(CAST(CAST(ln(
       |      CASE WHEN c_tri IS NOT NULL
       |             THEN CAST(c_tri AS DOUBLE) / CAST(c_hist2 AS DOUBLE)
       |           WHEN c_bi IS NOT NULL
       |             THEN $Alpha * (CAST(c_bi AS DOUBLE) / CAST(c_hist1 AS DOUBLE))
       |           WHEN c_uni IS NOT NULL
       |             THEN $AlphaSq * (CAST(c_uni AS DOUBLE) / CAST(n_total AS DOUBLE))
       |           ELSE $AlphaSq * ($OovNum / CAST(n_total AS DOUBLE)) END
       |    ) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS lp_micro
       |  FROM ev e
       |  LEFT JOIN ctri USING (p2, p1, cur)
       |  LEFT JOIN ch2 USING (p2, p1)
       |  LEFT JOIN cbi USING (p1, cur)
       |  LEFT JOIN ch1 USING (p1)
       |  LEFT JOIN cuni USING (cur)
       |  CROSS JOIN tot
       |), agg AS (
       |  SELECT doc_id, count(*) AS n_tokens, sum(lp_micro) AS sum_lp_micro,
       |    sum(CASE WHEN tier = 'tri' THEN 1 ELSE 0 END) AS n_tri,
       |    sum(CASE WHEN tier = 'bi' THEN 1 ELSE 0 END) AS n_bi,
       |    sum(CASE WHEN tier = 'uni' THEN 1 ELSE 0 END) AS n_uni,
       |    sum(CASE WHEN tier = 'oov' THEN 1 ELSE 0 END) AS n_oov
       |  FROM scored GROUP BY 1
       |)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
       |  CAST(n_tri AS BIGINT) AS n_tri, CAST(n_bi AS BIGINT) AS n_bi,
       |  CAST(n_uni AS BIGINT) AS n_uni, CAST(n_oov AS BIGINT) AS n_oov,
       |  CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens AS avg_logprob,
       |  -(CAST(sum_lp_micro AS DOUBLE) / 1000000.0 / n_tokens) / ${UnigramLm.Ln2Literal} AS bits_per_token
       |FROM agg ORDER BY doc_id""".stripMargin
}
