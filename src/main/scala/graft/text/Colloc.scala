package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation extraction (Church & Hanks 1990): adjacent token
  * pairs whose co-occurrence beats independence —
  * pmi(x,y) = ln(c_xy · N / (c_x · c_y)) — the classic multi-word-
  * expression / named-entity discovery signal over a training corpus,
  * and the phrase-mining step (word2vec-phrases, Mikolov et al. 2013)
  * that decides which bigrams become single tokens.
  *
  * Cross-engine determinism: c_xy·N and c_x·c_y overflow BIGINT at
  * web scale, so the ratio is never formed — each factor's ln is
  * quantized SEPARATELY to micro-nats (UnigramLm float32-round
  * contract) and PMI assembles by exact integer add/subtract:
  * q(c_xy) + q(N) − q(c_x) − q(c_y). The top-k order runs on that
  * integer, so ranking is exact in both engines.
  *
  * Scale shape: bigrams are ROW-LOCAL (token array zipped with its
  * shifted self — the BigramLm contract, never a corpus self-join);
  * counts are partial-agg shuffles at pair / token grain; the two
  * unigram joins are token-grain SHUFFLE joins (vocabulary is
  * corpus-sized — never broadcast); N is a 1-row broadcast; the final
  * cut is TakeOrderedAndProject (two-phase top-k). Linear.
  */
object Colloc {

  private def q(v: String): String =
    s"CAST(floor(CAST(CAST(ln(CAST($v AS DOUBLE)) AS FLOAT) AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"

  def pmiCollocations(documents: DataFrame, minCount: Long = 5,
                      topK: Int = 50): DataFrame = {
    val toks = documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
    val unigrams = toks
      .select(explode(col("toksf")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val total = unigrams.agg(sum(col("c")).as("n"))

    val bigrams = toks
      .filter(size(col("toksf")) >= 2)
      .withColumn("bg", explode(expr(
        "zip_with(slice(toksf, 1, size(toksf) - 1), slice(toksf, 2, size(toksf) - 1)," +
          " (x, y) -> named_struct('tx', x, 'ty', y))")))
      .select(col("bg.tx").as("token_x"), col("bg.ty").as("token_y"))
      .groupBy("token_x", "token_y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)

    bigrams
      .join(unigrams.select(col("token").as("token_x"), col("c").as("c_x")),
        Seq("token_x"))
      .join(unigrams.select(col("token").as("token_y"), col("c").as("c_y")),
        Seq("token_y"))
      .crossJoin(broadcast(total))
      .withColumn("pmi_micro",
        expr(s"${q("c_xy")} + ${q("n")} - ${q("c_x")} - ${q("c_y")}"))
      .withColumn("pmi", col("pmi_micro").cast("double") / lit(1000000.0))
      .select("token_x", "token_y", "c_xy", "c_x", "c_y", "pmi_micro", "pmi")
      .orderBy(col("pmi_micro").desc, col("token_x"), col("token_y"))
      .limit(topK)
  }

  /** DuckDB mirror for the correctness oracle. */
  def oracleSql(minCount: Long = 5, topK: Int = 50): String =
    s"""WITH toksf AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), tok AS (
      |  SELECT unnest(toks) AS token FROM toksf
      |), uni AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
      |), tot AS (
      |  SELECT sum(c) AS n FROM uni
      |), idx AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |  FROM toksf WHERE len(toks) >= 2
      |), cb AS (
      |  SELECT toks[i] AS token_x, toks[i + 1] AS token_y,
      |    CAST(count(*) AS BIGINT) AS c_xy
      |  FROM idx GROUP BY 1, 2
      |  HAVING count(*) >= $minCount
      |), pm AS (
      |  SELECT cb.token_x, cb.token_y, cb.c_xy, ux.c AS c_x, uy.c AS c_y,
      |    ${q("cb.c_xy")} + ${q("n")} - ${q("ux.c")} - ${q("uy.c")} AS pmi_micro
      |  FROM cb
      |  JOIN uni ux ON cb.token_x = ux.token
      |  JOIN uni uy ON cb.token_y = uy.token
      |  CROSS JOIN tot
      |)
      |SELECT token_x, token_y, c_xy, c_x, c_y,
      |  CAST(pmi_micro AS BIGINT) AS pmi_micro,
      |  CAST(pmi_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS pmi
      |FROM pm ORDER BY pmi_micro DESC, token_x, token_y LIMIT $topK""".stripMargin

  /** Skip-gram / GloVe co-occurrence extraction (Mikolov et al. 2013;
    * Pennington et al. 2014): the (center, context) pair table with
    * inverse-distance weights that word2vec consumes as training pairs
    * and GloVe consumes as its X_ij matrix — the training-data prep step
    * for classical embedding pipelines.
    *
    * Pair generation is ROW-LOCAL (the token array zipped with its
    * d-shifted self per distance d ≤ window — the BigramLm contract,
    * never a corpus self-join), symmetrized by emitting both
    * orientations; counts are one partial-agged (center, context)
    * exchange. GloVe's 1/d weight is micro-quantized per instance
    * (⌊10⁶/d⌋, a per-branch literal) so the weight sum is an exact
    * integer with ONE division at the end — hash-exact at any window. */
  def skipgramPairs(documents: DataFrame, window: Int = 2,
                    minCount: Long = 3): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
    val dists = (1 to window).map { d =>
      toks.filter(size(col("toksf")) > d)
        .select(explode(expr(
          s"zip_with(slice(toksf, 1, size(toksf) - $d), slice(toksf, ${d + 1}, size(toksf) - $d)," +
            " (x, y) -> named_struct('tx', x, 'ty', y))")).as("p"))
        .select(col("p.tx").as("w1"), col("p.ty").as("w2"),
          lit(1000000L / d).as("w_micro"))
    }.reduce(_ unionByName _)
    val sym = dists
      .select(col("w1").as("center"), col("w2").as("context"), col("w_micro"))
      .unionByName(dists
        .select(col("w2").as("center"), col("w1").as("context"), col("w_micro")))
    sym.groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("w_micro")).cast("long").as("weight_micro"))
      .filter(col("n_pairs") >= minCount)
      .withColumn("glove_weight",
        col("weight_micro").cast("double") / lit(1000000.0))
  }

  /** DuckDB mirror for the correctness oracle. */
  def skipgramOracleSql(window: Int = 2, minCount: Long = 3): String = {
    val perDist = (1 to window).map { d =>
      s"""  SELECT toks[i] AS w1, toks[i + $d] AS w2, ${1000000L / d} AS w_micro
         |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - $d)) AS i
         |        FROM toksf WHERE len(toks) > $d)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH toksf AS (
       |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents
       |), pf AS (
       |$perDist
       |), sym AS (
       |  SELECT w1 AS center, w2 AS context, w_micro FROM pf
       |  UNION ALL
       |  SELECT w2 AS center, w1 AS context, w_micro FROM pf
       |)
       |SELECT center, context, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(w_micro) AS BIGINT) AS weight_micro,
       |  CAST(sum(w_micro) AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS glove_weight
       |FROM sym GROUP BY 1, 2 HAVING count(*) >= $minCount
       |ORDER BY center, context""".stripMargin
  }
}
