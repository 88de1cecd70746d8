package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation of a top-k ranking — the metrics an
  * embedding/retrieval training loop actually tracks (MRR@k, nDCG@k,
  * precision@k, recall@k), computed exactly and engine-portably.
  *
  * Relevance is binary and label-derived: a returned neighbor is relevant
  * iff it shares the query vector's `label` (the synthetic corpus' class
  * column — the standard "same-class = relevant" proxy eval). The ranking
  * under test is the brute-force exact-cosine top-k
  * ([[graft.sim.Similarity.knnBrute]]), which is itself DuckDB-gated, so
  * the whole eval is hash-exact end-to-end.
  *
  * Exactness contract (SURVEY §4): DCG is a sum of per-rank discounts
  * 1/ln(rank+1) — float sums are order-dependent, so each discount is
  * quantized ONCE to micro-units (`round(1e6 / ln(rank+1))` as BIGINT,
  * identical IEEE ops in both engines) and DCG/IDCG are exact integer
  * sums; nDCG is then a single IEEE division of two exact integers.
  * (Natural-log discounts: nDCG is a ratio, so the ln↔log2 constant
  * factor cancels — no log2 portability risk.) MRR/precision/recall are
  * single divisions of exact integers.
  *
  * Scale shape: the ranking is the only corpus-sized input; the label
  * histogram (|labels| rows) and the k-row IDCG table broadcast; the
  * per-query rollup is one group-grain aggregation over queries×k rows.
  */
object RetrievalEval {

  /** Per-query metrics of the brute cosine ranking: (query_id, n_rel,
    * hits, p_at_k, r_at_k, mrr, ndcg). `n_rel` counts same-label corpus
    * rows excluding the query itself. */
  def evalBruteKnn(embeddings: DataFrame, numQueries: Int = 50,
                   k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val ranked = graft.sim.Similarity.knnBrute(embeddings, numQueries, k)
    val qLabels = embeddings
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    // corpus label histogram: |labels| rows — broadcast
    val labelCounts = embeddings.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    val queries = qLabels.join(broadcast(labelCounts), Seq("q_label"))
      .withColumn("n_rel", (col("n_label") - 1).cast("long"))
      .select("query_id", "q_label", "n_rel")

    // micro-unit rank discount, computed in-engine so the oracle's
    // identical expression yields the identical BIGINT
    val disc = round(lit(1e6) / log(col("rank") + lit(1))).cast("long")

    val perQuery = ranked
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("rel", (col("label") === col("q_label")).cast("long"))
      .withColumn("disc", disc)
      .groupBy(col("query_id"), col("n_rel"))
      .agg(sum(col("rel")).as("hits"),
        sum(col("rel") * col("disc")).as("dcg_micro"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"))

    // IDCG lookup: k rows of exact integer prefix sums of the SAME
    // in-engine discount terms (collected bounded — k rows — and
    // cumsum'd as longs, so no float-order dependence)
    val terms = spark.range(1, k + 1L).toDF("rank")
      .select(disc.as("t")).collect().map(_.getLong(0))
    val cum = terms.scanLeft(0L)(_ + _).tail
    val idcg = (1 to k).map(i => (i.toLong, cum(i - 1))).toDF("m", "idcg_micro")

    perQuery
      .join(broadcast(idcg), least(col("n_rel"), lit(k.toLong)) === col("m"), "left")
      .select(col("query_id"), col("n_rel"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("p_at_k"),
        when(col("n_rel") > 0L, col("hits").cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0)).as("r_at_k"),
        when(col("first_rel").isNotNull, lit(1.0) / col("first_rel").cast("double"))
          .otherwise(lit(0.0)).as("mrr"),
        when(col("idcg_micro").isNotNull && col("idcg_micro") > 0L,
            col("dcg_micro").cast("double") / col("idcg_micro").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** The brute-cosine ranking CTE chain ending in `ranked(query_id,
    * q_label, vec_id, label, cos_sim, rank)` — THE ranking contract,
    * shared by the q_knn_brute, retrieval-eval, and label-noise oracles
    * so the query predicate / scoring / tiebreak can never drift between
    * them. `cosSql` renders the exact-cosine expression. */
  def knnRankedSqlCtes(cosSql: (String, String) => String,
                       numQueries: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |  FROM embeddings WHERE vec_id < $numQueries
       |), scored AS (
       |  SELECT q.query_id, q.q_label, e.vec_id, e.label,
       |    ${cosSql("q.qv", "e.embedding")} AS cos_sim
       |  FROM embeddings e JOIN q ON e.vec_id != q.query_id
       |), ranked AS (
       |  SELECT query_id, q_label, vec_id, label, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
       |  FROM scored
       |)""".stripMargin

  /** DuckDB mirror of [[evalBruteKnn]]: the shared ranking CTE + the
    * micro-unit discount rollup. */
  def oracleSql(cosSql: (String, String) => String, numQueries: Int = 50,
                k: Int = 10): String =
    knnRankedSqlCtes(cosSql, numQueries) +
    s""", topk AS (
       |  SELECT * FROM ranked WHERE rank <= $k
       |), lc AS (
       |  SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1
       |), qr AS (
       |  SELECT q.query_id, CAST(lc.n_label - 1 AS BIGINT) AS n_rel
       |  FROM q JOIN lc ON q.q_label = lc.label
       |), agg AS (
       |  SELECT query_id,
       |    CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |    CAST(sum(CASE WHEN label = q_label
       |      THEN CAST(round(1000000.0 / ln(rank + 1)) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS dcg_micro,
       |    min(CASE WHEN label = q_label THEN rank END) AS first_rel
       |  FROM topk GROUP BY 1
       |), idcg AS (
       |  SELECT CAST(a.i AS BIGINT) AS m,
       |    CAST(sum(CASE WHEN b.j <= a.i
       |      THEN CAST(round(1000000.0 / ln(b.j + 1)) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS idcg_micro
       |  FROM generate_series(1, $k) AS a(i), generate_series(1, $k) AS b(j)
       |  GROUP BY a.i
       |)
       |SELECT a.query_id, qr.n_rel, a.hits,
       |  CAST(a.hits AS DOUBLE) / $k.0 AS p_at_k,
       |  CASE WHEN qr.n_rel > 0 THEN CAST(a.hits AS DOUBLE) / CAST(qr.n_rel AS DOUBLE)
       |    ELSE 0.0 END AS r_at_k,
       |  CASE WHEN a.first_rel IS NOT NULL THEN 1.0 / CAST(a.first_rel AS DOUBLE)
       |    ELSE 0.0 END AS mrr,
       |  CASE WHEN i.idcg_micro IS NOT NULL AND i.idcg_micro > 0
       |    THEN CAST(a.dcg_micro AS DOUBLE) / CAST(i.idcg_micro AS DOUBLE)
       |    ELSE 0.0 END AS ndcg
       |FROM agg a
       |JOIN qr ON a.query_id = qr.query_id
       |LEFT JOIN idcg i ON i.m = least(qr.n_rel, $k)
       |ORDER BY a.query_id""".stripMargin
}
