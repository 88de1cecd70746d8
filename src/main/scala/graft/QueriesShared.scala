package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared DuckDB-oracle CTE fragments and helper builders used by more
  * than one registry slice (Queries*.scala). These mirror the Spark-side
  * operators verbatim so oracles cannot drift between queries that answer
  * the same contract — extend these rather than pasting SQL (SURVEY §4).
  */
private[graft] object QueriesShared {

  // Shared by q_dedup_clusters and q_dedup_clusters_star: both algorithms
  // contract every component to its minimum doc_id, so one recursive-CTE
  // oracle gates both.
  private[graft] val DedupClusterCtes =
    "WITH RECURSIVE " + text.MinHash.candidatePairsSqlCtes.stripPrefix("WITH ") +
      """
      |, edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), walk(node, reach) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
      |), lab AS (
      |  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
      |), sz AS (
      |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
      |)""".stripMargin

  private[graft] val DedupClustersOracle = DedupClusterCtes +
    """
      |SELECT l.doc_id, l.cluster_id, sz.cluster_size,
      |  l.doc_id = l.cluster_id AS is_canonical
      |FROM lab l JOIN sz USING (cluster_id) ORDER BY l.doc_id""".stripMargin

  // Fixed retrieval probe for q_bm25_rank: terms known to appear across the
  // synthetic corpus vocabulary.
  private[graft] val Bm25QueryTerms = Seq("spark", "hash", "join", "stream")

  // ---- shared oracle CTE fragments (mirror graft.operators.Cleaning) ----

  private[graft] val CleanOrdersCte =
    """WITH clean_orders AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |         CASE WHEN o_orderstatus IN ('O','F','P') THEN o_orderstatus ELSE 'unknown' END AS status_normalized,
      |         CASE WHEN o_totalprice < 50000 THEN 'micro'
      |              WHEN o_totalprice < 100000 THEN 'low'
      |              WHEN o_totalprice < 200000 THEN 'medium'
      |              WHEN o_totalprice < 400000 THEN 'high'
      |              ELSE 'premium' END AS amount_tier,
      |         CAST(o_orderdate AS DATE) AS order_date
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_custkey, o_totalprice) AS _rn
      |    FROM orders
      |    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      |      AND o_totalprice > 0 AND o_totalprice < 10000000
      |  ) t WHERE _rn = 1
      |)""".stripMargin

  private[graft] val CleanLineitemCte =
    """WITH clean_lineitem AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
      |         l_discount, l_tax, l_returnflag, l_linestatus,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4)) AS DOUBLE) AS charge,
      |         (l_returnflag = 'R') AS is_refund,
      |         CAST(l_shipdate AS DATE) AS ship_date
      |  FROM lineitem
      |  WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_discount >= 0 AND l_discount <= 1
      |)""".stripMargin

  // Enriched orders + window features, shared by q_feature_vector/q_fraud_score.
  private[graft] val EnrichedFeaturesCte = CleanOrdersCte +
    s"""
    |, enr AS (
    |  SELECT co.o_orderkey, co.o_custkey, co.o_totalprice, co.amount_tier, co.order_date,
    |    c.c_acctbal,
    |    CAST(${Enrichment.riskCaseSql("r.r_name")} AS DOUBLE) AS region_risk
    |  FROM clean_orders co
    |  JOIN customer c ON co.o_custkey = c.c_custkey
    |  JOIN nation n ON c.c_nationkey = n.n_nationkey
    |  JOIN region r ON n.n_regionkey = r.r_regionkey
    |), fx AS (
    |  SELECT o_orderkey, o_custkey, o_totalprice, amount_tier, region_risk, c_acctbal,
    |    CAST(ln(1.0 + o_totalprice) AS FLOAT) AS amount_log,
    |    CAST(month(order_date) AS BIGINT) AS order_month,
    |    CAST(dayofweek(order_date) + 1 AS BIGINT) AS order_dow,
    |    CAST(dayofweek(order_date) IN (0, 6) AS BIGINT) AS is_weekend,
    |    count(*) OVER w AS user_order_count,
    |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS user_avg_amount,
    |    o_totalprice / (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w) AS amount_vs_user_avg
    |  FROM enr WINDOW w AS (PARTITION BY o_custkey)
    |), fv AS (
    |  SELECT o_orderkey, o_custkey, o_totalprice AS total_amount, amount_log, order_month, order_dow,
    |    is_weekend, user_order_count, user_avg_amount, amount_vs_user_avg, region_risk,
    |    CAST(region_risk > 0.05 AS BIGINT) AS is_high_risk_region,
    |    CAST(c_acctbal < 0 AS BIGINT) AS negative_balance,
    |    c_acctbal AS account_balance,
    |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
    |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
    |  FROM fx
    |)""".stripMargin

  private[graft] val EventsUsCte =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
      |)""".stripMargin

  // Attribution pairing chain ending in `cred` (purchase×touch pairs with
  // first/last markers), shared by q_attribution and q_attribution_rollup.
  private[graft] val AttributionCredCtes = EventsUsCte +
    """
    |, p AS (
    |  SELECT event_id AS purchase_id, user_id, value AS purchase_value, ts_us AS p_ts_us
    |  FROM ev WHERE event_type = 'purchase'
    |), t AS (
    |  SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts_us AS t_ts_us
    |  FROM ev WHERE event_type IN ('click', 'view')
    |), pair AS (
    |  SELECT p.*, t.touch_id, t.touch_type, t.t_ts_us
    |  FROM p JOIN t USING (user_id)
    |  WHERE t.t_ts_us >= p.p_ts_us - 86400000000 AND t.t_ts_us < p.p_ts_us
    |), cred AS (
    |  SELECT *,
    |    CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
    |    first_value(touch_id) OVER (PARTITION BY purchase_id ORDER BY t_ts_us, touch_id
    |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_t,
    |    last_value(touch_id) OVER (PARTITION BY purchase_id ORDER BY t_ts_us, touch_id
    |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_t
    |  FROM pair
    |)""".stripMargin

  // Literal-scorer output (mirrors FraudScore.score), shared by the
  // model-evaluation oracles (q_roc_auc, q_calibration).
  private[graft] val ScoredCte = EnrichedFeaturesCte +
    """
    |, zed AS (
    |  SELECT o_orderkey, label,
    |    CAST(CAST(-4.0 AS DOUBLE) + amount_vs_user_avg * CAST(0.9 AS DOUBLE)
    |         + region_risk * CAST(11.0 AS DOUBLE)
    |         + CAST(is_high_risk_region AS DOUBLE) * CAST(0.8 AS DOUBLE)
    |         + CAST(negative_balance AS DOUBLE) * CAST(0.6 AS DOUBLE)
    |         + CAST(is_weekend AS DOUBLE) * CAST(0.15 AS DOUBLE)
    |         + CAST(amount_log AS DOUBLE) * CAST(0.12 AS DOUBLE) AS FLOAT) AS z
    |  FROM fv
    |), scored AS (
    |  SELECT o_orderkey, label, CAST(1.0 / (1.0 + exp(-z)) AS FLOAT) AS fraud_score FROM zed
    |)""".stripMargin

  // ---- DuckDB helpers for similarity oracles (sequential double fold —
  //      mirrors Similarity.dot exactly) ----

  private[graft] def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Shared by q_decontaminate and q_decontaminate_sketch: the sketch
    * path's CMS gate is pruning-only (no false negatives, survivors
    * exact-confirmed), so both queries answer the same oracle. */
  private[graft] lazy val decontaminateOracle = """WITH g AS (
    |  SELECT doc_id, source,
    |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 3, 1) + 1),
    |      j -> array_to_string(string_split(text, ' ')[j:j+3], ' '))) AS grams
    |  FROM documents
    |), ev AS (
    |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = 'src0'
    |), tr AS (
    |  SELECT doc_id, source, grams FROM g WHERE source <> 'src0'
    |), tg AS (
    |  SELECT doc_id, unnest(grams) AS gram FROM tr
    |), hits AS (
    |  SELECT doc_id, count(*) AS n_hit_grams FROM tg JOIN ev USING (gram) GROUP BY 1
    |)
    |SELECT tr.doc_id, tr.source, CAST(len(tr.grams) AS BIGINT) AS n_grams,
    |  CAST(COALESCE(hits.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
    |  CAST(COALESCE(hits.n_hit_grams, 0) AS DOUBLE) / len(tr.grams) AS hit_ratio,
    |  COALESCE(hits.n_hit_grams, 0) > 0 AS is_contaminated,
    |  CASE WHEN CAST(COALESCE(hits.n_hit_grams, 0) AS DOUBLE) / len(tr.grams) >= CAST(0.2 AS DOUBLE) THEN 'high'
    |       WHEN COALESCE(hits.n_hit_grams, 0) > 0 THEN 'low'
    |       ELSE 'clean' END AS severity
    |FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
    |ORDER BY tr.doc_id""".stripMargin

  private[graft] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Oracle for q_knn_truncdim: full-dim golden top-k, then per rung a
    * leading-d-dims ranking and the hit count against golden. */
  private[graft] def truncDimOracle(dims: Seq[Int], numQueries: Int = 5,
                                    k: Int = 10): String = {
    val dimCtes = dims.map { d =>
      s""", sc_$d AS (
         |  SELECT q.query_id, e.vec_id,
         |    ${cosSql(s"q.qv[1:$d]", s"e.embedding[1:$d]")} AS c
         |  FROM embeddings e JOIN q ON e.vec_id != q.query_id
         |), rk_$d AS (
         |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY c DESC, vec_id ASC) AS rk
         |  FROM sc_$d
         |), hit_$d AS (
         |  SELECT count(*) AS hits
         |  FROM rk_$d t JOIN golden g USING (query_id, vec_id) WHERE t.rk <= $k
         |)""".stripMargin
    }.mkString
    val selects = dims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dim, CAST($numQueries AS BIGINT) AS n_queries,
         |  CAST($k AS BIGINT) AS k, CAST(hits AS BIGINT) AS hits,
         |  CAST(hits AS DOUBLE) / ${numQueries * k}.0 AS recall FROM hit_$d""".stripMargin
    }
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id < $numQueries
       |), fullsc AS (
       |  SELECT q.query_id, e.vec_id, ${cosSql("q.qv", "e.embedding")} AS c
       |  FROM embeddings e JOIN q ON e.vec_id != q.query_id
       |), fullrk AS (
       |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY c DESC, vec_id ASC) AS rk
       |  FROM fullsc
       |), golden AS (
       |  SELECT query_id, vec_id FROM fullrk WHERE rk <= $k
       |)$dimCtes
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY dim""".stripMargin
  }

  private[graft] def bucketSql(v: String): String =
    "CAST(" + (0 until 8).map(i => s"(CASE WHEN $v[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ") + " AS BIGINT)"


  private[graft] def literalScored(s: SparkSession, d: String): DataFrame =
    FraudScore.score(FraudScore.featureVector(Enrichment.enrichOrders(
      Cleaning.cleanOrders(Tables.orders(s, d)),
      Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))))


  // Quality-score CTE chain ending in `t3` (per-doc tokens/ratios/score),
  // shared by q_text_quality and the corpus-accounting oracle.
  // (lazy: declared after the registry that references it)
  private[graft] lazy val QualityCtes: String = {
    val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stopword_hits
       |  FROM documents
       |), t2 AS (
       |  SELECT *,
       |    CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_ratio,
       |    CAST(stopword_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       |    CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN CAST(1.0 AS DOUBLE)
       |         WHEN n_tokens < 20 THEN CAST(n_tokens AS DOUBLE) / CAST(20.0 AS DOUBLE)
       |         ELSE CAST(200.0 AS DOUBLE) / n_tokens END AS len_score
       |  FROM t
       |), t3 AS (
       |  SELECT *,
       |    len_score * CAST(0.4 AS DOUBLE) + (CAST(1.0 AS DOUBLE) - dup_ratio) * CAST(0.4 AS DOUBLE)
       |      + stopword_ratio * CAST(0.2 AS DOUBLE) AS quality_score
       |  FROM t2
       |)""".stripMargin
  }

  // SCD2 tier-version CTE chain (mirrors the q_scd2_tiers Spark side up to
  // the collapsed `coll` version rows), shared by q_scd2_tiers and the
  // point-in-time join oracle (q_pit_join).
  // (lazy: declared after the registry that references it)
  private[graft] lazy val Scd2VersionCtes = CleanOrdersCte +
    """
    |, daily AS (
    |  SELECT o_custkey, order_date, amount_tier FROM (
    |    SELECT o_custkey, order_date, amount_tier,
    |      row_number() OVER (PARTITION BY o_custkey, order_date ORDER BY o_orderkey DESC) AS rn
    |    FROM clean_orders) t WHERE rn = 1
    |), flg AS (
    |  SELECT o_custkey, order_date, amount_tier,
    |    CASE WHEN lag(order_date) OVER w IS NULL
    |           OR lag(amount_tier) OVER w IS DISTINCT FROM amount_tier
    |         THEN 1 ELSE 0 END AS chg
    |  FROM daily WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date)
    |), ver AS (
    |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey ORDER BY order_date
    |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
    |  FROM flg
    |), coll AS (
    |  SELECT o_custkey, version, amount_tier,
    |    min(order_date) AS valid_from, max(order_date) AS last_observed,
    |    count(*) AS observation_count
    |  FROM ver GROUP BY 1, 2, 3
    |)""".stripMargin

  // Shared CTE chain for the device-ring graph queries: admitted
  // (day, device) buckets → undirected user pairs → symmetric edge list →
  // degrees. Mirrors Rings.sharedDevicePairs verbatim (incl. the 2..50
  // occupancy governor).
  // (lazy: declared after the registry that references it)
  private[graft] lazy val DevicePairsCtes =
    """WITH b AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS device, user_id
      |  FROM events
      |  WHERE event_type = 'purchase'
      |    AND json_extract_string(props, '$.k') IS NOT NULL
      |), ok AS (
      |  SELECT day, device FROM b GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 50
      |), adm AS (
      |  SELECT b.* FROM b JOIN ok USING (day, device)
      |), pairs AS (
      |  SELECT x.user_id AS user_a, y.user_id AS user_b
      |  FROM adm x JOIN adm y USING (day, device)
      |  WHERE x.user_id < y.user_id GROUP BY 1, 2
      |), edges AS (
      |  SELECT user_a AS src, user_b AS dst FROM pairs
      |  UNION ALL SELECT user_b, user_a FROM pairs
      |), deg AS (
      |  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY 1
      |)""".stripMargin

  // Unrolled integer-exact PageRank: same fixed-point contract as
  // Graph.pageRank (1e12 mass units, pr div degree, 85/100 damping,
  // 15/100 teleport), one CTE per iteration.
  private[graft] def pageRankOracle: String = {
    val iters = (1 to Graph.Iterations).map { i =>
      s""", p$i AS (
         |  SELECT n.node, n.degree, n.tele,
         |    CAST(n.tele + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.pr // p.degree) AS m
         |    FROM p${i - 1} p JOIN edges e ON p.node = e.src GROUP BY 1
         |  ) s USING (node))""".stripMargin
    }.mkString("\n")
    DevicePairsCtes +
      s"""
       |, nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)
       |, nodes AS (
       |  SELECT node, degree,
       |    (15 * (1000000000000 // n)) // 100 AS tele,
       |    1000000000000 // n AS pr0
       |  FROM deg CROSS JOIN nn)
       |, p0 AS (SELECT node, degree, tele, pr0 AS pr FROM nodes)
       |$iters
       |SELECT node AS user_id, degree, CAST(pr AS BIGINT) AS pr_units,
       |  CAST(pr AS DOUBLE) / 1000000000000.0 AS pr_score
       |FROM p${Graph.Iterations} ORDER BY user_id""".stripMargin
  }
}
