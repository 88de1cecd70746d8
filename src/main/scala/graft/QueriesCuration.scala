package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueriesShared._

/** Registry slice: curation pipeline, LM quality, behavior analytics, SCD2, packing.
  * Split from the monolithic Queries.scala (r11) — a pure move with zero
  * behavior change; shared oracle CTE fragments live in [[QueriesShared]].
  */
private[graft] object QueriesCuration {
  private[graft] lazy val defs: Seq[QueryDef] = Seq(

    // Time-to-convert distribution among full-funnel completers: exact
    // µs lags, decimal mean, exact interpolated p50/p95 via the
    // constant-group prefix sum (Behavior.conversionLag).
    QueryDef("q_conversion_lag",
      (s, d) => gold.Behavior.conversionLag(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us")),
          Seq("signup", "view", "click", "purchase")),
      Some(EventsUsCte +
        """
        |, s0 AS (
        |  SELECT user_id, event_type, ts_us,
        |    min(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (PARTITION BY user_id) AS t0
        |  FROM ev
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t1 FROM s0
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2
        |), pu AS (
        |  SELECT user_id, min(t0) AS t0, min(t3) AS t3
        |  FROM s3 GROUP BY user_id
        |), lg AS (
        |  SELECT user_id, t3 - t0 AS lag_us FROM pu WHERE t3 IS NOT NULL
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  CAST(CAST(sum(CAST(lag_us AS HUGEINT)) AS VARCHAR) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_lag_us,
        |  quantile_cont(CAST(lag_us AS DOUBLE), 0.5) AS p50_lag_us,
        |  quantile_cont(CAST(lag_us AS DOUBLE), 0.95) AS p95_lag_us,
        |  min(lag_us) AS min_lag_us, max(lag_us) AS max_lag_us
        |FROM lg""".stripMargin)),

    // Time-constrained funnel (ClickHouse windowFunnel family, per-step
    // 24h windows): greedy latest-completion fold per user, all-integer
    // until the conversion divisions; oracle mirrors the fold as a
    // recursive CTE (gold/Behavior.windowFunnel).
    QueryDef("q_window_funnel",
      (s, d) => gold.Behavior.windowFunnel(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            col("event_id"), expr("ts_ns div 1000").as("ts_us")),
          Seq("signup", "view", "click", "purchase"), 86400000000L)
        .orderBy("stage_idx"),
      Some("WITH RECURSIVE " + EventsUsCte.stripPrefix("WITH ") +
        gold.Behavior.windowFunnelOracleCtes(
          Seq("signup", "view", "click", "purchase"), 86400000000L) +
        gold.Behavior.windowFunnelOracleSelect(
          Seq("signup", "view", "click", "purchase")))),

    QueryDef("q_funnel",
      (s, d) => gold.Behavior.funnel(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us")),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("stage_idx"),
      Some(EventsUsCte +
        """
        |, s0 AS (
        |  SELECT user_id, event_type, ts_us,
        |    min(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (PARTITION BY user_id) AS t0
        |  FROM ev
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t1 FROM s0
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2
        |), pu AS (
        |  SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |  FROM s3 GROUP BY user_id
        |), c AS (
        |  SELECT count(t0) AS u0, count(t1) AS u1, count(t2) AS u2, count(t3) AS u3 FROM pu
        |)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage, u0 AS users_reached,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u0 AS DOUBLE) / CAST(u0 AS DOUBLE) END AS conversion_from_prev,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u0 AS DOUBLE) / CAST(u0 AS DOUBLE) END AS conversion_from_start
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'view', u1,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u1 AS DOUBLE) / CAST(u0 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u1 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', u2,
        |    CASE WHEN u1 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u2 AS DOUBLE) / CAST(u1 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u2 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', u3,
        |    CASE WHEN u2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u3 AS DOUBLE) / CAST(u2 AS DOUBLE) END,
        |    CASE WHEN u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(u3 AS DOUBLE) / CAST(u0 AS DOUBLE) END
        |  FROM c
        |) t ORDER BY stage_idx""".stripMargin)),

    // A/B funnel with per-stage two-proportion z-tests: the funnel split
    // by user-parity arms, counts folded to one row, pooled z per stage
    // (nested CASE keeps NaN out of cross-engine comparisons).
    QueryDef("q_funnel_ab",
      (s, d) => gold.Behavior.funnelAb(
          Tables.events(s, d).select(col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us")),
          Seq("signup", "view", "click", "purchase"),
          when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
        .orderBy("stage_idx"),
      Some {
        val stages = Seq("signup", "view", "click", "purchase")
        val armAgg = stages.indices.flatMap { i =>
          Seq(s"coalesce(max(CASE WHEN arm = 'A' THEN u$i END), 0) AS a_u$i",
            s"coalesce(max(CASE WHEN arm = 'B' THEN u$i END), 0) AS b_u$i")
        }.mkString(",\n    ")
        val stageSelects = stages.zipWithIndex.map { case (stage, i) =>
          val pA = s"CASE WHEN a_u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(a_u$i AS DOUBLE) / CAST(a_u0 AS DOUBLE) END"
          val pB = s"CASE WHEN b_u0 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(b_u$i AS DOUBLE) / CAST(b_u0 AS DOUBLE) END"
          val se = s"sqrt((CAST(a_u$i + b_u$i AS DOUBLE) / CAST(a_u0 + b_u0 AS DOUBLE)) * (1.0 - CAST(a_u$i + b_u$i AS DOUBLE) / CAST(a_u0 + b_u0 AS DOUBLE)) * (1.0 / CAST(a_u0 AS DOUBLE) + 1.0 / CAST(b_u0 AS DOUBLE)))"
          s"""  SELECT CAST($i AS BIGINT) AS stage_idx, '$stage' AS stage,
             |    a_u0 AS a_entered, a_u$i AS a_reached,
             |    b_u0 AS b_entered, b_u$i AS b_reached,
             |    $pA AS p_a, $pB AS p_b,
             |    CASE WHEN a_u0 > 0 AND b_u0 > 0 THEN
             |      CASE WHEN $se > 0.0 THEN (($pA) - ($pB)) / $se END
             |    END AS z
             |  FROM one""".stripMargin
        }.mkString("\n  UNION ALL\n")
        graft.QueriesShared.EventsUsCte +
          """
          |, s0 AS (
          |  SELECT user_id, event_type, ts_us,
          |    min(CASE WHEN event_type = 'signup' THEN ts_us END) OVER (PARTITION BY user_id) AS t0
          |  FROM ev
          |), s1 AS (
          |  SELECT *, min(CASE WHEN event_type = 'view' AND ts_us > t0 THEN ts_us END)
          |    OVER (PARTITION BY user_id) AS t1 FROM s0
          |), s2 AS (
          |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1 THEN ts_us END)
          |    OVER (PARTITION BY user_id) AS t2 FROM s1
          |), s3 AS (
          |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2 THEN ts_us END)
          |    OVER (PARTITION BY user_id) AS t3 FROM s2
          |), pu AS (
          |  SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
          |  FROM s3 GROUP BY user_id
          |), pa AS (
          |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm, t0, t1, t2, t3
          |  FROM pu
          |), c AS (
          |  SELECT arm, count(t0) AS u0, count(t1) AS u1, count(t2) AS u2, count(t3) AS u3
          |  FROM pa GROUP BY arm
          |), one AS (
          |  SELECT """.stripMargin + armAgg +
          """
          |  FROM c
          |)
          |SELECT * FROM (
          |""".stripMargin + stageSelects +
          """
          |) t ORDER BY stage_idx""".stripMargin
      }),

    QueryDef("q_retention_cohorts",
      (s, d) => gold.Behavior.retentionCohorts(
          Tables.orders(s, d).select(col("o_custkey"),
            to_date(col("o_orderdate")).as("order_date")),
          "o_custkey", "order_date")
        .orderBy("cohort_month", "months_since"),
      Some("""WITH o AS (
        |  SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS activity_month
        |  FROM orders
        |), w AS (
        |  SELECT o_custkey, activity_month,
        |    min(activity_month) OVER (PARTITION BY o_custkey) AS cohort_month
        |  FROM o
        |), a AS (
        |  SELECT cohort_month,
        |    CAST((year(activity_month) * 12 + month(activity_month))
        |       - (year(cohort_month) * 12 + month(cohort_month)) AS BIGINT) AS months_since,
        |    count(DISTINCT o_custkey) AS active_customers
        |  FROM w GROUP BY 1, 2
        |), r AS (
        |  SELECT *, max(CASE WHEN months_since = 0 THEN active_customers END)
        |    OVER (PARTITION BY cohort_month) AS cohort_size
        |  FROM a
        |)
        |SELECT cohort_month, months_since, active_customers, cohort_size,
        |  CAST(active_customers AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention_rate
        |FROM r ORDER BY cohort_month, months_since""".stripMargin)),

    QueryDef("q_scd2_tiers",
      (s, d) => {
        // day-grain state = the day's last order's tier (max o_orderkey —
        // unique, so max_by is deterministic). A hash aggregate with
        // map-side partial agg, not a (cust,date)-window sort. The
        // repartition on custkey alone satisfies BOTH the (cust,date)
        // groupBy's clustering (subset rule) and the scd2 windows'
        // cust partitioning — one exchange instead of two.
        val daily = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
          .groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        operators.Scd.scd2(daily, "o_custkey", "order_date", Seq("amount_tier"))
          .select("o_custkey", "version", "amount_tier", "valid_from",
            "last_observed", "observation_count", "valid_to", "is_current")
          .orderBy("o_custkey", "version")
      },
      Some(Scd2VersionCtes +
        """
        |SELECT o_custkey, version, amount_tier, valid_from, last_observed, observation_count,
        |  COALESCE(lead(valid_from) OVER wv, DATE '9999-12-31') AS valid_to,
        |  lead(valid_from) OVER wv IS NULL AS is_current
        |FROM coll WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        |ORDER BY o_custkey, version""".stripMargin)),

    // Point-in-time (strictly-before) read of the SCD2 tier history: each
    // order picks up the customer's tier version entering the order's day —
    // the leakage-free feature-store join. Spark side: Scd.priorStateJoin
    // (union+window, one custkey exchange shared with the scd2 build).
    QueryDef("q_pit_join",
      (s, d) => {
        val clean = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
        val daily = clean.groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        val versions = operators.Scd
          .scd2(daily, "o_custkey", "order_date", Seq("amount_tier"))
          .select(col("o_custkey"), col("valid_from"),
            col("version"), col("amount_tier"))
        val orders = clean.select("o_orderkey", "o_custkey", "order_date", "amount_tier")
        operators.Scd.priorStateJoin(orders, versions,
            "o_custkey", "order_date", "valid_from", Seq("amount_tier", "version"))
          .withColumn("tier_changed",
            col("prior_amount_tier").isNotNull
              && col("prior_amount_tier") =!= col("amount_tier"))
          .select("o_orderkey", "o_custkey", "order_date", "amount_tier",
            "prior_amount_tier", "prior_version", "tier_changed")
          .orderBy("o_orderkey")
      },
      Some(Scd2VersionCtes +
        """
        |, pri AS (
        |  SELECT o_orderkey, prior_amount_tier, prior_version FROM (
        |    SELECT o.o_orderkey, s.amount_tier AS prior_amount_tier,
        |      s.version AS prior_version,
        |      row_number() OVER (PARTITION BY o.o_orderkey ORDER BY s.version DESC) AS rn
        |    FROM clean_orders o
        |    JOIN coll s ON o.o_custkey = s.o_custkey AND s.valid_from < o.order_date
        |  ) t WHERE rn = 1
        |)
        |SELECT o.o_orderkey, o.o_custkey, o.order_date, o.amount_tier,
        |  p.prior_amount_tier, p.prior_version,
        |  p.prior_amount_tier IS NOT NULL AND p.prior_amount_tier <> o.amount_tier AS tier_changed
        |FROM clean_orders o LEFT JOIN pri p ON o.o_orderkey = p.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin)),

    QueryDef("q_tfidf",
      (s, d) => text.TfIdf.topTerms(Tables.documents(s, d), 5)
        .orderBy("doc_id", "term_rank"),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    ln(CAST(1 + n.n_docs AS DOUBLE) / CAST(1 + dfreq.df AS DOUBLE)) + CAST(1.0 AS DOUBLE) AS idf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT doc_id, term, tf, df, idf, CAST(tf AS DOUBLE) * idf AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY CAST(tf AS DOUBLE) * idf DESC, term) AS term_rank
        |  FROM scored
        |)
        |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term, tf, df, idf, tfidf
        |FROM ranked WHERE term_rank <= 5 ORDER BY doc_id, term_rank""".stripMargin)),

    // Lexical retrieval: BM25 over a fixed query-term list. The per-doc
    // score sum is pivoted into fixed-order per-term columns on BOTH sides
    // (SURVEY §4: no parallel double sums — fixed expression order instead).
    QueryDef("q_bm25_rank",
      (s, d) => text.Bm25.rank(
          Tables.documents(s, d), Bm25QueryTerms, 20)
        .orderBy("bm25_rank"),
      Some(text.Bm25.oracleSql(Bm25QueryTerms, 20))),

    // BM25 SERVED FROM the incremental inverted-index store (postings +
    // doclens, disjoint doc slices appended without rewriting earlier
    // ones): shares q_bm25_rank's oracle VERBATIM — base+delta ≡
    // from-scratch, and serving reads only the query terms' posting
    // lists (term filter pushed to the parquet scan), never the corpus
    // text.
    QueryDef("q_bm25_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val root = graft.util.Scratch.dir("graft-bm25-index")
        text.Bm25.buildIndex(docs.filter(col("doc_id") % 4 =!= 1), root)
        text.Bm25.appendIndex(docs.filter(col("doc_id") % 4 === 1), root)
        text.Bm25.searchIndex(s, root, Bm25QueryTerms, 20)
          .orderBy("bm25_rank")
      },
      Some(text.Bm25.oracleSql(Bm25QueryTerms, 20))),

    QueryDef("q_neardup_ensemble",
      (s, d) => text.Ensemble.ensembleNearDups(
          Tables.documents(s, d), Tables.embeddings(s, d), 0.35)
        .orderBy("doc_a", "doc_b"),
      Some(text.MinHash.candidatePairsSqlCtes +
        s"""
        |, emb AS (
        |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
        |), ep AS (
        |  SELECT * FROM (
        |    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |      ${cosSql("a.embedding", "b.embedding")} AS cos_sim
        |    FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  ) t WHERE cos_sim > 0.35
        |), m AS (
        |  SELECT COALESCE(p.doc_a, ep.doc_a) AS doc_a,
        |    COALESCE(p.doc_b, ep.doc_b) AS doc_b,
        |    p.doc_a IS NOT NULL AS tc, ep.doc_a IS NOT NULL AS ec, ep.cos_sim
        |  FROM pairs p FULL OUTER JOIN ep ON p.doc_a = ep.doc_a AND p.doc_b = ep.doc_b
        |), voc AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS vocab FROM documents
        |), jx AS (
        |  SELECT m.doc_a, m.doc_b,
        |    CASE WHEN tc AND ec THEN 'both' WHEN tc THEN 'text_only'
        |         ELSE 'embedding_only' END AS signal,
        |    m.cos_sim,
        |    CAST(len(list_filter(va.vocab, t -> list_contains(vb.vocab, t))) AS BIGINT) AS inter_size,
        |    CAST(len(va.vocab) AS BIGINT) AS na, CAST(len(vb.vocab) AS BIGINT) AS nb
        |  FROM m JOIN voc va ON m.doc_a = va.doc_id JOIN voc vb ON m.doc_b = vb.doc_id
        |)
        |SELECT doc_a, doc_b, signal, cos_sim,
        |  CAST(inter_size AS DOUBLE) / (na + nb - inter_size) AS exact_jaccard
        |FROM jx ORDER BY doc_a, doc_b""".stripMargin)),

    QueryDef("q_change_feed",
      (s, d) => {
        val co = Cleaning.cleanOrders(Tables.orders(s, d))
        val before = co.filter(col("o_orderkey") % 2 === 0)
        val after = co.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(1.1))
              .otherwise(col("o_totalprice")))
        operators.ChangeFeed.changes(before, after,
            Seq("o_orderkey"), Seq("o_totalprice", "status_normalized"))
          .select("o_orderkey", "_change_type", "o_totalprice_old",
            "o_totalprice_new", "status_normalized_old", "status_normalized_new")
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |, b AS (
        |  SELECT o_orderkey, o_totalprice, status_normalized
        |  FROM clean_orders WHERE o_orderkey % 2 = 0
        |), a AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
        |         ELSE o_totalprice END AS o_totalprice,
        |    status_normalized
        |  FROM clean_orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT * FROM (
        |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |         WHEN a.o_orderkey IS NULL THEN 'delete'
        |         WHEN b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |           OR b.status_normalized IS DISTINCT FROM a.status_normalized THEN 'update'
        |    END AS _change_type,
        |    b.o_totalprice AS o_totalprice_old, a.o_totalprice AS o_totalprice_new,
        |    b.status_normalized AS status_normalized_old,
        |    a.status_normalized AS status_normalized_new
        |  FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
        |) t WHERE _change_type IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_first_event",
      (s, d) => Cleaning.deterministicDedup(
          Tables.events(s, d).select(col("event_id"), col("user_id"),
            col("event_type"), col("value"), expr("ts_ns div 1000").as("ts_us")),
          Seq("user_id", "event_type"), Seq("ts_us", "event_id"))
        .orderBy("user_id", "event_type"),
      Some(EventsUsCte +
        """
        |SELECT event_id, user_id, event_type, value, ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts_us, event_id) AS rn
        |  FROM ev) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    QueryDef("q_amount_outliers",
      (s, d) => {
        val enriched = Cleaning.cleanOrders(Tables.orders(s, d))
          .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("n_name"), col("o_totalprice"))
        operators.Anomaly.outliers(enriched, Seq("n_name"), "o_totalprice", 1.75)
          .select("o_orderkey", "o_custkey", "n_name", "o_totalprice",
            "group_mean", "group_stddev", "z_score")
          .orderBy("o_orderkey")
      },
      Some(CleanOrdersCte +
        """
        |, enr AS (
        |  SELECT o_orderkey, o_custkey, n_name, o_totalprice
        |  FROM clean_orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |), mom AS (
        |  SELECT n_name, count(o_totalprice) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq
        |  FROM enr GROUP BY 1
        |), stats AS (
        |  SELECT n_name, n, s / n AS group_mean,
        |    sqrt((sq - s * s / n) / n) AS group_stddev
        |  FROM mom
        |)
        |SELECT o_orderkey, o_custkey, enr.n_name, o_totalprice, group_mean, group_stddev,
        |  (o_totalprice - group_mean) / group_stddev AS z_score
        |FROM enr JOIN stats ON enr.n_name = stats.n_name
        |WHERE n >= 2 AND group_stddev > CAST(0.0 AS DOUBLE)
        |  AND abs(o_totalprice - group_mean) > CAST(1.75 AS DOUBLE) * group_stddev
        |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_rep_filter",
      (s, d) => text.Curation.repetitionStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t,
        |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS non_space_chars
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tokens, non_space_chars FROM toks
        |), g2 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
        |    j -> array_to_string(t[j:j+1], ' '))) AS gram FROM toks
        |), g2c AS (
        |  SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2
        |), s2 AS (
        |  SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS total_bigrams,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigram_instances
        |  FROM g2c GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |    j -> array_to_string(t[j:j+2], ' '))) AS gram FROM toks
        |), g3c AS (
        |  SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2
        |), s3 AS (
        |  SELECT doc_id, sum(c) AS total_trigrams,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_trigram_instances
        |  FROM g3c GROUP BY 1
        |)
        |SELECT base.doc_id, lang, n_tokens,
        |  CAST(non_space_chars AS DOUBLE) / n_tokens AS mean_token_len,
        |  CAST(top_bigram_count AS BIGINT) AS top_bigram_count,
        |  CAST(top_bigram_count AS DOUBLE) / total_bigrams AS top_bigram_share,
        |  CAST(dup_trigram_instances AS BIGINT) AS dup_trigram_instances,
        |  CAST(dup_trigram_instances AS DOUBLE) / total_trigrams AS dup_trigram_frac,
        |  (n_tokens BETWEEN 10 AND 1000
        |   AND CAST(non_space_chars AS DOUBLE) / n_tokens BETWEEN CAST(2.0 AS DOUBLE) AND CAST(12.0 AS DOUBLE)
        |   AND CAST(top_bigram_count AS DOUBLE) / total_bigrams <= CAST(0.04 AS DOUBLE)
        |   AND CAST(dup_trigram_instances AS DOUBLE) / total_trigrams <= CAST(0.25 AS DOUBLE)) AS keep
        |FROM base JOIN s2 ON base.doc_id = s2.doc_id JOIN s3 ON base.doc_id = s3.doc_id
        |ORDER BY base.doc_id""".stripMargin)),

    // Sketch-gated decontamination for eval sets too big to broadcast:
    // a CMS of eval grams prunes the train gram stream map-side
    // (estimate 0 = definitely absent), exact join confirms survivors —
    // output is BIT-IDENTICAL to q_decontaminate, so it shares the same
    // DuckDB oracle (the sketch only moves the work, never the answer)
    QueryDef("q_decontaminate_sketch",
      (s, d) => text.Curation.decontaminateSketch(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(decontaminateOracle)),

    QueryDef("q_decontaminate",
      (s, d) => text.Curation.decontaminate(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(decontaminateOracle)),

    // FUZZY decontamination: training docs ranked by WHOLE-DOCUMENT
    // similarity to the eval source via the governed LSH candidate join —
    // the severity signal that separates wholesale near-copies (drop)
    // from incidental phrase overlap (keep-and-audit), which any-overlap
    // exact decontamination cannot. Hash-exact: integer signature
    // agreement / 16 + one literal threshold; oracle rides the shared
    // candidate-pair CTE builder.
    QueryDef("q_decontaminate_fuzzy",
      (s, d) => text.Curation.decontaminateFuzzy(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.Curation.decontaminateFuzzyOracleSql())),

    // End-to-end curation audit (quality gate -> canonical election among
    // survivors -> decontamination) as ONE composed plan; every exclusion
    // names its reason, kept = all three stages pass. Hash-exact oracle
    // mirrors all three stages.
    QueryDef("q_curation_pipeline",
      (s, d) => text.Curation.curatePipeline(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some {
        val stopList = graft.text.QualityRules.StopWords
          .map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (
        |  SELECT doc_id, lang, source, text,
        |    string_split(text, ' ') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE source <> 'src0'
        |), m AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS n_symbol_words,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(toks, w -> lower(w) IN ($stopList))) AS BIGINT) AS n_stop_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ellipsis_lines
        |  FROM t
        |), q AS (
        |  SELECT doc_id, lang, source, md5(text) AS content_hash,
        |    (n_words >= 50 AND n_words <= 100000
        |     AND CAST(word_chars AS DOUBLE) / n_words >= 3.0
        |     AND CAST(word_chars AS DOUBLE) / n_words <= 10.0
        |     AND CAST(n_symbol_words AS DOUBLE) / n_words <= 0.1
        |     AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8
        |     AND n_stop_words >= 2
        |     AND CAST(n_bullet_lines AS DOUBLE) / n_lines <= 0.9
        |     AND CAST(n_ellipsis_lines AS DOUBLE) / n_lines <= 0.3) AS passes_gopher
        |  FROM m
        |), canon AS (
        |  SELECT content_hash, min(doc_id) AS canonical_doc_id
        |  FROM q WHERE passes_gopher GROUP BY 1
        |), g AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 3, 1) + 1),
        |      j -> array_to_string(string_split(text, ' ')[j:j+3], ' '))) AS grams
        |  FROM documents
        |), ev AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = 'src0'
        |), tg AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE source <> 'src0'
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hit_grams FROM tg JOIN ev USING (gram) GROUP BY 1
        |)
        |SELECT q.doc_id, q.lang, q.source, q.content_hash, q.passes_gopher,
        |  canon.canonical_doc_id,
        |  (q.passes_gopher AND q.doc_id = canon.canonical_doc_id) AS is_canonical,
        |  CAST(COALESCE(hits.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
        |  COALESCE(hits.n_hit_grams, 0) > 0 AS is_contaminated,
        |  (q.passes_gopher AND q.doc_id = canon.canonical_doc_id
        |    AND NOT COALESCE(hits.n_hit_grams, 0) > 0) AS kept
        |FROM q LEFT JOIN canon USING (content_hash)
        |  LEFT JOIN hits ON q.doc_id = hits.doc_id
        |ORDER BY q.doc_id""".stripMargin
      }),

    // Exact-substring duplicate spans (Lee et al. 2022 ExactSubstr):
    // maximal cross-doc verbatim token spans with offsets. The oracle
    // mirrors the gram→duplicated→gaps-and-islands pipeline on gram
    // STRINGS (the Spark side joins on xxhash64 of the same strings —
    // identical output absent a 64-bit collision).
    QueryDef("q_exact_substr",
      (s, d) => text.ExactSubstr.duplicateSpans(Tables.documents(s, d))
        .orderBy("doc_id", "span_start"),
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), p AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS j
        |  FROM t
        |), g AS (
        |  SELECT doc_id, j - 1 AS pos,
        |    array_to_string(toks[j:j+7], ' ') AS gram
        |  FROM p
        |), d AS (
        |  SELECT gram, count(DISTINCT doc_id) AS docs_sharing
        |  FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |), h AS (
        |  SELECT g.doc_id, g.pos, d.docs_sharing
        |  FROM g JOIN d USING (gram)
        |), i AS (
        |  SELECT doc_id, pos, docs_sharing,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
        |      THEN 0 ELSE 1 END AS brk
        |  FROM h
        |), s AS (
        |  SELECT doc_id, pos, docs_sharing,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM i
        |)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 8 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens,
        |  count(*) AS n_dup_grams,
        |  CAST(max(docs_sharing) AS BIGINT) AS max_docs_sharing
        |FROM s GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin)),

    // Apply the ExactSubstr spans: cut every duplicated passage out of
    // every document (Lee et al. 2022 cut-all policy) — cleaned corpus +
    // audit counts. Oracle mirrors the span CTE and splices by position
    // anti-join.
    QueryDef("q_splice_spans",
      (s, d) => text.ExactSubstr.spliceSpans(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), p AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS j
        |  FROM t
        |), g AS (
        |  SELECT doc_id, j - 1 AS pos,
        |    array_to_string(toks[j:j+7], ' ') AS gram
        |  FROM p
        |), d AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |), h AS (
        |  SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
        |), i AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
        |      THEN 0 ELSE 1 END AS brk
        |  FROM h
        |), s AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM i
        |), spans AS (
        |  SELECT doc_id, min(pos) AS a, max(pos) + 8 AS b
        |  FROM s GROUP BY doc_id, island
        |), nsp AS (
        |  SELECT doc_id, count(*) AS spans_cut FROM spans GROUP BY doc_id
        |), cov AS (
        |  SELECT sp.doc_id,
        |    unnest(range(sp.a, least(sp.b, len(t.toks)))) AS pos
        |  FROM spans sp JOIN t USING (doc_id)
        |), alltok AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks))) AS j FROM t
        |), kept AS (
        |  SELECT a.doc_id, a.j, a.toks[a.j + 1] AS tok
        |  FROM alltok a LEFT JOIN cov c ON a.doc_id = c.doc_id AND a.j = c.pos
        |  WHERE c.pos IS NULL
        |), agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
        |    count(*) AS kept_tokens
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  CAST(len(t.toks) AS BIGINT) AS orig_tokens,
        |  CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        |  CAST(len(t.toks) - coalesce(a.kept_tokens, 0) AS BIGINT) AS removed_tokens,
        |  CAST(coalesce(n.spans_cut, 0) AS BIGINT) AS spans_cut
        |FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN nsp n USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Deterministic mixture sampling: per-lang quotas drawn by portable
    // md5 hash-rank (two-phase ranked cut, no per-group window).
    QueryDef("q_mixture_sample",
      (s, d) => text.Mixture.mixtureSample(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.Mixture.mixtureOracleSql())),

    // Per-vector symmetric int8 quantization: scalar pins of the full
    // code vector + fidelity metrics, identical double arithmetic in
    // both engines (single-list lambdas, no zip) → hash-exact.
    QueryDef("q_embed_int8",
      (s, d) => graft.sim.Quantize.int8Summary(Tables.embeddings(s, d))
        .orderBy("vec_id"),
      Some(graft.sim.Quantize.int8OracleSql)),

    QueryDef("q_pack_sequences",
      // docsPerBucket=100 forces the multi-bucket carry path at sf0.01
      // (500 docs -> ~5 buckets); the output is invariant to bucket size.
      (s, d) => text.Packing.packSequences(Tables.documents(s, d), 128,
          docsPerBucket = 100L)
        .orderBy("lang", "seq_idx", "pos_in_seq"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end
        |  FROM t
        |), s AS (
        |  SELECT *, tok_end - n_tokens AS tok_start,
        |    (tok_end - n_tokens) // 128 AS first_seq, (tok_end - 1) // 128 AS last_seq
        |  FROM c
        |), e AS (
        |  SELECT doc_id, lang, n_tokens, tok_start, tok_end,
        |    unnest(range(first_seq, last_seq + 1)) AS seq_idx
        |  FROM s
        |)
        |SELECT lang, CAST(seq_idx AS BIGINT) AS seq_idx,
        |  CAST(greatest(tok_start, seq_idx * 128) - seq_idx * 128 AS BIGINT) AS pos_in_seq,
        |  doc_id,
        |  CAST(greatest(tok_start, seq_idx * 128) - tok_start AS BIGINT) AS doc_offset,
        |  CAST(least(tok_end, seq_idx * 128 + 128) - greatest(tok_start, seq_idx * 128) AS BIGINT) AS tokens_in_seq,
        |  n_tokens,
        |  (tok_start < seq_idx * 128 OR tok_end > seq_idx * 128 + 128) AS is_split
        |FROM e ORDER BY lang, seq_idx, pos_in_seq""".stripMargin)),

    // Interpolated bigram LM: λ·p(cur|prev) + (1−λ)·p(cur), <s> start
    // symbol, micro-nat fixed-point quantization (UnigramLm contract).
    QueryDef("q_bigram_lm",
      (s, d) => text.BigramLm.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.BigramLm.oracleSql)),

    // Trigram Stupid Backoff (Brants 2007): the LM trains on the 80%
    // hash split and scores the HELD-OUT docs, so the backoff ladder
    // (trigram hit → bigram → unigram → OOV floor) is actually exercised;
    // per-doc tier counts ride along as the coverage diagnostic. Exact
    // integer counts, fixed expression order, micro-nat quantization —
    // hash-exact like the bigram LM.
    QueryDef("q_backoff_lm",
      (s, d) => text.StupidBackoff.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.StupidBackoff.oracleSql)),

    // Interpolated Kneser–Ney bigram LM (absolute discount D=0.75 +
    // continuation counts): the quality rung above Stupid Backoff —
    // integer-exact counts and count-distincts, one fixed-order IEEE
    // score expression shared verbatim with the oracle, micro-nat
    // quantization. Trains on the 80% hash split, scores held-out docs;
    // per-doc tier counts (bi/cont/oov) ride along.
    QueryDef("q_kneser_ney",
      (s, d) => text.KneserNey.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.KneserNey.oracleSql)),

    // Moore–Lewis cross-entropy-difference data selection: held-out docs
    // scored by an in-domain ('en' train) vs general (all train) unigram
    // LM pair with the 0.5/N OOV floor; per-token micro-nat quantization,
    // integer deltas and sums — hash-exact. The exact-unigram ancestor of
    // the hashed-n-gram DSIR weights (q_dsir_weights).
    QueryDef("q_moore_lewis",
      (s, d) => text.MooreLewis.docScores(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.MooreLewis.oracleSql)),

    // BLEU-2 clipped n-gram precision over the bounded same-lang pair
    // block (the contamination/near-dup VERIFICATION metric): integer
    // clip counts, brevity penalty, float32-collapsed libm chain shared
    // verbatim with the oracle.
    QueryDef("q_bleu_pairs",
      (s, d) => text.Bleu.bleuPairs(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(text.Bleu.oracleSql())),

    // chrF character n-gram F-score over the same bounded pair block:
    // the subword-robust overlap metric BLEU's token grain misses —
    // pure integer clip counts + a libm-free rational F chain (β=2,
    // n=1..3), IEEE-identical cross-engine with no collapse.
    QueryDef("q_chrf_pairs",
      (s, d) => text.ChrF.chrfPairs(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(text.ChrF.oracleSql())),

    // Deterministic per-epoch word-dropout augmentation (the denoising/
    // contrastive view generator): md5 basis-point keep decision per
    // (doc, epoch, position), entirely row-local — same corpus + epoch
    // always yields the same view, no random state crosses executors.
    QueryDef("q_word_dropout",
      (s, d) => text.Augment.wordDropout(Tables.documents(s, d))
        .orderBy("doc_id", "epoch"),
      Some(text.Augment.oracleSql())),

    // Self-BLEU corpus-diversity rollup: avg pairwise BLEU-2 per lang
    // (high = the corpus keeps saying the same thing); per-pair scores
    // micro-quantized before the integer rollup.
    QueryDef("q_self_bleu",
      (s, d) => text.Bleu.selfBleu(Tables.documents(s, d)).orderBy("lang"),
      Some(text.Bleu.selfBleuOracleSql())),

    // N-gram novelty of held-out docs vs the train split (the Lee et al.
    // 2022 memorization/leakage diagnostic): distinct 5-gram membership
    // probe, integer counts, one IEEE division.
    QueryDef("q_ngram_novelty",
      (s, d) => text.Novelty.docNovelty(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.Novelty.oracleSql)),

    // Novelty served FROM the incremental gram store (base build + delta
    // append covering the same train split) — shares q_ngram_novelty's
    // oracle VERBATIM: the store answers the memorization question
    // bit-identically to a from-scratch re-shingle.
    QueryDef("q_novelty_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val train = docs.filter(text.Novelty.defaultTrainPred)
        val root = graft.util.Scratch.dir("graft-gram-store") + "/grams"
        text.Novelty.buildGramStore(train.filter(col("doc_id") % 2 === 0), root)
        text.Novelty.appendGramStore(train.filter(col("doc_id") % 2 === 1), root)
        text.Novelty.noveltyFromStore(s, root,
            docs.filter(!text.Novelty.defaultTrainPred))
          .orderBy("doc_id")
      },
      Some(text.Novelty.oracleSql)),

    // CCNet perplexity buckets: every document ranked by bigram-LM
    // fluency and cut into head/middle/tail terciles — the quality
    // stratification deciding which crawl slice trains at full weight.
    // Rank key = ONE IEEE division of exact micro-nat integers; tercile
    // cut = integer arithmetic; global rank via ScalableRank.
    QueryDef("q_ppl_buckets",
      (s, d) => text.BigramLm.pplBuckets(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(text.BigramLm.pplBucketsOracleSql)),

    QueryDef("q_unigram_lm",
      (s, d) => text.UnigramLm.docLogProb(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), tok2 AS (
        |  SELECT doc_id, token FROM tok WHERE token <> ''
        |), vocab AS (
        |  SELECT token, count(*) AS cnt FROM tok2 GROUP BY 1
        |), tot AS (
        |  SELECT sum(cnt) AS total_tokens FROM vocab
        |), lm AS (
        |  SELECT token,
        |    CAST(floor(CAST(CAST(ln(CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS FLOAT) AS DOUBLE)
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS lp_micro
        |  FROM vocab CROSS JOIN tot
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp_micro) AS sum_lp_micro
        |  FROM tok2 JOIN lm USING (token) GROUP BY 1
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sum_lp_micro AS BIGINT) AS sum_lp_micro,
        |  CAST(sum_lp_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) / n_tokens AS avg_logprob,
        |  -(CAST(sum_lp_micro AS DOUBLE) / CAST(1000000.0 AS DOUBLE) / n_tokens) / ${text.UnigramLm.Ln2Literal} AS bits_per_token
        |FROM agg ORDER BY doc_id""".stripMargin)),

    // Blocklist / taxonomy tagging on the NEW multi_match Aho-Corasick
    // expression: P phrases in ONE text pass (vs P contains() scans),
    // map-only at doc grain. The oracle's list_filter(contains) P-scan
    // definition hash-gates the automaton, including the
    // pattern-inside-pattern dict-link cases.
    QueryDef("q_blocklist_tags",
      (s, d) => text.Blocklist.tagDocs(Tables.documents(s, d)).orderBy("doc_id"),
      Some(text.Blocklist.tagDocsOracleSql())),

    // Tag-grain rollup of the same tagger: docs + distinct sources per
    // tag; one partial-agged exchange of <= |tags| rows per doc.
    QueryDef("q_blocklist_summary",
      (s, d) => text.Blocklist.tagSummary(Tables.documents(s, d)).orderBy("tag"),
      Some(text.Blocklist.tagSummaryOracleSql())),

    // Single-pass blocklist REDACTION (multi_redact + multi_match_count):
    // leftmost-longest non-overlapping masking, hash-gated against a
    // longest-first-alternation global regex replace — the semantics
    // proof that the automaton sweep equals the regex contract while
    // costing O(text) for any pattern count.
    QueryDef("q_blocklist_redact",
      (s, d) => text.Blocklist.redactDocs(Tables.documents(s, d)).orderBy("doc_id"),
      Some(text.Blocklist.redactOracleSql())),

    // Per-language readability (ARI + Coleman-Liau): syllable-free
    // formulas over exact char/word/sentence count sums, one mirrored
    // IEEE chain per score — the corpus-quality dashboard row that needs
    // only a map-only count projection + one lang-grain exchange.
    QueryDef("q_readability",
      (s, d) => text.Readability.byLanguage(Tables.documents(s, d)).orderBy("lang"),
      Some(text.Readability.byLanguageOracleSql))
  )
}
