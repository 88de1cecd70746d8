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

/** Registry slice: privacy (k-anon/l-div/DP), skew handling, ER, delta-join MV.
  * Split from the monolithic Queries.scala (r11) — a pure move with zero
  * behavior change; shared oracle CTE fragments live in [[QueriesShared]].
  */
private[graft] object QueriesPrivacy {
  private[graft] lazy val defs: Seq[QueryDef] = Seq(

    // Jaro–Winkler ER: same BLOCK→GOVERN→VERIFY pipeline as
    // q_entity_match, scored by the native codegen'd jaro_winkler
    // expression (functions/JaroWinkler.scala). Semantics pinned to
    // DuckDB's jaro_winkler_similarity; float32 collapse on both sides
    // makes the score and the threshold filter hash-exact.
    QueryDef("q_er_jarowinkler",
      (s, d) => operators.EntityResolution.matchCustomersJw(Tables.customer(s, d)),
      Some("""WITH c AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |), ok AS (
        |  SELECT c_nationkey, c_mktsegment FROM c
        |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 500
        |), adm AS (
        |  SELECT c.* FROM c JOIN ok USING (c_nationkey, c_mktsegment)
        |)
        |SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |  a.c_nationkey, a.c_mktsegment,
        |  CAST(CAST(jaro_winkler_similarity(a.c_name, b.c_name) AS FLOAT) AS DOUBLE) AS jw_sim
        |FROM adm a JOIN adm b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |WHERE a.c_custkey < b.c_custkey
        |  AND CAST(CAST(jaro_winkler_similarity(a.c_name, b.c_name) AS FLOAT) AS DOUBLE) >= 0.97
        |ORDER BY cust_a, cust_b""".stripMargin)),

    // k-anonymity audit over the (nation, segment, balance-band) QI
    // (gold/Privacy.scala): one partial-agged exchange at QI grain.
    QueryDef("q_k_anonymity",
      (s, d) => gold.Privacy.kAnonymity(Tables.customer(s, d)),
      Some(s"""SELECT c_nationkey, c_mktsegment,
        |  ${gold.Privacy.AcctbalBandSql} AS acctbal_band,
        |  count(*) AS group_size, count(*) >= 10 AS meets_k
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // l-diversity of order priority within each (nation, segment) QI
    // group: distinct sensitive values + modal share, computed on
    // (QI, sensitive)-grain cells so the exchange never carries rows.
    QueryDef("q_l_diversity",
      (s, d) => gold.Privacy.lDiversity(Tables.orders(s, d), Tables.customer(s, d)),
      Some("""WITH cell AS (
        |  SELECT c_nationkey, c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3
        |)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(sum(n) AS BIGINT) AS group_size,
        |  count(*) AS distinct_sensitive,
        |  CAST(max(n) AS BIGINT) AS modal_count,
        |  CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS modal_share,
        |  count(*) >= 3 AS meets_l
        |FROM cell GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Suppression-to-k release: QI combos below k collapse into the
    // residual '*' group; audit reports sizes + merged-combo counts.
    // t-closeness audit: per-QI-class EMD between the class's sensitive
    // distribution and the global one over the ORDERED priority domain —
    // the distribution-level tightening of l-diversity. Integer
    // cumulative-difference numerators over the common n·N denominator,
    // decimal(38,0)/HUGEINT products, one IEEE chain for the EMD
    // (gold/Privacy.tCloseness).
    QueryDef("q_t_closeness",
      (s, d) => gold.Privacy.tCloseness(Tables.orders(s, d), Tables.customer(s, d)),
      Some(gold.Privacy.tClosenessOracleSql())),

    QueryDef("q_suppress_k",
      (s, d) => gold.Privacy.suppressToK(Tables.customer(s, d)),
      Some(s"""WITH sized AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation_qi, c_mktsegment AS segment_qi,
        |    ${gold.Privacy.AcctbalBandSql} AS band_qi, count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3
        |), sup AS (
        |  SELECT CASE WHEN n < 10 THEN '*' ELSE nation_qi END AS nation_qi,
        |    CASE WHEN n < 10 THEN '*' ELSE segment_qi END AS segment_qi,
        |    CASE WHEN n < 10 THEN '*' ELSE band_qi END AS band_qi,
        |    n < 10 AS suppressed, n
        |  FROM sized
        |)
        |SELECT nation_qi, segment_qi, band_qi, suppressed,
        |  CAST(sum(n) AS BIGINT) AS group_size, count(*) AS merged_combos
        |FROM sup GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3""".stripMargin)),

    // ε-DP per-nation revenue release with deterministic hash-derived
    // Laplace noise (gold/Privacy.scala laplaceNoise: every step before
    // the single float32-collapsed ln is integer/dyadic-exact, so both
    // engines produce bit-identical noise).
    QueryDef("q_dp_release",
      (s, d) => gold.Privacy.dpRevenueByNation(Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d)),
      Some({
        val bRev = 600000.0 / 1.0
        val noiseRev = gold.Privacy.laplaceNoiseSql("concat(n_name, '|rev')", bRev)
        val noiseCnt = gold.Privacy.laplaceNoiseSql("concat(n_name, '|cnt')", 1.0)
        s"""WITH base AS (
        |  SELECT n_name,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS true_revenue,
        |    count(*) AS true_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1
        |)
        |SELECT n_name, true_revenue, true_orders,
        |  true_revenue + $noiseRev AS noised_revenue,
        |  true_orders + $noiseCnt AS noised_orders
        |FROM base ORDER BY n_name""".stripMargin
      })),

    // Targeted salted skew join (operators/SkewJoin.scala): hot keys
    // split across S reducer slots, cold keys untouched; output is
    // bit-identical to the plain join (salting is pure partitioning).
    QueryDef("q_skew_join",
      (s, d) => operators.SkewJoin.revenueByPriority(
        Tables.lineitem(s, d), Tables.orders(s, d)),
      Some("""SELECT o_orderpriority, count(*) AS line_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Delta-join incremental MV maintenance (gold/DeltaView.scala):
    // merge(MV(A⋈B), agg(ΔA⋈B)) with decimal partial states; the
    // oracle is the full recompute — the identity is hash-checked.
    QueryDef("q_delta_join_mv",
      (s, d) => gold.DeltaView.monthlyRevenueIncremental(
        Tables.orders(s, d), Tables.lineitem(s, d)),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  // ---- round-10 additions: MV-rewrite gate, line dedup, image phash ----
}
