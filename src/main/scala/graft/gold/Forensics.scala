package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forensic-accounting screens over monetary columns.
  *
  * Benford's law: in organically-generated amounts the leading digit d
  * appears with probability log₁₀(1+1/d); fabricated or manipulated
  * amounts (fraud rings inventing invoice values) deviate measurably.
  * The chi-square statistic against the Benford expectation per segment
  * is a standard first-pass fraud screen — a natural gold-layer addition
  * to the reference's fraud summary family.
  *
  * Scale shape: one partial-agged groupBy to (segment, digit) grain —
  * at most 9 digits × segments rows — then constant-size window math.
  * The leading digit is extracted through the exact decimal(18,2) cents
  * representation (the same cast contract the money-sum oracles use,
  * SURVEY §4), never via double log10, whose boundary rounding
  * (log10(1000) → 2.9999…) would misclassify powers of ten.
  */
object Forensics {

  /** Leading decimal digit of a positive money amount, exact. */
  def leadingDigit(amount: Column): Column =
    substring(amount.cast("decimal(18,2)").*(lit(100)).cast("long").cast("string"), 1, 1)
      .cast("long")

  /** Per (segment, digit): observed count, Benford expectation, and the
    * chi-square contribution. `amount` must be > 0 (filter upstream). */
  def benford(df: DataFrame, segment: Column, amount: Column): DataFrame = {
    val counts = df
      .groupBy(segment.as("segment"), leadingDigit(amount).as("digit"))
      .agg(count(lit(1)).as("observed"))
    // ≤ 9 rows per segment: bounded window at agg grain.
    val wSeg = Window.partitionBy(col("segment"))
    val expP = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    counts
      .withColumn("segment_total", sum(col("observed")).over(wSeg))
      .withColumn("expected_p", expP)
      .withColumn("observed_p",
        col("observed").cast("double") / col("segment_total"))
      .withColumn("expected_n", col("segment_total").cast("double") * col("expected_p"))
      .withColumn("chi2_term",
        (col("observed").cast("double") - col("expected_n")) *
          (col("observed").cast("double") - col("expected_n")) / col("expected_n"))
      .select("segment", "digit", "observed", "segment_total",
        "observed_p", "expected_p", "chi2_term")
      .orderBy("segment", "digit")
  }

  /** Bot-timing screen: per-user inter-event-gap regularity. Human
    * activity has bursty arrivals (squared coefficient of variation
    * cv² ≈ 1 for Poisson, > 1 for bursts); scripted clients fire on a
    * timer (cv² ≈ 0). Flag users with enough events whose gap cv²
    * falls below `maxCv2` — the timing counterpart of the Benford
    * value screen.
    *
    * Exactness: gaps are integer SECONDS (µs div 1e6); moments
    * accumulate as DECIMAL(38,0) exact integer sums (µs² would
    * overflow BIGINT; second-grain squares fit 38 digits at any
    * realistic scale); mean/variance/cv² form in fixed expression
    * order from the exact sums (q_corr contract), guarded NULL when
    * the mean is zero.
    *
    * Scale shape: one (user)-keyed lag window — the exchange every
    * sessionizer rides — then a partial-agged per-user reduction.
    * Linear, no self-joins. */
  def botTiming(events: DataFrame, minEvents: Long = 20,
                maxCv2: Double = 0.1): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gaps = events
      .select(col("event_id"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_s", expr("(ts_us - prev_us) div 1000000"))
    gaps.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap_s").cast("decimal(38,0)")).as("sum_g"),
        sum((col("gap_s") * col("gap_s")).cast("decimal(38,0)")).as("sum_g2"))
      // decimal→double routed through VARCHAR (the q_corr contract): one
      // correctly-rounded conversion in both engines.
      .withColumn("mean_gap_s",
        col("sum_g").cast("string").cast("double") / col("n_gaps").cast("double"))
      .withColumn("var_gap",
        col("sum_g2").cast("string").cast("double") / col("n_gaps").cast("double")
          - col("mean_gap_s") * col("mean_gap_s"))
      .withColumn("cv2",
        when(col("mean_gap_s") > 0,
          col("var_gap") / (col("mean_gap_s") * col("mean_gap_s"))))
      .withColumn("is_bot_timing",
        col("n_gaps") >= minEvents && col("cv2").isNotNull &&
          col("cv2") < maxCv2)
      .select("user_id", "n_gaps", "mean_gap_s", "cv2", "is_bot_timing")
      .orderBy("user_id")
  }

  /** Hill (1975) tail-index estimator over the top-k order statistics —
    * the heavy-tail screen next to [[benford]]'s digit test: α ≤ 2 means
    * infinite variance (a single whale can dominate any mean-based
    * statistic), which changes how every downstream amount aggregate
    * should be read. 1/α̂ = mean of ln(xᵢ/x_k) over the k−1 largest
    * values.
    *
    * Exactness: each ln is float32-rounded to micro-nats (Colloc.q) so
    * the sum Σ(qᵢ − q_k) is EXACT integer arithmetic; α forms in one
    * IEEE chain, NULL when all top-k values tie (zero sum).
    *
    * Scale shape: the top-k cut is TakeOrderedAndProject (two-phase,
    * never a global sort); everything after runs on a k-row frame, so
    * the single-partition window is bounded by the parameter, not the
    * data. */
  def hillTailIndex(df: DataFrame, value: Column, tiebreak: Column,
                    k: Int = 100): DataFrame = {
    val top = df.select(value.as("x"), tiebreak.as("_tb"))
      .filter(col("x") > 0)
      .orderBy(col("x").desc, col("_tb").asc)
      .limit(k)
      .withColumn("qx", expr(qln("x")))
    top
      .agg(
        count(lit(1)).as("k_used"),
        min(col("x")).as("x_min_top"),
        sum(col("qx")).as("_q_sum"))
      // Σᵢ(qᵢ − q_k) = Σqᵢ − k·q_k (the k-th term self-cancels), with q_k
      // re-derived rank-freely as the MIN x's quantized ln — no window
      // needed anywhere
      .withColumn("_qk", expr(qln("x_min_top")))
      .withColumn("hill_sum",
        col("_q_sum") - col("k_used") * col("_qk"))
      .withColumn("inv_alpha",
        when(col("k_used") > 1 && col("hill_sum") > 0,
          col("hill_sum").cast("double")
            / (lit(1000000.0) * (col("k_used") - lit(1L)).cast("double"))))
      .withColumn("alpha", lit(1.0) / col("inv_alpha"))
      .withColumn("heavy_tail", col("alpha") < 2.0)
      .select("k_used", "x_min_top", "hill_sum", "inv_alpha", "alpha",
        "heavy_tail")
  }

  /** DuckDB mirror of [[hillTailIndex]] over orders.o_totalprice. */
  def hillOracleSql(k: Int = 100): String =
    s"""WITH topk AS (
      |  SELECT o_totalprice AS x FROM orders
      |  WHERE o_totalprice > 0
      |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT $k
      |), q AS (
      |  SELECT x, ${qln("x")} AS qx FROM topk
      |), agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k_used, min(x) AS x_min_top,
      |    CAST(sum(qx) AS BIGINT) AS q_sum
      |  FROM q
      |), h AS (
      |  SELECT k_used, x_min_top,
      |    q_sum - k_used * ${qln("x_min_top")} AS hill_sum
      |  FROM agg
      |), ia AS (
      |  SELECT *, CASE WHEN k_used > 1 AND hill_sum > 0 THEN
      |    CAST(hill_sum AS DOUBLE)
      |      / (CAST(1000000.0 AS DOUBLE) * CAST(k_used - 1 AS DOUBLE))
      |  END AS inv_alpha
      |  FROM h
      |)
      |SELECT k_used, x_min_top, hill_sum, inv_alpha,
      |  1.0 / inv_alpha AS alpha, (1.0 / inv_alpha) < 2.0 AS heavy_tail
      |FROM ia""".stripMargin

  private def qln(v: String): String =
    s"CAST(floor(CAST(CAST(ln(CAST($v AS DOUBLE)) AS FLOAT) AS DOUBLE)" +
      " * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"

  /** Per-user Shannon entropy of the event-type mix — the WHAT-variety
    * companion to botTiming's WHEN-regularity screen: scripted accounts
    * hammer one action (entropy → 0) while organic users mix
    * view/click/purchase. H = ln N − (Σ c·ln c)/N in nats, plus the
    * type-count-normalized H/ln(k) in [0, 1].
    *
    * Cross-engine determinism: each ln is float32-rounded to micro-nats
    * (the Colloc.q libm-absorbing contract) and the weighted sum
    * Σ c·q(ln c) accumulates as exact BIGINTs — headroom: c·ln(c)·10⁶
    * stays under 2⁶³ for any per-(user, type) count up to ~2.8·10¹¹ —
    * then ONE fixed IEEE chain forms H and H/ln(k). n_types = 1 gives
    * exactly 0 entropy and a NULL normalization (ln 1 = 0).
    *
    * Scale shape: two partial-agged shuffles — (user, type) grain then
    * user grain. Linear, no windows, no joins.
    */
  def userEntropy(events: DataFrame, minEvents: Long = 10,
                  maxNormEntropy: Double = 0.3): DataFrame = {
    events
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .withColumn("term", expr(s"c * ${qln("c")}"))
      .groupBy("user_id")
      .agg(
        sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("term")).as("s_micro"))
      .filter(col("n_events") >= minEvents)
      .withColumn("entropy_nats",
        expr(s"CAST(n_events * ${qln("n_events")} - s_micro AS DOUBLE)")
          / (col("n_events").cast("double") * lit(1000000.0)))
      .withColumn("norm_entropy",
        when(col("n_types") > 1,
          expr(s"CAST(n_events * ${qln("n_events")} - s_micro AS DOUBLE)")
            / (col("n_events").cast("double") * expr(s"CAST(${qln("n_types")} AS DOUBLE)"))))
      .withColumn("is_low_entropy",
        col("n_types") === 1 || col("norm_entropy") < maxNormEntropy)
      .select("user_id", "n_events", "n_types", "s_micro",
        "entropy_nats", "norm_entropy", "is_low_entropy")
  }

  /** DuckDB mirror of [[userEntropy]]. */
  def userEntropyOracleSql(minEvents: Long = 10,
                           maxNormEntropy: Double = 0.3): String =
    s"""WITH ec AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), u AS (
      |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(c * ${qln("c")}) AS BIGINT) AS s_micro
      |  FROM ec GROUP BY 1
      |  HAVING sum(c) >= $minEvents
      |), h AS (
      |  SELECT *,
      |    CAST(n_events * ${qln("n_events")} - s_micro AS DOUBLE)
      |      / (CAST(n_events AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS entropy_nats,
      |    CASE WHEN n_types > 1 THEN
      |      CAST(n_events * ${qln("n_events")} - s_micro AS DOUBLE)
      |        / (CAST(n_events AS DOUBLE) * CAST(${qln("n_types")} AS DOUBLE))
      |    END AS norm_entropy
      |  FROM u
      |)
      |SELECT user_id, n_events, n_types, s_micro, entropy_nats, norm_entropy,
      |  (n_types = 1 OR norm_entropy < $maxNormEntropy) AS is_low_entropy
      |FROM h ORDER BY user_id""".stripMargin
}
