package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Always-valid sequential A/B testing via the mixture sequential
  * probability ratio test (mSPRT — Robbins 1970; Johari, Koomen, Pekelis,
  * Walsh 2017 "Peeking at A/B Tests"): a daily monitoring table whose
  * p-value is valid at EVERY peek, unlike the fixed-horizon z-test
  * (Behavior.funnelAb) that inflates false positives under continuous
  * monitoring. Users hash-split into two arms (the md5 contract of
  * operators/Sampling — deterministic, append-stable), enter at their
  * first event day, convert at their first purchase day; each day carries
  * the cumulative two-proportion state, the mixture log likelihood ratio
  *   ln Λ_n = ½·ln(σ²ₙ/(σ²ₙ+τ²)) + Δ²τ² / (2σ²ₙ(σ²ₙ+τ²)),
  * and the running always-valid p-value  pₙ = min_{m≤n} min(1, 1/Λ_m).
  *
  * Exactness: all counts are exact BIGINT prefix sums on the (arm, day)
  * grid; Δ and σ²ₙ are fixed IEEE chains of those integers; the two libm
  * calls (ln, exp) float32-round to micro-units (the Colloc.q
  * libm-absorbing contract) so the p-value column is an exact INTEGER
  * running min. Scale: two user-grain exchanges (first-seen/first-converted)
  * + day-grain rollups; every window partitions by arm or runs over the
  * calendar-bounded daily grid — never a corpus-sized single partition. */
object Sequential {

  /** Daily mSPRT monitoring table over a deterministic 50/50 user split.
    * τ² is the normal mixture variance (prior scale of the effect the
    * test is powered for); rejectAt is in micro-p units (50000 = 0.05). */
  def msprtDaily(events: DataFrame, tau2: Double = 0.01,
                 rejectMicroP: Long = 50000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(col("user_id"), to_date(col("ts")).as("d"),
      col("event_type"))
    val users = base.groupBy("user_id")
      .agg(min(col("d")).as("d_exp"),
        min(when(col("event_type") === "purchase", col("d"))).as("d_conv"))
      .withColumn("arm", when(
        graft.operators.Sampling.hashBp(col("user_id")) < 5000,
        lit("A")).otherwise(lit("B")))
    // calendar spine × 2 arms (tiny literal cross), day-grain increments,
    // arm-partitioned prefix sums = cumulative exposure/conversion counts
    val days = base.select(col("d")).distinct()
    val spine = days.crossJoin(Seq("A", "B").toDF("arm"))
    val expInc = users.groupBy(col("arm"), col("d_exp").as("d"))
      .agg(count(lit(1)).as("_e"))
    val convInc = users.filter(col("d_conv").isNotNull)
      .groupBy(col("arm"), col("d_conv").as("d"))
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy("arm").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = spine
      .join(expInc, Seq("arm", "d"), "left")
      .join(convInc, Seq("arm", "d"), "left")
      .withColumn("n", sum(coalesce(col("_e"), lit(0L))).over(wCum))
      .withColumn("x", sum(coalesce(col("_c"), lit(0L))).over(wCum))
    val daily = cum.groupBy("d").agg(
      max(when(col("arm") === "A", col("n"))).as("n_a"),
      max(when(col("arm") === "A", col("x"))).as("x_a"),
      max(when(col("arm") === "B", col("n"))).as("n_b"),
      max(when(col("arm") === "B", col("x"))).as("x_b"))
    // fixed IEEE chains off the exact counts; ln/exp float32-round to
    // micro-units so everything downstream is integer-exact
    val stats = daily.select(col("d"), col("n_a"), col("x_a"), col("n_b"), col("x_b"))
      .withColumn("_ok",
        col("n_a") > 0L && col("n_b") > 0L &&
          (col("x_a") + col("x_b")) > 0L &&
          (col("x_a") + col("x_b")) < (col("n_a") + col("n_b")))
      .withColumn("delta", when(col("_ok"),
        expr("CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)")))
      .withColumn("se2", when(col("_ok"), expr(
        """(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
          | * (1.0D - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
          | * (1.0D / CAST(n_a AS DOUBLE) + 1.0D / CAST(n_b AS DOUBLE))""".stripMargin)))
      .withColumn("_t1_micro", when(col("_ok"), expr(
        s"CAST(floor(CAST(CAST(ln(se2 / (se2 + ${tau2}D)) AS FLOAT) AS DOUBLE) * 1000000.0D) AS BIGINT)")))
      .withColumn("ln_lr", when(col("_ok"), expr(
        s"(CAST(_t1_micro AS DOUBLE) / 1000000.0D) * 0.5D + delta * delta * ${tau2}D / (2.0D * se2 * (se2 + ${tau2}D))")))
      // clamp at 1e12 micro: far above the p=1 cap, and keeps the cast in
      // BIGINT range in both engines (Spark saturates, DuckDB errors)
      .withColumn("lr_inv_micro", when(col("_ok"), expr(
        "CAST(floor(least(CAST(CAST(exp(-ln_lr) AS FLOAT) AS DOUBLE) * 1000000.0D, 1000000000000.0D)) AS BIGINT)")))
    val wRun = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stats
      .withColumn("_m", min(col("lr_inv_micro")).over(wRun))
      .withColumn("p_valid_micro",
        when(col("_m").isNotNull, least(lit(1000000L), col("_m"))))
      .withColumn("reject_at_05",
        coalesce(col("p_valid_micro") < rejectMicroP, lit(false)))
      .drop("_ok", "_m")
      .orderBy("d")
  }

  /** DuckDB oracle mirroring [[msprtDaily]] at the default parameters. */
  def msprtOracleSql(tau2: Double = 0.01, rejectMicroP: Long = 50000L): String =
    s"""WITH base AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, event_type FROM events
       |), users AS (
       |  SELECT user_id, min(d) AS d_exp,
       |    min(CASE WHEN event_type = 'purchase' THEN d END) AS d_conv,
       |    CASE WHEN CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      % 10000 < 5000 THEN 'A' ELSE 'B' END AS arm
       |  FROM base GROUP BY user_id
       |), days AS (SELECT DISTINCT d FROM base
       |), spine AS (SELECT d, arm FROM days CROSS JOIN (VALUES ('A'), ('B')) a(arm)
       |), ei AS (SELECT arm, d_exp AS d, count(*) AS e FROM users GROUP BY 1, 2
       |), ci AS (SELECT arm, d_conv AS d, count(*) AS c FROM users
       |          WHERE d_conv IS NOT NULL GROUP BY 1, 2
       |), cum AS (
       |  SELECT s.d, s.arm,
       |    CAST(sum(COALESCE(ei.e, 0)) OVER (PARTITION BY s.arm ORDER BY s.d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
       |    CAST(sum(COALESCE(ci.c, 0)) OVER (PARTITION BY s.arm ORDER BY s.d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS x
       |  FROM spine s LEFT JOIN ei ON s.arm = ei.arm AND s.d = ei.d
       |    LEFT JOIN ci ON s.arm = ci.arm AND s.d = ci.d
       |), daily AS (
       |  SELECT d,
       |    max(CASE WHEN arm = 'A' THEN n END) AS n_a,
       |    max(CASE WHEN arm = 'A' THEN x END) AS x_a,
       |    max(CASE WHEN arm = 'B' THEN n END) AS n_b,
       |    max(CASE WHEN arm = 'B' THEN x END) AS x_b
       |  FROM cum GROUP BY d
       |), st AS (
       |  SELECT *,
       |    (n_a > 0 AND n_b > 0 AND (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b)) AS ok
       |  FROM daily
       |), s2 AS (
       |  SELECT d, n_a, x_a, n_b, x_b,
       |    CASE WHEN ok THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       |      - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS delta,
       |    CASE WHEN ok THEN (CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) END AS se2,
       |    ok
       |  FROM st
       |), s3 AS (
       |  SELECT *,
       |    CASE WHEN ok THEN CAST(floor(CAST(CAST(ln(se2 / (se2 + $tau2)) AS FLOAT) AS DOUBLE)
       |      * 1000000.0) AS BIGINT) END AS t1_micro
       |  FROM s2
       |), s4 AS (
       |  SELECT *,
       |    CASE WHEN ok THEN (CAST(t1_micro AS DOUBLE) / 1000000.0) * 0.5
       |      + delta * delta * $tau2 / (2.0 * se2 * (se2 + $tau2)) END AS ln_lr
       |  FROM s3
       |), s5 AS (
       |  SELECT *,
       |    CASE WHEN ok THEN CAST(floor(least(CAST(CAST(exp(-ln_lr) AS FLOAT) AS DOUBLE)
       |      * 1000000.0, 1000000000000.0)) AS BIGINT) END AS lr_inv_micro
       |  FROM s4
       |), s6 AS (
       |  SELECT *,
       |    min(lr_inv_micro) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
       |  FROM s5
       |)
       |SELECT d, n_a, x_a, n_b, x_b, delta, se2, t1_micro AS _t1_micro, ln_lr,
       |  lr_inv_micro,
       |  CASE WHEN m IS NOT NULL THEN least(1000000, m) END AS p_valid_micro,
       |  COALESCE(CASE WHEN m IS NOT NULL THEN least(1000000, m) END < $rejectMicroP,
       |    false) AS reject_at_05
       |FROM s6 ORDER BY d""".stripMargin
}
