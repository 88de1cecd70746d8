package graft.gold

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov removal-effect attribution (Anderl, Becker, von Wangenheim,
  * Schumann 2014 — the standard "data-driven attribution" model): build a
  * first-order Markov chain over per-(user, day) journeys (start →
  * channel → … → conv/null), then credit each channel by how much the
  * chain's conversion probability DROPS when that channel's node is
  * removed (incoming edges redirect to null). Unlike position rules
  * (first/last/linear/time-decay) and unlike Shapley on journey SETS,
  * the removal effect prices a channel by its role in the observed
  * TRANSITION structure — a channel that only ever echoes another earns
  * nothing even if it co-occurs everywhere.
  *
  * Integer-exactness (the device-pagerank playbook): edge probabilities
  * quantize once to p6 = (count·10⁶) div out_count; absorption runs a
  * FIXED 32-step power iteration in q12 fixed point (start mass 10¹²,
  * per-edge term (mass·p6) div 10⁶ — each term an exact BIGINT, sums
  * order-independent), so conversion probabilities, removal effects, and
  * their differences are exact integers in both engines; the only
  * doubles are the final share/revenue chains.
  *
  * Scale shape: journeys are one (user, day)-grain window pass (two
  * ordered windows: truncate-at-first-purchase, then lag); the transition
  * matrix is a partial-agged groupBy onto ≤ 30 rows. The 5-variant ×
  * 32-step iteration runs driver-side over that corpus-independent
  * bounded state (the accepted BPE/bin-packing/CC-fingerprint class) —
  * never a per-journey expansion. */
object RemovalEffect {

  /** Channel universe (the non-purchase event types). */
  val Channels: Seq[String] = Seq("click", "view", "signup", "error")

  val Q6 = 1000000L
  val Q12 = 1000000000000L
  val Steps = 32

  /** Per-(user, day) journey edges: start → first event type, consecutive
    * type → type, absorption at the FIRST purchase ('conv') or at day end
    * ('null'). Output: (from_s, to_s) edge rows at journey grain. */
  def journeyEdges(events: DataFrame): DataFrame = {
    val base = events
      .filter(col("event_type").isin((Channels :+ "purchase"): _*))
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type").as("typ"), col("value"))
    val wOrd = Window.partitionBy("user_id", "day")
      .orderBy("ts_us", "event_id")
    val wAll = Window.partitionBy("user_id", "day")
    // truncate each day-journey at its first purchase (inclusive)
    val kept = base
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("p_rn",
        min(when(col("typ") === "purchase", col("rn"))).over(wAll))
      .filter(col("p_rn").isNull || col("rn") <= col("p_rn"))
    val marked = kept
      .withColumn("from_s", coalesce(lag(col("typ"), 1).over(wOrd), lit("start")))
      .withColumn("to_s",
        when(col("typ") === "purchase", lit("conv")).otherwise(col("typ")))
      .withColumn("max_rn", max(col("rn")).over(wAll))
    val inner = marked.select(col("from_s"), col("to_s"), col("value"),
      (col("to_s") === "conv").as("is_conv"))
    // non-converting journeys absorb into 'null' after their last event
    val terminal = marked
      .filter(col("p_rn").isNull && col("rn") === col("max_rn"))
      .select(col("typ").as("from_s"), lit("null").as("to_s"),
        lit(0.0).as("value"), lit(false).as("is_conv"))
    inner.unionByName(terminal)
  }

  /** The bounded chain state: transition counts with out-totals and q6
    * edge probabilities, plus the converted-value total. */
  private def chainState(events: DataFrame): (Seq[(String, String, Long, Long)], Long) = {
    val edges = journeyEdges(events)
    val trans = edges.groupBy("from_s", "to_s")
      .agg(count(lit(1)).as("c"))
      .withColumn("out_c", sum(col("c")).over(Window.partitionBy("from_s")))
      .orderBy("from_s", "to_s")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val totalMicro = edges.filter(col("is_conv"))
      .agg(coalesce(sum(floor(col("value") * lit(1000000.0)).cast("long")),
        lit(0L)))
      .collect()(0).getLong(0)
    (trans, totalMicro)
  }

  /** 32-step q12 power iteration of the chain given per-edge q6 probs;
    * returns the mass absorbed in 'conv'. Pure integer arithmetic —
    * mirrors the oracle's unrolled CTE chain bit-for-bit. */
  private def absorb(edges: Seq[(String, String, Long)]): Long = {
    val withLoops = edges ++ Seq(("conv", "conv", Q6), ("null", "null", Q6))
    var mass = Map("start" -> Q12)
    var i = 0
    while (i < Steps) {
      val next = scala.collection.mutable.Map.empty[String, Long]
      for ((f, t, p6) <- withLoops; m <- mass.get(f)) {
        val term = (m * p6) / Q6
        if (term != 0L) next(t) = next.getOrElse(t, 0L) + term
      }
      mass = next.toMap
      i += 1
    }
    mass.getOrElse("conv", 0L)
  }

  /** Removal-variant edge list: edges INTO the removed channel redirect
    * to 'null' (out-counts unchanged), edges OUT of it drop. */
  private def removalEdges(trans: Seq[(String, String, Long, Long)],
                           removed: String): Seq[(String, String, Long)] =
    trans.filter(_._1 != removed).map { case (f, t, c, out) =>
      (f, if (t == removed) "null" else t, c * Q6 / out)
    }

  /** The attribution table: one row per channel with the q12 conversion
    * probability of the full chain and of the chain with that channel
    * removed, the exact removal effect, its share, and the revenue it
    * attributes. */
  def attribution(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val (trans, totalMicro) = chainState(events)
    val schema0 = StructType(Seq(
      StructField("touch_type", StringType, nullable = false),
      StructField("full_conv_q12", LongType, nullable = false),
      StructField("removal_conv_q12", LongType, nullable = false),
      StructField("removal_effect_q12", LongType, nullable = false),
      StructField("share", DoubleType, nullable = true),
      StructField("attributed_revenue", DoubleType, nullable = true)))
    // degenerate corpus (no chain events at all): the oracle's empty
    // trans CTE yields zero rows — mirror that instead of 4 zero rows
    if (trans.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema0)
    val full = absorb(trans.map { case (f, t, c, out) => (f, t, c * Q6 / out) })
    val rows = Channels.map { ch =>
      val removed = absorb(removalEdges(trans, ch))
      val re = full - removed
      (ch, removed, re)
    }
    val totRe = rows.map(_._3).sum
    val out = rows.map { case (ch, removed, re) =>
      val share = if (totRe != 0L) re.toDouble / totRe.toDouble else Double.NaN
      val attributed =
        if (totRe != 0L) totalMicro.toDouble / 1000000.0 * share else Double.NaN
      Row(ch, full, removed, re,
        if (totRe != 0L) share else null,
        if (totRe != 0L) attributed else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema0)
      .orderBy("touch_type")
  }

  // ---- DuckDB oracle ---------------------------------------------------

  /** Oracle mirroring [[attribution]]: the journey/edge CTEs, the
    * transition matrix, a 5-variant q6 edge table, and the 32-step q12
    * power iteration UNROLLED as one vector CTE per step (each over
    * ≤ 5 variants × 7 states rows). */
  def oracleSql: String = {
    val steps = (1 to Steps).map { i =>
      // AS MATERIALIZED: single-reference CTEs inline by default, which
      // would stack 32 copies of the chain into one exponential plan
      s"""v$i AS MATERIALIZED (
         |  SELECT v.variant AS variant, t.to_s AS state,
         |    CAST(sum((v.mass * t.p6) // 1000000) AS BIGINT) AS mass
         |  FROM v${i - 1} v JOIN vtrans t
         |    ON v.variant = t.variant AND v.state = t.from_s
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH base AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS ts_us,
       |    event_id, event_type AS typ, value
       |  FROM events
       |  WHERE event_type IN ('click', 'view', 'signup', 'error', 'purchase')
       |), rn1 AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id) AS rn
       |  FROM base
       |), numbered AS (
       |  SELECT *,
       |    min(CASE WHEN typ = 'purchase' THEN rn END)
       |      OVER (PARTITION BY user_id, day) AS p_rn
       |  FROM rn1
       |), kept AS (
       |  SELECT * FROM numbered WHERE p_rn IS NULL OR rn <= p_rn
       |), marked AS (
       |  SELECT *,
       |    COALESCE(lag(typ) OVER (PARTITION BY user_id, day ORDER BY ts_us, event_id),
       |      'start') AS from_s,
       |    CASE WHEN typ = 'purchase' THEN 'conv' ELSE typ END AS to_s,
       |    max(rn) OVER (PARTITION BY user_id, day) AS max_rn
       |  FROM kept
       |), edges AS (
       |  SELECT from_s, to_s, value, to_s = 'conv' AS is_conv FROM marked
       |  UNION ALL
       |  SELECT typ AS from_s, 'null' AS to_s, 0.0 AS value, false AS is_conv
       |  FROM marked WHERE p_rn IS NULL AND rn = max_rn
       |), trans AS (
       |  SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(count(*)) OVER (PARTITION BY from_s) AS BIGINT) AS out_c
       |  FROM edges GROUP BY 1, 2
       |), tot AS (
       |  SELECT CAST(COALESCE(sum(CAST(floor(value * 1000000.0) AS BIGINT)), 0)
       |    AS BIGINT) AS total_micro
       |  FROM edges WHERE is_conv
       |), variants(variant) AS (
       |  VALUES ('full'), ('click'), ('view'), ('signup'), ('error')
       |), vtrans AS MATERIALIZED (
       |  SELECT va.variant, tr.from_s,
       |    CASE WHEN tr.to_s = va.variant THEN 'null' ELSE tr.to_s END AS to_s,
       |    (tr.c * 1000000) // tr.out_c AS p6
       |  FROM variants va CROSS JOIN trans tr
       |  WHERE tr.from_s <> va.variant
       |  UNION ALL
       |  SELECT va.variant, s.s, s.s, 1000000
       |  FROM variants va CROSS JOIN (VALUES ('conv'), ('null')) s(s)
       |), v0 AS (
       |  SELECT variant, 'start' AS state, CAST(1000000000000 AS BIGINT) AS mass
       |  FROM variants
       |), $steps, conv AS (
       |  SELECT variant,
       |    COALESCE(max(CASE WHEN state = 'conv' THEN mass END), 0) AS conv_mass
       |  FROM v$Steps GROUP BY variant
       |), res AS (
       |  SELECT ch.variant AS touch_type,
       |    f.conv_mass AS full_conv_q12,
       |    ch.conv_mass AS removal_conv_q12,
       |    f.conv_mass - ch.conv_mass AS removal_effect_q12
       |  FROM conv ch
       |  CROSS JOIN (SELECT conv_mass FROM conv WHERE variant = 'full') f
       |  WHERE ch.variant <> 'full'
       |), shared AS (
       |  SELECT *, sum(removal_effect_q12) OVER () AS tot_re FROM res
       |)
       |SELECT touch_type, full_conv_q12, removal_conv_q12, removal_effect_q12,
       |  CASE WHEN tot_re <> 0 THEN
       |    CAST(removal_effect_q12 AS DOUBLE) / CAST(tot_re AS DOUBLE) END AS share,
       |  CASE WHEN tot_re <> 0 THEN
       |    (CAST(total_micro AS DOUBLE) / 1000000.0)
       |      * (CAST(removal_effect_q12 AS DOUBLE) / CAST(tot_re AS DOUBLE)) END
       |    AS attributed_revenue
       |FROM shared CROSS JOIN tot ORDER BY touch_type""".stripMargin
  }
}
