package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-order Markov transition model over per-user event sequences:
  * the global event_type → event_type transition matrix with empirical
  * probabilities, plus a per-transition surprisal. The behavioral-
  * baseline counterpart of [[Behavior]]'s fixed funnel: the funnel
  * checks ONE prescribed path; the transition matrix learns what paths
  * the population actually takes, and its low-probability cells are
  * the "weird navigation" fraud signal (bot scripts hit purchase
  * without view; account takeover skips signup flows).
  *
  * Scale shape: one (user_id)-keyed exchange for the lag window (the
  * same exchange every sessionizer here rides), then a partial-agged
  * groupBy onto a |event_types|² ≤ tens-of-rows frame — every
  * subsequent window/division runs on that constant-size frame (the
  * ScalableRank-offsets "bounded by construction" contract). Scan
  * bound at any scale.
  *
  * Cross-engine exactness: counts are BIGINTs; probability is one IEEE
  * division; surprisal quantizes −ln(p) through the UnigramLm
  * float32-round contract.
  */
object Markov {

  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val seq = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)

    val cells = seq.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("cnt"))
    // Row totals via a window over the ≤|types|² cell frame — bounded by
    // construction, not by data.
    val rowW = Window.partitionBy("prev_type")
    cells
      .withColumn("row_total", sum(col("cnt")).over(rowW))
      .withColumn("prob",
        col("cnt").cast("double") / col("row_total").cast("double"))
      .withColumn("surprisal_micro",
        floor(expr("CAST(CAST(-ln(CAST(cnt AS DOUBLE) / CAST(row_total AS DOUBLE)) AS FLOAT) AS DOUBLE)" +
          " * CAST(1000000.0 AS DOUBLE)").cast("double")).cast("long"))
      .select("prev_type", "event_type", "cnt", "row_total", "prob",
        "surprisal_micro")
      .orderBy("prev_type", "event_type")
  }

  /** Session path mining: the top-k most common complete event-type
    * journeys per gap-session ("view>click>purchase") — the sequence
    * view the transition matrix marginalizes away. Paths assemble
    * ROW-GROUP-LOCALLY: collect_list per (user, session) sorted by the
    * (ts, event_id) struct order — bounded by one user's single-session
    * activity, never a corpus-wide ordering; global frequencies are a
    * partial-agged groupBy at path grain, and the cut is
    * TakeOrderedAndProject (two-phase top-k). */
  def sessionPaths(events: DataFrame,
                   gapUs: Long = graft.operators.Sessionize.DefaultGapUs,
                   topK: Int = 20): DataFrame = {
    val sess = graft.operators.Sessionize.assignSessions(events, gapUs)
    val paths = sess
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("path_len"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(ts_us, event_id, event_type)))," +
            " x -> x.event_type)"), ">").as("path"))
    paths
      .groupBy("path", "path_len")
      .agg(count(lit(1)).as("sessions"))
      .orderBy(col("sessions").desc, col("path"))
      .limit(topK)
  }

  /** Frequent contiguous 3-step behavior patterns within gap-sessions
    * (the sequential-pattern-mining cut between q_event_transitions'
    * bigrams and q_session_paths' whole journeys — the PrefixSpan
    * support semantics restricted to contiguous length-3 subsequences,
    * which keeps it exactly SQL-expressible): every "a>b>c" window,
    * its total occurrence count, the number of DISTINCT sessions
    * containing it (pattern support in the PrefixSpan sense), and the
    * support fraction over trigram-capable (≥3 event) sessions.
    *
    * Scale shape: trigram generation is ROW-LOCAL — each session's
    * ordered type array (bounded by one user's single-session activity,
    * the sessionPaths contract) zipped with its shifted selves; support
    * counts are partial-agged shuffles at pattern grain;
    * total_sessions is a 1-row broadcast; support is one IEEE division
    * of exact BIGINTs.
    */
  def sessionTrigrams(events: DataFrame,
                      gapUs: Long = graft.operators.Sessionize.DefaultGapUs,
                      minSessions: Long = 2): DataFrame = {
    val sess = graft.operators.Sessionize.assignSessions(events, gapUs)
    val seqs = sess
      .groupBy(col("user_id"), col("session_idx"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(ts_us, event_id, event_type)))," +
          " x -> x.event_type)").as("seq"))
      .filter(size(col("seq")) >= 3)
    val tris = seqs.withColumn("tris", expr(
      "zip_with(zip_with(slice(seq, 1, size(seq) - 2), slice(seq, 2, size(seq) - 2)," +
        " (a, b) -> concat(a, '>', b)), slice(seq, 3, size(seq) - 2)," +
        " (ab, c) -> concat(ab, '>', c))"))
    val occ = tris.select(explode(col("tris")).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("occurrences"))
    val inSessions = tris
      .select(explode(array_distinct(col("tris"))).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("sessions"))
      .filter(col("sessions") >= minSessions)
    val total = seqs.agg(count(lit(1)).as("total_sessions"))
    occ.join(inSessions, Seq("pattern"))
      .crossJoin(broadcast(total))
      .withColumn("support",
        col("sessions").cast("double") / col("total_sessions").cast("double"))
      .select("pattern", "occurrences", "sessions", "total_sessions", "support")
  }
}
