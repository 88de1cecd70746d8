package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: collapse an ordered stream of observed
  * attribute states per key into validity intervals — the dimension-history
  * pattern dbt snapshots implement over the reference's dim_users
  * (dbt checks a row's attributes against the stored current version and
  * dates a new version on change).
  *
  * Gaps-and-islands formulation: a `lag` over (key, seq) flags rows whose
  * attributes differ from the previous observation; a running sum of flags
  * numbers the versions; a groupBy (key, version) takes each run's first
  * seq as valid_from; `lead(valid_from)` over the collapsed rows supplies
  * the exclusive valid_to (NULL = current version).
  *
  * Scale shape: every window and the groupBy share the SAME key
  * partitioning, so the whole history builds in ONE exchange + sort of the
  * observation stream; the lead() pass runs over the already-collapsed
  * version rows (≤ one per attribute change). No self-join — the naive
  * from/to formulation joins the change stream to itself per boundary.
  */
object Scd {

  /** Conventional "open interval" end date for the current version. */
  val HighDate = "9999-12-31"

  /** Collapse `observations` (one row per key×seq observation of the
    * attribute columns) into SCD2 intervals. Consecutive observations with
    * equal attribute values merge into one version row with
    * [valid_from, valid_to) bounds on `seqCol`, a 1-based `version`, and
    * `is_current`. `seqCol` must totally order observations within a key. */
  def scd2(observations: DataFrame, key: String, seqCol: String,
           attrs: Seq[String]): DataFrame =
    collapseRuns(observations.select(
      Seq(col(key)) ++ attrs.map(col) ++ Seq(
        col(seqCol).as("valid_from"),
        col(seqCol).as("last_observed"),
        lit(1L).as("observation_count")): _*), key, attrs)

  /** Collapse version "runs" — rows carrying (valid_from, last_observed,
    * observation_count) spans — into SCD2 intervals: adjacent runs with
    * equal attributes merge (count-summed, span-unioned), versions
    * renumber from 1, and valid_to/is_current re-derive. `scd2` is the
    * unit-run special case; `scd2Apply` feeds it stored versions plus new
    * unit observations, which is what makes incremental maintenance give
    * bit-identical results to a from-scratch rebuild. */
  private def collapseRuns(runs: DataFrame, key: String,
                           attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy("valid_from")
    val changed: Column = attrs
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    val versioned = runs
      .withColumn("_chg", when(lag(col("valid_from"), 1).over(w).isNull || changed, 1L).otherwise(0L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val collapsed = versioned
      .groupBy(Seq(col(key), col("version")) ++ attrs.map(col): _*)
      .agg(min(col("valid_from")).as("valid_from"),
        max(col("last_observed")).as("last_observed"),
        sum(col("observation_count")).as("observation_count"))
    val wv = Window.partitionBy(key).orderBy("version")
    // open intervals close at the conventional SCD2 high-date sentinel
    // rather than NULL: downstream between-predicates need no null branch,
    // and the column stays non-nullable
    collapsed
      .withColumn("_next_from", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("_next_from").isNull)
      .withColumn("valid_to", coalesce(col("_next_from"), lit(HighDate).cast("date")))
      .drop("_next_from")
  }

  /** Incremental SCD2 maintenance: apply a batch of NEW observations to an
    * already-built `existing` SCD2 table (the `scd2` output schema) without
    * reprocessing history — the dimension-side analog of the CDC→gold
    * incremental loop. Only keys present in `newObs` are rebuilt, at the
    * grain of their STORED VERSION ROWS plus the new unit observations
    * (≤ versions + new obs rows per key, not the key's full history);
    * untouched keys pass through byte-identical, so at scale this is a
    * key-pruned window over a frame proportional to the delta.
    *
    * Precondition for exact batch parity (asserted by spec, not here):
    * append-only observation — each new observation's seq is STRICTLY
    * GREATER than its key's stored last_observed. An earlier out-of-order
    * seq landing inside a stored version span would need that span split
    * (run-grain merge cannot do it), and an EQUAL seq would tie the new
    * run with the stored one on valid_from, making the collapse's window
    * order — and thus version numbering — partition-dependent. (Equality
    * also violates scd2's own "seqCol totally orders observations within
    * a key" contract.) */
  def scd2Apply(existing: DataFrame, newObs: DataFrame, key: String,
                seqCol: String, attrs: Seq[String]): DataFrame = {
    val touched = newObs.select(col(key)).distinct()
    val untouched = existing.join(touched, Seq(key), "left_anti")
    val storedRuns = existing.join(touched, Seq(key), "left_semi")
      .select(Seq(col(key)) ++ attrs.map(col) ++ Seq(
        col("valid_from"), col("last_observed"), col("observation_count")): _*)
    val newRuns = newObs.select(
      Seq(col(key)) ++ attrs.map(col) ++ Seq(
        col(seqCol).as("valid_from"),
        col(seqCol).as("last_observed"),
        lit(1L).as("observation_count")): _*)
    val rebuilt = collapseRuns(storedRuns.unionByName(newRuns), key, attrs)
    untouched.unionByName(rebuilt.select(untouched.columns.map(col): _*))
  }

  /** Point-in-time join: attach to each event the state version that was
    * current STRICTLY BEFORE the event's time — the feature-store
    * correctness rule ("use only information available before the
    * observation"), and the leakage-free way to read an SCD2 dimension
    * from a fact (ref: dbt snapshot reads in the reference's marts join
    * dim history by validity interval).
    *
    * Same union+window shape as AsOfJoin (one shuffle + one sort on the
    * key, linear, no range-join explosion), but with the sides ordered so
    * a state row AT the event's exact time is NOT visible: events sort
    * before states at equal time, so `last(_, ignoreNulls)` over the
    * preceding frame carries only strictly-earlier state. Events before
    * the first state get NULL priors (left-join semantics).
    *
    * `states` must have one row per (key, stateTime): stateTime orders
    * versions totally within a key (true of scd2's valid_from). */
  def priorStateJoin(events: DataFrame, states: DataFrame, key: String,
                     eventTime: String, stateTime: String,
                     attrs: Seq[String]): DataFrame = {
    val eventCols = events.columns.toSeq
    val e = attrs.foldLeft(
        events.withColumn("_t", col(eventTime)).withColumn("_side", lit(0)))(
      (df, a) => df.withColumn(s"_s_$a",
        lit(null).cast(states.schema(a).dataType)))
    val s = states.select(
      Seq(col(key), col(stateTime).as("_t"), lit(1).as("_side")) ++
        eventCols.filterNot(_ == key).map(c =>
          lit(null).cast(events.schema(c).dataType).as(c)) ++
        attrs.map(a => col(a).as(s"_s_$a")): _*)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    attrs.foldLeft(e.unionByName(s))((df, a) =>
        df.withColumn(s"prior_$a", last(col(s"_s_$a"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 0)
      .drop("_t" +: "_side" +: attrs.map(a => s"_s_$a"): _*)
  }
}
