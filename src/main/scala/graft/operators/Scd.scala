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
           attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seqCol)
    val changed: Column = attrs
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    val versioned = observations
      .withColumn("_chg", when(lag(col(seqCol), 1).over(w).isNull || changed, 1L).otherwise(0L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val collapsed = versioned
      .groupBy(Seq(col(key), col("version")) ++ attrs.map(col): _*)
      .agg(min(col(seqCol)).as("valid_from"),
        max(col(seqCol)).as("last_observed"),
        count(lit(1)).as("observation_count"))
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
