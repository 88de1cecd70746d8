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
}
