package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-feed between two snapshots of a keyed table — the diff a
  * Delta CDF (`table_changes`) serves, re-expressed over the medallion's
  * versioned parquet silver (pipeline.Medallion writes v=N snapshots; this
  * operator turns any two of them into a change feed downstream
  * incremental jobs can consume).
  *
  * One full-outer join on the key, then codegen'd column comparison:
  *  - key only in `after`              → insert
  *  - key only in `before`             → delete
  *  - key in both, any tracked column differs (null-safe) → update
  *  - identical rows are dropped (no-op changes carry no information).
  *
  * Scale shape: a single hash-partitioned join at key grain (both sides
  * shuffle once; AQE broadcasts a small side). Column comparison never
  * shuffles. Output is bounded by the churn, not the table.
  */
object ChangeFeed {

  /** Diff `before` → `after` on `keys`, tracking `attrs` for updates.
    * Returns key columns + `_change_type` + old/new value per attr. */
  def changes(before: DataFrame, after: DataFrame, keys: Seq[String],
              attrs: Seq[String]): DataFrame = {
    val b = before.select((keys ++ attrs).map(col): _*)
      .withColumn("_in_before", lit(true))
    val a = after.select((keys ++ attrs).map(col): _*)
      .withColumn("_in_after", lit(true))
    val renamedB = attrs.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"${c}_old"))
    val renamedA = attrs.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"${c}_new"))
    val joined = renamedB.join(renamedA, keys, "full_outer")
    val differs: Column = attrs
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    joined
      .withColumn("_change_type",
        when(col("_in_before").isNull, lit("insert"))
          .when(col("_in_after").isNull, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("_change_type").isNotNull)
      .drop("_in_before", "_in_after")
  }
}
