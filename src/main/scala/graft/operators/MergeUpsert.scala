package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-style MERGE upsert semantics without Delta (no delta jars in this
  * environment): source rows win on key collision, target rows survive
  * otherwise — the idempotent re-processing primitive the reference relies
  * on for silver-layer writes.
  * Ref: /root/reference/spark_jobs/utils/delta_utils.py (upsert_delta).
  *
  * Plan shape: one shuffle on the key (anti-join target∖source) + union.
  * At 100 TB the anti-join benefits from pre-bucketed storage on the
  * merge key; with partition-aligned inputs Catalyst elides the exchange.
  */
object MergeUpsert {

  /** `source` upserted into `target` on `keys`; `_merge_action` marks
    * what happened to each surviving row. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val matchedKeys = source.select(keys.map(col): _*).distinct()
    val kept = target.join(matchedKeys, keys, "left_anti")
      .withColumn("_merge_action", lit("kept"))
    val updatedKeys = target.select(keys.map(col): _*).distinct()
    val fromSource = source.join(updatedKeys, keys, "left_semi")
      .withColumn("_merge_action", lit("updated"))
    val inserted = source.join(updatedKeys, keys, "left_anti")
      .withColumn("_merge_action", lit("inserted"))
    kept.unionByName(fromSource).unionByName(inserted)
  }
}
