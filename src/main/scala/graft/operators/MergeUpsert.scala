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

  /** MERGE with schema evolution — the Delta `autoMerge` behavior the
    * reference turns on for every silver write (ref:
    * /root/reference/spark_jobs/utils/delta_utils.py upsert_delta with
    * whenMatchedUpdateAll/whenNotMatchedInsertAll): the merged schema is
    * the UNION of target and source columns (target order, new source
    * columns appended), and
    *  - matched rows take source values for source columns but KEEP their
    *    target values for columns the source stopped carrying (updateAll
    *    only sets the source's columns);
    *  - unmatched target rows get null for newly-added source columns;
    *  - inserted source rows get null for target-only columns.
    * Shared columns must keep their type — a silent cast on 100 TB of
    * history is a data bug, so a mismatch throws instead.
    *
    * Plan shape: same single key shuffle as `merge`; the matched branch
    * becomes an inner join (it must pull target-only column values) only
    * when the target actually has columns the source lacks. */
  def mergeEvolve(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val sTypes = source.schema.map(f => f.name -> f.dataType).toMap
    val mismatched = (tTypes.keySet & sTypes.keySet).filter(c => tTypes(c) != sTypes(c))
    require(mismatched.isEmpty,
      s"schema evolution cannot change column types: ${mismatched.toSeq.sorted
        .map(c => s"$c: ${tTypes(c)} -> ${sTypes(c)}").mkString(", ")}")

    val targetOnly = target.columns.filterNot(sTypes.contains).toSeq
    val sourceOnly = source.columns.filterNot(tTypes.contains).toSeq
    if (targetOnly.isEmpty && sourceOnly.isEmpty) return merge(target, source, keys)
    require(keys.forall(k => tTypes.contains(k) && sTypes.contains(k)),
      s"merge keys $keys must exist on both sides")

    val kept = target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .withColumns(sourceOnly.map(c => c -> lit(null).cast(sTypes(c))).toMap)
      .withColumn("_merge_action", lit("kept"))
    // matched: source columns win, target-only columns survive the update
    val updated = source.join(
        target.select((keys ++ targetOnly).map(col): _*), keys, "inner")
      .withColumn("_merge_action", lit("updated"))
    val inserted = source.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .withColumns(targetOnly.map(c => c -> lit(null).cast(tTypes(c))).toMap)
      .withColumn("_merge_action", lit("inserted"))

    val outCols = (target.columns ++ sourceOnly) :+ "_merge_action"
    kept.select(outCols.map(col): _*)
      .unionByName(updated.select(outCols.map(col): _*))
      .unionByName(inserted.select(outCols.map(col): _*))
  }
}
