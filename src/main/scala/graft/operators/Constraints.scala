package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta CHECK-constraint enforcement for parquet-layer writes — the
  * write-side contract the reference gets from Delta table constraints
  * (and approximates with Great Expectations checkpoints,
  * data_quality/validate.py): a batch that violates a declared invariant
  * must FAIL the write, not land bad rows for downstream jobs to find.
  *
  * SQL CHECK semantics: a row violates only when the predicate evaluates
  * to FALSE — NULL (unknown) passes, exactly as Delta/ANSI define it.
  *
  * Scale shape: ALL constraints validate in ONE partial-aggregated pass
  * over the batch (a sum(violations) per check — no per-check scans, no
  * row collection); the error message carries per-constraint violation
  * counts so the producer knows what broke without re-running anything.
  */
object Constraints {

  final class CheckViolation(msg: String) extends IllegalStateException(msg)

  /** Validate `checks` (name → predicate) over `df` in one pass; returns
    * the PERSISTED frame when clean (the caller must write that exact
    * frame, then unpersist), throws CheckViolation with per-check counts
    * otherwise.
    *
    * The persist is what makes the CHECK a guarantee rather than a
    * heuristic: validate and write are separate actions, so a
    * non-deterministic source (sample, rand, a shuffling UDF) could pass
    * validation yet recompute different — violating — rows for the write.
    * Pinning the batch makes both actions read the same rows. */
  def enforce(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    if (checks.isEmpty) return df
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try validate(pinned, checks)
    catch {
      case e: CheckViolation =>
        pinned.unpersist(blocking = false); throw e
    }
    pinned
  }

  /** Validation WITHOUT the persist: one fused aggregation pass, throws
    * CheckViolation on any failing check. For validate-only callers (a DQ
    * gate over an already-materialized table) — there is no second action
    * to keep consistent with, so pinning the input would be a table-sized
    * cache for zero benefit. Write paths must use `enforce`. */
  def validate(df: DataFrame, checks: Seq[(String, Column)]): Unit = {
    if (checks.isEmpty) return
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(true)), 0L).otherwise(1L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bad = checks.zipWithIndex.flatMap { case ((name, _), i) =>
      val n = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (n > 0L) Some(s"$name ($n rows)") else None
    }
    if (bad.nonEmpty)
      throw new CheckViolation(
        s"CHECK constraint violation(s): ${bad.mkString(", ")}")
  }
}
