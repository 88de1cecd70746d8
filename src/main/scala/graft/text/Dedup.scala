package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact + normalized deduplication over the documents table — the first
  * stage of any LLM training-data pipeline. Both are hash-groupBys: one
  * shuffle on the content hash (a 32-char key, not the document body — at
  * 100 TB the shuffle moves hashes and ids, never the text).
  */
object Dedup {

  /** Canonical whitespace/case normalization. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Group identical content; keep the lowest doc_id as canonical. */
  def exactDups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(
        min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("doc_count"))
      .withColumn("dup_count", col("doc_count") - 1)

  /** Same, over normalized text (catches case/whitespace variants). */
  def normalizedDups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(normalizeText(col("text"))).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(
        min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("doc_count"))
      .withColumn("dup_count", col("doc_count") - 1)

  /** Kept-set after exact dedup: one row per distinct content. */
  def dedupedDocs(documents: DataFrame): DataFrame = {
    val keep = exactDups(documents).select(col("canonical_doc_id").as("doc_id"))
    documents.join(keep, "doc_id")
  }

  /** Content fingerprint robust to word order: hash of the sorted distinct
    * vocabulary (a bag-of-words rolling fingerprint). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(col("text"), " ").as("words"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(array_join(array_sort(array_distinct(col("words"))), " ")).as("vocab_fingerprint"),
        size(array_distinct(col("words"))).cast("long").as("distinct_tokens"),
        size(col("words")).cast("long").as("total_tokens"))
}
