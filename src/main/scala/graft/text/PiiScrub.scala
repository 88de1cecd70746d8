package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Free-text PII scrubbing for the curation pipeline: emails, phone-like
  * digit runs, and IPv4 literals replaced with typed placeholder tokens,
  * with per-document match counts for audit. The column-level masking
  * twin is operators.Masking (the reference hashes/masks ATTRIBUTES;
  * training-data curation must also scrub PII embedded INSIDE text).
  *
  * All regex work is codegen'd `regexp_replace`/`regexp_count` column
  * logic — linear, no UDFs, no shuffles. Patterns stay in the
  * RE2-compatible subset so the same strings run in DuckDB (oracle) and
  * Spark (Java regex) identically.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Scrubbed text + per-kind counts, one pass of column expressions. */
  def scrub(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), col("lang"), col("source"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>").as("scrubbed"),
      regexp_count(col("text"), lit(EmailRe)).as("emails_found"),
      regexp_count(col("text"), lit(PhoneRe)).as("phones_found"),
      regexp_count(col("text"), lit(Ipv4Re)).as("ips_found"))
}
