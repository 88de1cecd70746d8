package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canonical text normalization — the transform every corpus pipeline
  * runs BEFORE any hash-grain operator (exact dedup, line dedup, shingle
  * hashing, tokenizer training), because visually-identical strings must
  * byte-agree to share a hash bucket: Unicode NFC (the new
  * `nfc_normalize` codegen expression), C0/DEL control-character strip
  * (tab/newline/CR kept — they are document structure), multi-space
  * collapse, and edge trim. Map-only, zero shuffle, whole-stage codegen
  * end to end; every audit column is an exact integer or a string
  * equality, so the frame is hash-exact against the oracle's own
  * nfc_normalize.
  */
object Normalize {

  /** C0 controls minus \t \n \r, plus DEL — mojibake and terminal noise,
    * never content. */
  val CtrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  def normalizeDocs(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .withColumn("clean_text",
        trim(regexp_replace(
          regexp_replace(expr("nfc_normalize(text)"), CtrlClass, ""),
          " +", " ")))
      .select(col("doc_id"), col("lang"), col("source"),
        col("clean_text"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("clean_text")).cast("long").as("n_chars_clean"),
        (col("clean_text") =!= col("text")).as("changed"))
  }

  /** DuckDB mirror — same regex classes, DuckDB's own nfc_normalize. */
  def normalizeOracleSql: String =
    s"""WITH n AS (
       |  SELECT doc_id, lang, source, text,
       |    trim(regexp_replace(
       |      regexp_replace(nfc_normalize(text), '$CtrlClass', '', 'g'),
       |      ' +', ' ', 'g')) AS clean_text
       |  FROM documents
       |)
       |SELECT doc_id, lang, source, clean_text,
       |  CAST(length(text) AS BIGINT) AS n_chars_raw,
       |  CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
       |  clean_text <> text AS changed
       |FROM n ORDER BY doc_id""".stripMargin
}
