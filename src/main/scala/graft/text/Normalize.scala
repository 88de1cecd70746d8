package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Zero-width / invisible codepoints spammers hide inside duplicated
    * text so byte-level dedup misses it: ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP,
    * soft hyphen, word joiner. */
  val ZeroWidthClass = "[\u200B\u200C\u200D\uFEFF\u00AD\u2060]"

  /** Curated confusable→ASCII fold (a subset of the public Unicode
    * confusables data: the Cyrillic/Greek letters that are pixel-
    * identical to Latin in most fonts — the working set of real dedup
    * evasion). 1:1 codepoint map, so it runs as translate() in both
    * engines. */
  val ConfusablesFrom =
    "\u0430\u0435\u043E\u0440\u0441\u0445\u0443\u0456" + // cyr a e o p c x y i
    "\u0410\u0412\u0415\u041A\u041C\u041D\u041E\u0420\u0421\u0422\u0425" + // cyr caps
    "\u03BF\u03BD" + // greek o v
    "\u0391\u0392\u0395\u0396\u0397\u0399\u039A\u039C\u039D\u039F\u03A1\u03A4\u03A5\u03A7" // greek caps
  val ConfusablesTo = "aeopcxyi" + "ABEKMHOPCTX" + "ov" + "ABEZHIKMNOPTYX"

  /** The evasion-resistant dedup key: NFC → strip zero-widths → fold
    * confusables to ASCII → casefold → collapse whitespace → trim.
    * Spam/SEO duplicates dodge byte-level dedup with homoglyphs and
    * invisible characters; hashing THIS instead of the raw text closes
    * that hole. Pure codegen chain — no UDF, no shuffle. */
  def dedupKey(c: Column): Column =
    trim(regexp_replace(
      lower(translate(
        regexp_replace(call_function("nfc_normalize", c), ZeroWidthClass, ""),
        ConfusablesFrom, ConfusablesTo)),
      " +", " "))

  /** Exact dedup on the evasion-resistant key: the q_dedup_exact contract
    * on folded text, plus per-group accounting of how many RAW byte
    * variants collapsed into each folded group (n_raw_variants > 1 =
    * evasion or encoding drift caught that byte-level dedup missed). */
  def evasionDups(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"), md5(col("text")).as("raw_hash"),
        md5(dedupKey(col("text"))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("doc_count"),
        countDistinct(col("raw_hash")).as("n_raw_variants"))
      .withColumn("evasion_caught", col("n_raw_variants") > 1)
  }

  /** DuckDB mirror of [[evasionDups]] — same fold chain on DuckDB's own
    * nfc_normalize/translate/regexp_replace. */
  def evasionDupsOracleSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, md5(text) AS raw_hash,
       |    md5(trim(regexp_replace(
       |      lower(translate(
       |        regexp_replace(nfc_normalize(text), '$ZeroWidthClass', '', 'g'),
       |        '$ConfusablesFrom', '$ConfusablesTo')),
       |      ' +', ' ', 'g'))) AS content_hash
       |  FROM documents
       |)
       |SELECT content_hash, min(doc_id) AS canonical_doc_id,
       |  count(*) AS doc_count,
       |  count(DISTINCT raw_hash) AS n_raw_variants,
       |  count(DISTINCT raw_hash) > 1 AS evasion_caught
       |FROM k GROUP BY 1 ORDER BY content_hash""".stripMargin

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
