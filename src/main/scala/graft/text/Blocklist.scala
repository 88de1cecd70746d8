package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist / taxonomy tagging over the document corpus — the standard
  * curation step that screens every document against a phrase list (NSFW
  * blocklists, spam templates, policy phrases, topic seed lexicons).
  *
  * The engine-level point is the `multi_match` Aho–Corasick expression
  * ([[graft.functions.MultiMatch]]): P phrases cost ONE pass over the
  * text instead of P `contains` scans, and the whole tagger is a map-only
  * projection (zero shuffle at doc grain; the summary is one tag-grain
  * partial-agged exchange over ≤ |tags| × partitions rows). The oracle
  * mirrors the semantics with DuckDB's `list_filter(contains)` — the hash
  * match certifies the automaton against the naive P-scan definition,
  * including the suffix/overlap cases ("scan" inside "slow scan").
  */
object Blocklist {

  /** Default tag list for the registered queries: drawn from the synthetic
    * corpus vocabulary so most tags hit; includes pattern-inside-pattern
    * pairs ("scan"/"slow scan", "join"/"hash join") that exercise the
    * automaton's dict links under the hash gate, a two-word phrase that
    * only matches when the exact byte sequence occurs, and one tag that
    * never occurs (drops out of the summary on both engines). */
  val DefaultTags: Seq[String] = Seq(
    "spark", "merge", "scan", "slow scan", "join", "hash join",
    "value table", "stream", "window", "fraud alert")

  private def quoted(tags: Seq[String]): Seq[String] = {
    require(tags.nonEmpty && tags.forall(t => t.nonEmpty && !t.contains("'")),
      "tags must be non-empty and quote-free")
    tags.map(t => s"'$t'")
  }

  private def sparkArrayLit(tags: Seq[String]): String =
    quoted(tags).mkString("array(", ", ", ")")

  /** DuckDB list literal for the oracle builders. */
  def sqlListLit(tags: Seq[String]): String = quoted(tags).mkString("[", ", ", "]")

  /** Doc-grain tagging: every document with the distinct tags it carries
    * (declaration order), as a count + CSV. Map-only, one text pass. */
  def tagDocs(documents: DataFrame, tags: Seq[String] = DefaultTags): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .withColumn("tags", expr(s"multi_match(text, ${sparkArrayLit(tags)})"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("tags")).cast("long").as("n_tags"),
        array_join(col("tags"), ",").as("tags_csv"))
  }

  def tagDocsOracleSql(tags: Seq[String] = DefaultTags): String = {
    val lst = sqlListLit(tags)
    s"""SELECT doc_id, lang, source,
       |  len(list_filter($lst, t -> contains(text, t))) AS n_tags,
       |  coalesce(array_to_string(list_filter($lst, t -> contains(text, t)), ','), '') AS tags_csv
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Tag-grain rollup: documents and distinct sources carrying each tag
    * (never-matching tags drop out). One partial-agged exchange whose
    * input is ≤ |tags| rows per document. */
  def tagSummary(documents: DataFrame, tags: Seq[String] = DefaultTags): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("source"),
        explode(expr(s"multi_match(text, ${sparkArrayLit(tags)})")).as("tag"))
      .groupBy("tag")
      .agg(count(lit(1)).as("doc_count"),
        countDistinct(col("source")).as("src_count"))
  }

  def tagSummaryOracleSql(tags: Seq[String] = DefaultTags): String =
    s"""SELECT t.tag, count(*) AS doc_count, count(DISTINCT source) AS src_count
       |FROM documents
       |CROSS JOIN (SELECT unnest(${sqlListLit(tags)}) AS tag) AS t
       |WHERE contains(text, t.tag)
       |GROUP BY t.tag ORDER BY t.tag""".stripMargin

  /** Doc-grain redaction on the `multi_redact` / `multi_match_count`
    * expressions: every leftmost-longest non-overlapping blocklist
    * occurrence masked, with the occurrence count alongside — still one
    * text pass total per expression, map-only. */
  def redactDocs(documents: DataFrame, tags: Seq[String] = DefaultTags): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val arr = sparkArrayLit(tags)
    documents.select(col("doc_id"),
      expr(s"multi_match_count(text, $arr)").as("n_redactions"),
      expr(s"multi_redact(text, $arr, '[MASK]')").as("redacted"))
  }

  /** Oracle: a global regex replace over the longest-first alternation is
    * semantically identical to the automaton's leftmost-longest sweep for
    * literal patterns. */
  def redactOracleSql(tags: Seq[String] = DefaultTags): String = {
    require(tags.forall(_.matches("[A-Za-z0-9 ]+")),
      "oracle alternation requires regex-meta-free tags")
    val alt = tags.sortBy(t => (-t.length, t)).mkString("|")
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$alt')) AS BIGINT) AS n_redactions,
       |  regexp_replace(text, '$alt', '[MASK]', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
