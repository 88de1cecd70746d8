package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide duplicated-LINE removal (the CCNet line-dedup cut): hash
  * every line of every document, count occurrences across the WHOLE
  * corpus, drop every copy of any line that appears `minDupCount`+ times,
  * and reassemble the surviving lines in original order. Boilerplate
  * headers/footers/nav chrome — the dominant crawl noise — repeat across
  * pages and vanish; genuine prose survives.
  *
  * Complements the existing dedup grains: document-level (q_dedup_*),
  * span-level (ExactSubstr), near-dup (MinHash/SimHash). Ref: the
  * reference cleans at record grain only (dbt staging models); this is
  * the curation-pipeline extension grain.
  *
  * 100 TB shape: one explode (line grain, bounded by corpus text size),
  * one line-keyed groupBy for the duplicate set (map-side partial counts
  * do the heavy lifting — a line repeated a million times arrives at its
  * reducer as a handful of partials), one shuffle anti-join of lines
  * against the much smaller duplicate set, and a doc-keyed reassembly
  * whose per-group state is one document's lines. No driver state, no
  * broadcast of anything data-sized. The join key is the raw line (not a
  * hash), so results are exact; a production run at crawl scale would key
  * the count/anti-join on xxhash64(line) to shrink shuffle bytes at a
  * negligible collision risk — same plan shape.
  */
object LineDedup {

  /** Lines of `textCol` at (doc_id, pos) grain. `split(_, "\n", -1)`
    * keeps trailing empties, matching DuckDB's string_split. */
  private def explodeLines(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))

  /** Anti-join `docs`' lines against the duplicate-line set `dup` and
    * reassemble survivors in order — the shared back half of both the
    * in-query and store-backed paths. */
  private def cleanAgainst(docs: DataFrame, dup: DataFrame,
                           textCol: String): DataFrame = {
    val lines = explodeLines(docs, textCol)
    val kept = lines.join(dup, Seq("line"), "left_anti")
    val reassembled = kept.groupBy("doc_id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")),
        "\n").as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"),
        size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** doc_id, clean_text (kept lines re-joined), n_lines, n_kept,
    * n_removed. Documents whose every line is boilerplate survive as
    * empty-text rows (they must stay visible to downstream accounting —
    * silently dropping them would skew corpus stats). */
  def dedupLines(docs: DataFrame, textCol: String = "text",
                 minDupCount: Int = 2): DataFrame = {
    // the corpus-wide duplicate-line set: always far smaller than the
    // line table (bounded by distinct duplicated lines, not occurrences)
    val dup = explodeLines(docs, textCol).groupBy("line")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minDupCount)
      .select("line")
    cleanAgainst(docs, dup, textCol)
  }

  // ---- incremental line-count store (continuous-crawl ingestion) ----------

  /** Build a line-count store from `docs`: one parquet batch of
    * (line, c) per ingest under `storePath`. Counts are additive, so the
    * store is APPEND-ONLY — the text-dedup analog of the MinHash band
    * store and the MV partial-state store: a new crawl slice appends its
    * own counts without touching existing batches, and readers merge by
    * summation. At 100 TB each append costs one pass over the DELTA, and
    * the merged duplicate set equals a from-scratch build exactly
    * (integer addition is associative — no approximation seam). */
  def buildLineStore(docs: DataFrame, storePath: String,
                     textCol: String = "text"): Unit =
    explodeLines(docs, textCol)
      .groupBy("line").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(storePath)

  /** Append a delta slice's line counts to the store. */
  def appendLineStore(delta: DataFrame, storePath: String,
                      textCol: String = "text"): Unit =
    explodeLines(delta, textCol)
      .groupBy("line").agg(count(lit(1)).as("c"))
      .write.mode("append").parquet(storePath)

  /** IDEMPOTENT keyed append for at-least-once writers (streaming
    * foreachBatch): the batch's counts land in an OVERWRITTEN
    * `batch_<id>` subdirectory, so a replayed micro-batch (crash after
    * the parquet write, before the checkpoint commit) rewrites the same
    * slice instead of double-counting it — double-counting would push
    * once-seen lines over minDupCount and silently strip them from every
    * document. */
  def writeLineBatch(delta: DataFrame, storePath: String, batchId: Long,
                     textCol: String = "text"): Unit =
    explodeLines(delta, textCol)
      .groupBy("line").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")

  /** Corpus-wide merged counts of the store: sum over appended batches
    * (recursive lookup so flat appends and keyed batch subdirectories
    * merge identically). */
  def mergedLineCounts(spark: org.apache.spark.sql.SparkSession,
                       storePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(storePath)
      .groupBy("line").agg(sum("c").as("c"))

  /** [[dedupLines]] against the STORE's merged counts instead of an
    * in-query count — cleaning any slice (or the full corpus) against
    * everything ever ingested. Bit-identical to [[dedupLines]] when the
    * store covers exactly `docs`. */
  def dedupLinesWithStore(docs: DataFrame, storePath: String,
                          textCol: String = "text",
                          minDupCount: Int = 2): DataFrame = {
    val dup = mergedLineCounts(docs.sparkSession, storePath)
      .filter(col("c") >= minDupCount).select("line")
    cleanAgainst(docs, dup, textCol)
  }

  /** Reflow a single-line space-tokenized document into lines of
    * `tokensPerLine` tokens (the synthetic corpus carries no newlines, so
    * the oracle-gated query manufactures a line structure both engines
    * can reproduce; real corpora skip this step). Pure projection. */
  def reflow(docs: DataFrame, textCol: String = "text",
             tokensPerLine: Int = 3): Column = {
    val toks = split(col(textCol), " ", -1)
    val nLines =
      floor((size(toks) + (tokensPerLine - 1)) / tokensPerLine).cast("int")
    array_join(
      transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(toks, i * tokensPerLine + 1, lit(tokensPerLine)), " ")),
      "\n")
  }

  /** The full oracle-gated pipeline: reflow + corpus-wide line dedup. */
  def dedupReflowed(docs: DataFrame, tokensPerLine: Int = 3,
                    minDupCount: Int = 2): DataFrame =
    dedupLines(
      docs.select(col("doc_id"),
        reflow(docs, "text", tokensPerLine).as("text")),
      minDupCount = minDupCount)

  /** DuckDB mirror of [[dedupReflowed]], generated from the same
    * constants so the two sides cannot drift. */
  def oracleSql(tokensPerLine: Int = 3, minDupCount: Int = 2): String = {
    val w = tokensPerLine
    s"""WITH rf AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), x AS (
       |  SELECT doc_id, toks,
       |    unnest(range(0, (len(toks) + ${w - 1}) // $w)) AS pos
       |  FROM rf
       |), lines AS (
       |  SELECT doc_id, pos,
       |    array_to_string(list_slice(toks, pos * $w + 1, pos * $w + $w), ' ') AS line
       |  FROM x
       |), dup AS (
       |  SELECT line FROM lines GROUP BY 1 HAVING count(*) >= $minDupCount
       |), kept AS (
       |  SELECT l.doc_id, l.pos, l.line FROM lines l ANTI JOIN dup d USING (line)
       |), re AS (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
       |    count(*) AS n_kept
       |  FROM kept GROUP BY 1
       |), base AS (
       |  SELECT doc_id,
       |    CAST((len(string_split(text, ' ')) + ${w - 1}) // $w AS BIGINT) AS n_lines
       |  FROM documents
       |)
       |SELECT b.doc_id, coalesce(re.clean_text, '') AS clean_text, b.n_lines,
       |  CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(b.n_lines - coalesce(re.n_kept, 0) AS BIGINT) AS n_removed
       |FROM base b LEFT JOIN re USING (doc_id) ORDER BY b.doc_id""".stripMargin
  }
}
