package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate spans — the ExactSubstr side of the dedup
  * family (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"), complementing doc-level MinHash/SimHash near-dup:
  * every maximal token span that appears verbatim in at least `minDocs`
  * distinct documents is reported per document WITH token offsets, so a
  * downstream cut can splice out the span instead of dropping the whole
  * document (boilerplate headers, licenses, quoted passages).
  *
  * Method: a cross-doc duplicated span of length ≥ l contains a
  * duplicated l-gram at every offset, and every cross-doc duplicated
  * l-gram is itself such a span — so the union of duplicated-l-gram
  * windows EQUALS the union of duplicated spans. Find the duplicated
  * l-grams, then merge overlapping windows per document
  * (gaps-and-islands over hit positions).
  *
  * Scale shape: the paper's suffix array is a single-machine
  * construction; this is the partition-friendly equivalent. One explode
  * to (doc, pos, gram_hash) — token-grain, the unigram-LM shuffle shape,
  * never a doc self-join. Duplicated hashes come from one partial-agged
  * (hash)-grain groupBy; only that (typically tiny) duplicated sliver
  * joins back onto the gram stream. The span merge is a per-doc window
  * over HIT positions only — bounded by doc length, usually far below
  * it. 64-bit xxhash64 over the gram string stands in for gram equality
  * (collision odds ~grams²/2⁶⁴); past ~10⁹ grams, `exactConfirm = true`
  * re-derives the gram STRINGS for the hash-gated sliver only and
  * re-checks the ≥minDocs sharing on true string equality — the same
  * sketch-gate→exact-confirm split as the CMS decontaminate path
  * (Curation.decontaminateSketch), with the hash gate doing the pruning
  * and the exact join doing the deciding.
  *
  * Short-doc convention matches Curation: a document shorter than l
  * contributes its single truncated gram, so two identical short docs
  * still pair; their reported span_end is clipped by doc length
  * downstream consumers' slicing anyway.
  */
object ExactSubstr {

  /** Maximal cross-doc duplicated token spans of `documents`.
    * Output grain: (doc_id, span) with 0-based token offsets
    * [span_start, span_end), the number of duplicated l-grams merged
    * into the span, and the widest cross-doc sharing any of them has.
    *
    * `exactConfirm = true` adds the collision-safety re-join: the grams
    * surviving the hash gate (typically a tiny sliver of the stream)
    * re-derive their STRINGS by a (doc_id)-keyed join back to the corpus
    * and must pass countDistinct(doc_id) ≥ minDocs on true string
    * equality; docs_sharing then reports the exact count. On a
    * collision-free corpus the output is bit-identical to the hash-only
    * path (CurationSpec proves both the parity and a forced-collision
    * case only confirm catches). */
  def duplicateSpans(documents: DataFrame, l: Int = 8, minDocs: Int = 2,
                     exactConfirm: Boolean = false): DataFrame =
    duplicateSpansHashed(documents, l, minDocs, exactConfirm,
      g => s"xxhash64($g)")

  /** Impl with a pluggable gram-hash SQL fragment: production always uses
    * xxhash64 (above); the spec injects a deliberately narrow hash to
    * force collisions and prove the confirm path catches them. */
  private[graft] def duplicateSpansHashed(documents: DataFrame, l: Int,
      minDocs: Int, exactConfirm: Boolean,
      hashSql: String => String): DataFrame = {
    val gramSql = s"concat_ws(' ', slice(split(text, ' '), j, $l))"
    val grams = documents
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, greatest(size(split(text, ' ')) - ${l - 1}, 1)), " +
        s"j -> ${hashSql(gramSql)})")))
      .select(col("doc_id"), col("pos"), col("col").as("h"))

    val dupHashes = grams
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("docs_sharing"))
      .filter(col("docs_sharing") >= minDocs)

    val hashHits = grams.join(dupHashes, Seq("h"))

    val hits =
      if (!exactConfirm) hashHits
      else {
        // re-derive gram strings for the gated sliver ONLY (hits ≪ grams:
        // the hash gate did the pruning), re-tokenizing via a doc_id-keyed
        // join — never carrying strings through the full gram explode
        val withGram = hashHits
          .join(documents.select(col("doc_id"),
            split(col("text"), " ").as("toks")), Seq("doc_id"))
          .withColumn("gram",
            concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(l))))
          .select("doc_id", "pos", "gram")
        val confirmed = withGram
          .groupBy("gram")
          .agg(countDistinct(col("doc_id")).as("docs_sharing"))
          .filter(col("docs_sharing") >= minDocs)
        withGram.join(confirmed, Seq("gram")).drop("gram")
      }

    // gaps-and-islands: consecutive hit positions extend one span
    val w = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("island", sum("brk").over(w))
      .groupBy("doc_id", "island")
      .agg(
        min("pos").cast("long").as("span_start"),
        (max("pos") + l).cast("long").as("span_end"),
        count(lit(1)).as("n_dup_grams"),
        max("docs_sharing").as("max_docs_sharing"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .select("doc_id", "span_start", "span_end", "span_tokens",
        "n_dup_grams", "max_docs_sharing")
  }

  /** Apply the spans: splice every duplicated passage OUT of every
    * document that carries one (the paper's cut-all-occurrences policy —
    * Lee et al. 2022 §4 report it loses nothing measurable vs
    * keep-one-copy, and it needs no cross-doc canonical election), and
    * return the cleaned corpus with an audit trail. Clean documents pass
    * through byte-identical.
    *
    * Scale shape: [[duplicateSpans]] is the heavy part; the splice itself
    * is a LEFT join of the corpus onto the per-doc span list (spans ≪
    * docs) followed by a per-row codegen'd HOF filter — no extra shuffle
    * beyond the span aggregation already done.
    */
  def spliceSpans(documents: DataFrame, l: Int = 8,
                  minDocs: Int = 2, exactConfirm: Boolean = false): DataFrame = {
    val spans = duplicateSpans(documents, l, minDocs, exactConfirm)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("cuts"),
        count(lit(1)).as("spans_cut"))
    documents.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("cuts", expr(
        "coalesce(cuts, cast(array() as array<struct<span_start:bigint,span_end:bigint>>))"))
      .withColumn("kept", expr(
        "filter(toks, (x, j) -> NOT exists(cuts, c -> j >= c.span_start AND j < c.span_end))"))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("toks")).cast("long").as("orig_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("removed_tokens"),
        coalesce(col("spans_cut"), lit(0L)).as("spans_cut"))
  }
}
