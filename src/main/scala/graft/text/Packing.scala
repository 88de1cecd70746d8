package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay a curated corpus end-to-end into fixed-capacity
  * training sequences ("concat-and-chunk"), the standard step between a
  * document corpus and an LLM dataloader. Documents are concatenated in a
  * deterministic order within a packing shard and split at exact token
  * boundaries; a document crossing a boundary appears in every sequence it
  * spans, with its per-sequence slice recorded (offset into the doc,
  * position in the sequence, token count) so the dataloader can rebuild
  * attention-mask segment ids.
  *
  * All arithmetic is integer (token cumsums, floor-div) — cross-engine
  * exact.
  *
  * Scale shape — a distributed prefix sum, NOT a per-language window. A
  * per-`lang` running total would sort each language's entire corpus in a
  * single task (the classic cumulative-sum scale-killer). Instead the
  * cumsum runs in two bounded phases, like a parallel scan:
  *
  *   1. local: running token total within a (lang, bucket) shard, where
  *      bucket = doc_id div docsPerBucket. Bucket is monotone in doc_id, so
  *      concatenating buckets in bucket order IS the per-lang doc_id order;
  *      each shard sorts at most docsPerBucket rows.
  *   2. carry: one row per (lang, bucket) — the bucket token totals — gets
  *      a per-lang exclusive prefix sum. The carry frame has
  *      corpus/docsPerBucket rows, so its per-lang window is bounded.
  *
  * tok_end = local running total + the bucket's carry offset, bit-identical
  * to the single-window formulation for every docsPerBucket (asserted in
  * CurationSpec). The explode amplifies rows only by sequences-spanned
  * (>= 1, ~1 on average), never by corpus size.
  *
  * Two deliberate plan choices:
  *  - documents are scanned/tokenized ONCE: the carry totals are derived
  *    from the locally-scanned frame (max local_end per shard), so both
  *    branches share the same (lang, bucket) exchange and Spark's
  *    ReuseExchange serves the second branch from the first's shuffle
  *    output (asserted in CurationSpec);
  *  - the carry join carries NO broadcast hint. Carry cardinality is
  *    corpus_docs / docsPerBucket — linear in corpus size (~1.5M rows at
  *    1e11 docs with the default 65536, but a smaller docsPerBucket or a
  *    bigger corpus grows it without bound), so a forced broadcast is a
  *    latent driver/executor OOM. The probe side is already partitioned on
  *    (lang, bucket) from the local window, so the shuffled join only
  *    moves the tiny carry side; AQE is free to choose broadcast when the
  *    carry frame really is small.
  */
object Packing {

  def packSequences(documents: DataFrame, capacity: Int = 128,
                    docsPerBucket: Long = 65536L): DataFrame = {
    require(capacity > 0)
    require(docsPerBucket > 0)

    // The explicit not-null filter on the (lang, bucket) shard key mirrors
    // what the optimizer would infer for the carry join's probe side only —
    // stating it here keeps BOTH join branches' scan subtrees canonically
    // identical, which is what lets ReuseExchange serve the carry branch
    // from the probe branch's shuffle (inner join semantics are unchanged:
    // null-keyed rows never survive the join).
    val base = documents
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div $docsPerBucket"))
      .filter(col("lang").isNotNull && col("bucket").isNotNull)

    // Phase 1: bounded local scan within each (lang, bucket) shard.
    val wLocal = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val local = base.withColumn("local_end", sum(col("n_tokens")).over(wLocal))

    // Phase 2: exclusive prefix over the bucket-grain totals. Derived from
    // `local` (a shard's last running total IS its token sum) so the
    // (lang, bucket) exchange is shared with phase 1 and the corpus is
    // tokenized once; the grouped max itself is exchange-free on the
    // window's partitioning.
    val wCarry = Window.partitionBy("lang").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = local.groupBy("lang", "bucket")
      .agg(max(col("local_end")).as("bucket_tokens"))
      .withColumn("carry", coalesce(sum(col("bucket_tokens")).over(wCarry), lit(0L)))
      .select("lang", "bucket", "carry")

    local
      .join(carries, Seq("lang", "bucket"))
      .withColumn("tok_end", col("local_end") + col("carry"))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("first_seq", expr(s"tok_start div $capacity"))
      .withColumn("last_seq", expr(s"(tok_end - 1) div $capacity"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("tok_start"), col("tok_end"),
        explode(expr("sequence(first_seq, last_seq)")).as("seq_idx"))
      .withColumn("_seq_lo", col("seq_idx") * capacity)
      .withColumn("_slice_lo", greatest(col("tok_start"), col("_seq_lo")))
      .withColumn("_slice_hi",
        least(col("tok_end"), col("_seq_lo") + capacity))
      .select(
        col("lang"), col("seq_idx"),
        (col("_slice_lo") - col("_seq_lo")).as("pos_in_seq"),
        col("doc_id"),
        (col("_slice_lo") - col("tok_start")).as("doc_offset"),
        (col("_slice_hi") - col("_slice_lo")).as("tokens_in_seq"),
        col("n_tokens"),
        (col("tok_start") < col("_seq_lo") || col("tok_end") > col("_seq_lo") + capacity)
          .as("is_split"))
  }
}
