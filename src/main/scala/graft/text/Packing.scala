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
  * exact. The cumulative sum is a window partitioned by the packing shard
  * (`lang` here); at 100 TB the shard key becomes (lang, bucket) with
  * sequence ids offset per bucket — same plan, bounded partitions. The
  * explode amplifies rows only by sequences-spanned (≥1, ~1 on average),
  * never by corpus size.
  */
object Packing {

  def packSequences(documents: DataFrame, capacity: Int = 128): DataFrame = {
    require(capacity > 0)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    documents
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
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
