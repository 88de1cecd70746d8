package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * chunks with overlap — the sequence-prep step between a curated corpus
  * and a training dataloader (every chunk carries its provenance).
  *
  * Pure integer arithmetic (no float chunk-count math — cross-engine
  * exact), pure projection + one explode: linear, no shuffle, and the
  * explode amplifies rows by tokens/stride, never by corpus size.
  */
object Chunking {

  /** One row per (doc, chunk): chunk_idx, chunk_text, token counts.
    * Last chunk may be short; documents shorter than one stride still
    * produce exactly one chunk. */
  def chunkDocuments(documents: DataFrame, chunkTokens: Int = 64,
                     overlapTokens: Int = 16): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0)
    val stride = chunkTokens - overlapTokens
    documents
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("_toks"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("_nchunks",
        greatest(lit(1L),
          expr(s"(n_tokens - $overlapTokens + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("lang"), col("_toks"), col("n_tokens"),
        explode(sequence(lit(0L), col("_nchunks") - 1)).as("chunk_idx"))
      .withColumn("_chunk",
        slice(col("_toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)))
      .select(col("doc_id"), col("lang"), col("chunk_idx"),
        concat_ws(" ", col("_chunk")).as("chunk_text"),
        size(col("_chunk")).cast("long").as("chunk_tokens"),
        col("n_tokens"))
  }
}
