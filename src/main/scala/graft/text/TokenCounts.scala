package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (lang, word) token-count store — the corpus statistic a
  * continuous crawl must keep current, because everything downstream is
  * denominated in it: vocabulary sizing (Heaps), Zipf drift, mixture
  * weights, KL distances, tokenizer retraining triggers. Counts are
  * additive integers, so the store is APPEND-ONLY mergeable like the
  * line-count store: a crawl slice appends one partial-count parquet
  * batch (one pass over the DELTA), readers merge by summation, and the
  * merged table equals a from-scratch build bit-for-bit (integer
  * addition is associative — no approximation seam). Streaming
  * maintenance rides [[graft.streaming.StreamOps.tokenCountSink]] with
  * the same batchId-keyed replay idempotence as the line sink.
  */
object TokenCounts {

  // NO empty-token filter: the tokenization must match CorpusStats'
  // corpus collapse exactly, or the served statistics drift from the
  // direct path on pathological whitespace.
  private def explodeTokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("lang"), explode(split(col(textCol), " ")).as("word"))

  /** Build the store from a base corpus (one partial-count batch). */
  def buildStore(docs: DataFrame, storePath: String,
                 textCol: String = "text"): Unit =
    explodeTokens(docs, textCol)
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(storePath)

  /** Append a crawl slice's counts (delta-sized pass, no store read). */
  def appendStore(delta: DataFrame, storePath: String,
                  textCol: String = "text"): Unit =
    explodeTokens(delta, textCol)
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
      .write.mode("append").parquet(storePath)

  /** IDEMPOTENT keyed append for at-least-once writers (streaming
    * foreachBatch): a replayed micro-batch overwrites its own
    * `batch_<id>` slice instead of double-counting — double-counting
    * would skew every statistic served from the store. */
  def writeTokenBatch(delta: DataFrame, storePath: String, batchId: Long,
                      textCol: String = "text"): Unit =
    explodeTokens(delta, textCol)
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")

  /** Merge the store's partial-count batches: (lang, word, freq) —
    * vocab-grain, exactly what a from-scratch corpus collapse produces. */
  def mergedCounts(spark: SparkSession, storePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(storePath)
      .groupBy("lang", "word").agg(sum(col("c")).as("freq"))

  /** Zipf fit served FROM the store: bit-identical to
    * [[CorpusStats.zipfFit]] over the same corpus (shares the fit stage
    * verbatim), so the store can answer the distribution-drift question
    * without a corpus re-scan. */
  def zipfFromStore(spark: SparkSession, storePath: String): DataFrame =
    CorpusStats.zipfFromCounts(mergedCounts(spark, storePath))
}
