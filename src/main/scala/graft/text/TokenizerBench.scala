package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-family tokenizer benchmark — the comparison table a tokenizer
  * decision actually comes down to: for whitespace / BPE / WordPiece /
  * unigram-LM (SentencePiece-family), each trained on the 80% hash split
  * and applied to the HELD-OUT 20%, the per-language fertility
  * (subword tokens per word — lower is cheaper context) and compression
  * (chars per token — higher is denser). Whitespace is the untrained
  * floor at fertility exactly 1.
  *
  * Scale shape: each trainer runs its own documented hybrid path over
  * the zipf-bounded vocabulary; every encode is map-only with a
  * per-partition word memo; the rollup is a (tokenizer, lang)-grain
  * partial agg of exact integer counts with two IEEE divisions per row.
  * Rows-only (three learned vocabularies; SURVEY §4 class 1).
  */
object TokenizerBench {

  private def rollup(tag: String, perDoc: DataFrame): DataFrame =
    perDoc.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(lit(tag).as("tokenizer"), col("lang"), col("n_docs"),
        col("n_words"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))

  private def encodedStats(hold: DataFrame, encoded: DataFrame): DataFrame =
    hold.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(col("text")).cast("long").as("n_chars"))
      .join(encoded.select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens")), "doc_id")

  def fertility(documents: DataFrame,
                trainPred: Column = col("doc_id") % 5 =!= 0,
                bpeMerges: Int = 64, wpMerges: Int = 64,
                spmVocab: Int = 512, spmIters: Int = 3): DataFrame = {
    val train = documents.filter(trainPred)
    val hold = documents.filter(!trainPred)

    val ws = rollup("whitespace", hold.select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars")))

    val bpe = rollup("bpe",
      encodedStats(hold, Bpe.encode(hold, Bpe.trainMerges(train, bpeMerges))))

    val wpMergeTable = WordPiece.trainMerges(train, wpMerges)
    val wp = rollup("wordpiece",
      encodedStats(hold, WordPiece.encode(hold,
        WordPiece.vocabulary(train, wpMergeTable))))

    val spm = rollup("unigram_lm",
      encodedStats(hold, SpmUnigram.encode(hold,
        SpmUnigram.train(train, spmVocab, spmIters))))

    Seq(ws, bpe, wp, spm).reduce(_ unionByName _)
  }
}
