package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring: the classic KenLM-shaped corpus-quality
  * signal, reduced to a unigram LM trained on the corpus itself. A
  * document's mean token log-probability (equivalently its unigram
  * perplexity) separates "looks like the corpus" text from outlier noise —
  * the cheap first-pass perplexity filter of an LLM data pipeline.
  *
  * Determinism across engines: ln() can differ from glibc by 1 ulp, and
  * summing doubles is order-dependent. Both are removed by quantizing each
  * token's log-prob ONCE to fixed-point micro-nats via
  * float32(ln(p)) → double → ×1e6 → floor → BIGINT (the float32 round
  * makes the 1-ulp engines agree; the remaining steps are IEEE-exact), then
  * summing exact integers. The division count/total and the final
  * micro-nat→double conversions are single correctly-rounded ops.
  *
  * Scale shape: token counts are one explode + (token) partial-agg shuffle;
  * the vocabulary joins back onto the exploded corpus as a SHUFFLE join at
  * token grain — web-scale corpora have 1e8–1e9 distinct tokens, so the
  * vocabulary must never be broadcast (executor OOM). Both join sides hash
  * by token; Zipf-hot tokens skew the probe side, but the build side is one
  * row per token, which is exactly the shape AQE's skew-join splitting
  * handles (split the fat probe partition, replicate the single build row).
  * The per-doc reduction is a (doc_id) partial agg. Linear, no self-joins.
  */
object UnigramLm {

  /** ln(2) as an exact double literal — spelled identically in the oracle
    * SQL so both engines parse the same bits. */
  val Ln2Literal = "0.6931471805599453"

  private def toksCol: Column = split(col("text"), " ")

  def docLogProb(documents: DataFrame): DataFrame = {
    val tokens = documents.select(col("doc_id"), explode(toksCol).as("token"))
      .filter(col("token") =!= "")

    val vocab = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total_tokens"))

    // Fixed-point micro-nat log-prob per vocabulary token.
    val lm = vocab.crossJoin(broadcast(total))
      .withColumn("lp_micro",
        floor(expr("CAST(CAST(ln(CAST(cnt AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS FLOAT) AS DOUBLE)")
          * lit(1000000.0)).cast("long"))
      .select("token", "lp_micro")

    tokens
      .join(lm.hint("merge"), Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("sum_lp_micro"))
      .withColumn("avg_logprob",
        col("sum_lp_micro").cast("double") / lit(1000000.0) / col("n_tokens"))
      .withColumn("bits_per_token", -col("avg_logprob") / lit(Ln2Literal.toDouble))
      .select("doc_id", "n_tokens", "sum_lp_micro", "avg_logprob", "bits_per_token")
  }
}
