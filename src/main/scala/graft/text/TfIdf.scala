package graft.text

import graft.operators.ScalableRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over the documents corpus — the term-weighting
  * pass a training-data pipeline runs for keyword tagging / topic routing
  * before curation cuts.
  *
  * Weights use the smoothed formulation `tf · (ln((1+N)/(1+df)) + 1)`:
  * tf and df are exact integer counts, N is the exact corpus size, and the
  * ln/multiply run on identical operands in any engine — bit-reproducible
  * (SURVEY.md §4: IEEE ops on exact inputs are portable; only parallel
  * double SUMS are not, and there are none here).
  *
  * Scale shape: one explode of the token stream → counts at (doc, term)
  * grain (partial-agg before the shuffle collapses repeated terms
  * in-partition); document frequency reduces the SAME (doc, term) rows at
  * term grain (second bounded shuffle); N broadcasts as a one-row literal.
  * The per-doc top-k cut is ScalableRank.topKPerGroup — no
  * one-task-per-document window, survives documents with arbitrarily many
  * distinct terms.
  */
object TfIdf {

  /** (doc_id, term, tf) — whitespace tokens, empties dropped. */
  def termFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by smoothed TF-IDF (ties broken by term). */
  def topTerms(documents: DataFrame, k: Int = 5): DataFrame = {
    val tf = termFrequencies(documents)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf",
        log((lit(1L) + col("n_docs")).cast("double") / (lit(1L) + col("df")).cast("double"))
          + lit(1.0))
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
    ScalableRank.topKPerGroup(scored, Seq(col("doc_id")),
        Seq(col("tfidf").desc, col("term").asc), k, "term_rank")
      .select("doc_id", "term_rank", "term", "tf", "df", "idf", "tfidf")
  }
}
