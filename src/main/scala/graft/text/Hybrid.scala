package graft.text

import graft.operators.ScalableRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid lexical+semantic retrieval fused with Reciprocal Rank Fusion
  * (Cormack/Clarke/Buettcher 2009): score(d) = Σ 1/(k + rank_i(d)) over the
  * per-retriever rank lists. RRF is the standard way RAG/search stacks merge
  * a BM25 list with an ANN list without score calibration — ranks, not raw
  * scores, so the two sides' incomparable scales never mix.
  *
  * Scale shape: each side is already rank-truncated to `kPerSide` by its own
  * scalable two-phase cut, so the fusion joins two ≤kPerSide-row frames —
  * driver-free, broadcast-sized, independent of corpus size. The corpus-
  * grain work (BM25's one doc-grain aggregate; one broadcast-query cosine
  * pass) is each retriever's own documented cost.
  */
object Hybrid {

  /** The standard RRF dampening constant. */
  val RrfK = 60.0

  /** Fuse BM25 retrieval for `queryTerms` with cosine ANN retrieval for the
    * embedding of `queryVecId` (vec_id aligns with doc_id in the corpus).
    * A doc appearing on only one list contributes only that list's term —
    * the other side's contribution is exactly 0, matching the published
    * formula over truncated lists. */
  def rrf(documents: DataFrame, embeddings: DataFrame, queryTerms: Seq[String],
          queryVecId: Long = 0L, kPerSide: Int = 50, k: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val lex = Bm25.rank(documents, queryTerms, kPerSide)
      .select(col("doc_id").as("id"), col("bm25_rank"))

    val corpus = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val qv = corpus.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), col("nrm").as("q_nrm"))
    val scored = corpus.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .withColumn("cos_sim",
        expr("vec_dot(qv, embedding)") / (col("q_nrm") * col("nrm")))
      .select(col("vec_id").as("id"), col("cos_sim"))
    val sem = ScalableRank.withGlobalRowNumber(scored,
        Seq(col("cos_sim").desc, col("id").asc), "sem_rank")
      .filter(col("sem_rank") <= kPerSide)

    val fused = lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK) + col("bm25_rank").cast("double")), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank").cast("double")), lit(0.0)))
    ScalableRank.withGlobalRowNumber(fused,
        Seq(col("rrf_score").desc, col("id").asc), "rrf_rank")
      .filter(col("rrf_rank") <= k)
      .select(col("rrf_rank"), col("id").as("doc_id"), col("rrf_score"),
        col("bm25_rank"), col("sem_rank"), col("cos_sim"))
  }
}
