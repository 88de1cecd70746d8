package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble near-duplicate detection: text MinHash-LSH candidates and
  * embedding sign-LSH cosine pairs over the SAME corpus (vec_id ≡ doc_id
  * in the testdata), merged into one verified pair set. Surface-form
  * detectors miss paraphrases; embedding detectors miss short/boilerplate
  * overlap — a production corpus dedup runs both and reconciles
  * (the `signal` column records which detector(s) proposed each pair).
  *
  * Every pair — whichever detector found it — is verified with exact
  * n-gram Jaccard (sorted-vocab two-pointer intersection, the native
  * sorted_intersect_count expression), so downstream policy can threshold
  * on a single exact score with the detectors as recall boosters.
  *
  * Scale shape: both candidate generators are bucket-bounded (LSH bands /
  * sign buckets), the merge is a full-outer join at pair grain (bounded by
  * candidate counts, not corpus²), and the vocab verify joins are
  * hash joins on doc ids.
  */
object Ensemble {

  def ensembleNearDups(documents: DataFrame, embeddings: DataFrame,
                       cosThreshold: Double = 0.35): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val textPairs = MinHash.candidatePairs(documents)
      .withColumn("text_candidate", lit(true))
    val embPairs = graft.sim.Similarity.embeddingNearDups(embeddings, cosThreshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cos_sim"))
      .withColumn("embed_candidate", lit(true))
    val merged = textPairs.join(embPairs, Seq("doc_a", "doc_b"), "full_outer")
      .withColumn("signal",
        when(col("text_candidate").isNotNull && col("embed_candidate").isNotNull, lit("both"))
          .when(col("text_candidate").isNotNull, lit("text_only"))
          .otherwise(lit("embedding_only")))
    val docsW = documents.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("vocab"))
    merged
      .join(docsW.select(col("doc_id").as("doc_a"), col("vocab").as("va")), "doc_a")
      .join(docsW.select(col("doc_id").as("doc_b"), col("vocab").as("vb")), "doc_b")
      .withColumn("inter_size", expr("sorted_intersect_count(va, vb)"))
      .withColumn("union_size",
        size(col("va")).cast("long") + size(col("vb")).cast("long") - col("inter_size"))
      .withColumn("exact_jaccard",
        col("inter_size").cast("double") / col("union_size"))
      .select("doc_a", "doc_b", "signal", "cos_sim", "exact_jaccard")
  }
}
