package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram novelty of held-out documents against the training corpus —
  * the memorization/contamination diagnostic of the dedup literature
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better", measures exactly this: how many eval n-grams the model has
  * literally seen). Low novelty means the eval split leaks training
  * text (inflated metrics); at corpus level, the novel-gram rate of a
  * NEW crawl slice against the existing corpus is the "is this slice
  * worth ingesting" signal.
  *
  * Per held-out document: total n-grams, how many exist ANYWHERE in the
  * train split (distinct-gram membership, not frequency), the novelty
  * rate, and a `mostly_seen` flag at the 0.5 threshold.
  *
  * Exactness: pure integer counts and one IEEE division. Scale shape:
  * gram construction is row-local; train grams collapse to a DISTINCT
  * gram set (partial-agg shuffle at gram grain); the membership probe is
  * a gram-grain left join (shuffle — a web-scale gram set is beyond
  * broadcast and beyond bloom exactness); per-doc rollup. Linear.
  */
object Novelty {

  /** Gram width: 5 words — long enough that shared grams mean shared
    * provenance, short enough that ordinary docs have many. */
  val N = 5

  /** Train/score split (the LM-family convention). */
  def defaultTrainPred: Column = col("doc_id") % 5 =!= 0

  private def grams(documents: DataFrame): DataFrame =
    documents
      .withColumn("toksf", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toksf")) >= N)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toksf) - ${N - 1}), " +
          s"j -> concat_ws(' ', slice(toksf, j, $N)))")).as("gram"))

  /** (doc_id, n_grams, n_seen, n_novel, novelty_rate, mostly_seen) for
    * every held-out doc with at least one full n-gram. */
  def docNovelty(documents: DataFrame,
                 trainPred: Column = defaultTrainPred): DataFrame = {
    val trainGrams = grams(documents.filter(trainPred))
      .select("gram").distinct().withColumn("_seen", lit(1L))
    grams(documents.filter(!trainPred))
      .join(trainGrams, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_seen"), lit(0L))).as("n_seen"))
      .withColumn("n_novel", col("n_grams") - col("n_seen"))
      .withColumn("novelty_rate",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .withColumn("mostly_seen", col("novelty_rate") < 0.5)
  }

  /** Build the distinct-gram store from a base corpus (overwrite): one
    * parquet column of distinct 5-grams. The corpus-novelty ingest gate
    * keeps this current instead of re-shingling everything ever crawled. */
  def buildGramStore(docs: DataFrame, path: String): Unit =
    grams(docs).select("gram").distinct()
      .write.mode("overwrite").parquet(path)

  /** Append a new slice's distinct grams (same-slice dedup only — the
    * store may repeat grams across slices; reads re-distinct, so appends
    * stay cheap and idempotent-by-union like the band store). */
  def appendGramStore(delta: DataFrame, path: String): Unit =
    grams(delta).select("gram").distinct()
      .write.mode("append").parquet(path)

  /** [[docNovelty]] served FROM the store: novelty of `evalDocs` against
    * everything ever ingested — bit-identical to a from-scratch
    * [[docNovelty]] when the store covers the same train corpus. */
  def noveltyFromStore(spark: org.apache.spark.sql.SparkSession,
                       path: String, evalDocs: DataFrame): DataFrame = {
    val store = spark.read.parquet(path)
      .select("gram").distinct().withColumn("_seen", lit(1L))
    grams(evalDocs)
      .join(store, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_seen"), lit(0L))).as("n_seen"))
      .withColumn("n_novel", col("n_grams") - col("n_seen"))
      .withColumn("novelty_rate",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .withColumn("mostly_seen", col("novelty_rate") < 0.5)
  }

  /** DuckDB mirror of [[docNovelty]] at the default split. */
  def oracleSql: String =
    s"""WITH tokd AS (
       |  SELECT doc_id, (doc_id % 5 <> 0) AS is_train,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents
       |), gr AS (
       |  SELECT doc_id, is_train,
       |    unnest(list_transform(range(1, len(toks) - ${N - 1} + 1),
       |      j -> array_to_string(toks[j:j+${N - 1}], ' '))) AS gram
       |  FROM tokd WHERE len(toks) >= $N
       |), tg AS (
       |  SELECT DISTINCT gram FROM gr WHERE is_train
       |), agg AS (
       |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
       |  FROM gr e LEFT JOIN tg ON e.gram = tg.gram
       |  WHERE NOT e.is_train GROUP BY 1
       |)
       |SELECT doc_id, n_grams, n_seen, n_grams - n_seen AS n_novel,
       |  CAST(n_grams - n_seen AS DOUBLE) / CAST(n_grams AS DOUBLE) AS novelty_rate,
       |  CAST(n_grams - n_seen AS DOUBLE) / CAST(n_grams AS DOUBLE) < 0.5 AS mostly_seen
       |FROM agg ORDER BY doc_id""".stripMargin
}
