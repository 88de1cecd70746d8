package graft.text

import graft.operators.ScalableRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 document retrieval over the corpus — the lexical ranking pass a
  * training-data pipeline runs for targeted corpus slicing (pull the
  * documents most relevant to a topic / eval probe) and for RAG-style
  * retrieval evaluation. Complements TF-IDF keyword extraction
  * (text/TfIdf.scala): TF-IDF weights terms per document; BM25 ranks
  * documents for a query.
  *
  * Scoring: Okapi BM25 with the Lucene non-negative idf,
  *   idf(t)        = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   contrib(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   score(d)      = Σ_{t ∈ Q} contrib(t, d)
  * with k1 = 1.2, b = 0.75 (the standard defaults).
  *
  * Bit-reproducibility (SURVEY §4): tf, df, dl, N, Σdl are exact integer
  * aggregates; avgdl and every contrib are IEEE ops on those exact inputs.
  * Two hazards, both removed: (1) ln() may differ from another engine's
  * libm by 1 ulp in double — the idf is float32-rounded once (the
  * UnigramLm pattern), after which every downstream op runs on identical
  * operands; (2) the Σ over query terms — a parallel double sum is
  * order-dependent — so the query terms (a small FIXED list) are pivoted
  * into per-term columns and summed in fixed left-to-right expression
  * order: identical operand order in any engine, hash-exact against the
  * same textual sum in SQL.
  *
  * Scale shape: ONE token explode → ONE doc-grain map-side-combined
  * aggregate producing dl and the per-query-term tf pivots together (tf
  * for a fixed |Q|-term list is |Q| conditional sums, not a (doc, term)
  * shuffle); corpus totals INCLUDING every per-term df reduce that
  * doc-grain frame to a single broadcast row; scoring is then row-local
  * arithmetic, and the final top-k uses the balanced global-rank exchange
  * (ScalableRank) — no single-partition window over the matching-doc set.
  * (First cut tokenized the corpus twice — once for dl, once for tf — and
  * shuffled at (doc, term) grain with a dl join back; the fused shape
  * halves the dominant explode cost and removes two shuffles and a join.)
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-k documents for `queryTerms` by BM25, with per-term contribution
    * columns `c_<term>` in the given (fixed) order. Documents matching no
    * query term are not retrieved. */
  def rank(documents: DataFrame, queryTerms: Seq[String], k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be a non-empty duplicate-free list")
    val tok = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")

    // One doc-grain aggregate: document length plus the tf of each fixed
    // query term as conditional sums (all exact integers, map-side
    // combined before the only corpus-grain shuffle).
    val tfAggs: Seq[Column] =
      count(lit(1)).as("dl") +:
        queryTerms.map(t =>
          sum(when(col("term") === t, lit(1L)).otherwise(lit(0L))).as(s"tf_$t"))
    val perDoc = tok.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)

    // Corpus totals INCLUDING per-term document frequencies: one broadcast
    // row reduced from the doc-grain frame.
    val totAggs: Seq[Column] =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len")) ++
        queryTerms.map(t =>
          sum(when(col(s"tf_$t") > 0, lit(1L)).otherwise(lit(0L))).as(s"df_$t"))
    val totals = perDoc.agg(totAggs.head, totAggs.tail: _*)

    scoreAndRank(perDoc, totals, queryTerms, k)
  }

  /** The shared scoring tail of [[rank]] and [[searchIndex]]: identical
    * expression tree over (doc_id, dl, tf_*) + (n_docs, total_len, df_*)
    * frames, so the store-served search is bit-identical to the
    * from-scratch ranking whenever the input integers agree. */
  private def scoreAndRank(perDoc: DataFrame, totals: DataFrame,
                           queryTerms: Seq[String], k: Int): DataFrame = {
    // Row-local scoring: idf per term from the broadcast totals, contrib
    // from this row's tf/dl. tf = 0 contributes exactly 0.0 (zero
    // numerator), matching the SQL mirror's arithmetic bit for bit.
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      // float32-round the ln output (the UnigramLm pattern): ln may differ
      // from the other engine's libm by 1 ulp in double; the float32
      // collapse absorbs it, and every op after runs on identical inputs
      // (correctly-rounded IEEE → identical results). (k1 + 1) and (1 − b)
      // fold from the same parsed literals as the SQL mirror.
      val idf =
        log(lit(1.0) + (col("n_docs").cast("double") - col(s"df_$t").cast("double") + lit(0.5))
          / (col(s"df_$t").cast("double") + lit(0.5)))
          .cast("float").cast("double")
      idf * (tf * (lit(K1) + lit(1.0))) /
        (tf + lit(K1) * ((lit(1.0) - lit(B))
          + lit(B) * col("dl").cast("double") / col("avgdl")))
    }
    val scored = perDoc
      .filter(queryTerms.map(t => col(s"tf_$t") > 0).reduceLeft(_ || _))
      .crossJoin(broadcast(totals))
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .select(
        Seq(col("doc_id"), col("dl")) ++
          queryTerms.map(t => contrib(t).as(s"c_$t")): _*)
      .withColumn("score", queryTerms.map(t => col(s"c_$t")).reduceLeft(_ + _))

    ScalableRank.withGlobalRowNumber(
        scored, Seq(col("score").desc, col("doc_id").asc), "bm25_rank")
      .filter(col("bm25_rank") <= k)
      .select(Seq(col("bm25_rank"), col("doc_id"), col("dl"), col("score"))
        ++ queryTerms.map(t => col(s"c_$t")): _*)
  }

  // ---- incremental inverted-index store ----
  //
  // The mergeable state is the classic inverted index: (term, doc_id, tf)
  // postings plus (doc_id, dl) document lengths. Disjoint document slices
  // append WITHOUT rewriting earlier slices (each doc_id lives in exactly
  // one slice by contract), and every serving statistic — df, N, Σdl —
  // is an order-insensitive exact-integer reduce over the store, so
  // base+delta serves BIT-IDENTICALLY to a from-scratch rank() on the
  // union corpus (q_bm25_incremental shares q_bm25_rank's oracle
  // verbatim). Postings are written sorted by term so parquet row-group
  // min/max stats prune non-query terms at read time — serving a |Q|-term
  // query reads |Q| posting lists plus the doclen side, never the corpus
  // text.

  /** Build the index store at `root` (overwrites existing slices). */
  def buildIndex(documents: DataFrame, root: String): Unit =
    writeIndexSlice(documents, root, org.apache.spark.sql.SaveMode.Overwrite)

  /** Append a DISJOINT document slice (doc_ids not already in the store —
    * the caller's contract, same as every incremental store here). */
  def appendIndex(documents: DataFrame, root: String): Unit =
    writeIndexSlice(documents, root, org.apache.spark.sql.SaveMode.Append)

  private def writeIndexSlice(documents: DataFrame, root: String,
                              mode: org.apache.spark.sql.SaveMode): Unit =
    writeIndexTo(documents, s"$root/postings", s"$root/doclen", mode)

  /** Streaming micro-batch slice: batchId-KEYED subdirectories, so an
    * at-least-once replay overwrites its own slice instead of
    * double-counting tf/dl (the writeLineBatch contract — a re-appended
    * batch would inflate term frequencies and document lengths, skewing
    * every downstream idf and length norm). */
  def writeIndexBatch(batch: DataFrame, root: String, batchId: Long): Unit =
    writeIndexTo(batch, s"$root/postings/batch_$batchId",
      s"$root/doclen/batch_$batchId", org.apache.spark.sql.SaveMode.Overwrite)

  private def writeIndexTo(documents: DataFrame, postingsPath: String,
                           doclenPath: String,
                           mode: org.apache.spark.sql.SaveMode): Unit = {
    // One tokenize feeds both files: doclen derives from the (much
    // smaller) grouped postings frame, persisted across the two writes so
    // the corpus text is scanned exactly once per slice.
    val postings = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postings
        .sortWithinPartitions("term")
        .write.mode(mode).parquet(postingsPath)
      postings.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        .write.mode(mode).parquet(doclenPath)
    } finally postings.unpersist(blocking = false)
  }

  /** Serve a BM25 query from the store: reads only the query terms'
    * posting lists (term filter pushed to the parquet scan) plus the
    * doclen table; bit-identical to `rank()` on the same corpus. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                  queryTerms: Seq[String], k: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "queryTerms must be a non-empty duplicate-free list")
    // recursive lookup merges flat appended slices and batchId-keyed
    // streaming subdirectories identically
    val doclen = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/doclen")
    val postings = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/postings")
      .filter(col("term").isin(queryTerms: _*))
    // Pivot the ≤|Q| surviving postings per doc into rank()'s fixed
    // per-term tf columns; join back the doc length at doc grain.
    val tfPivot = postings.groupBy("doc_id")
      .agg(
        sum(when(col("term") === queryTerms.head, col("tf")).otherwise(lit(0L)))
          .as(s"tf_${queryTerms.head}"),
        queryTerms.tail.map(t =>
          sum(when(col("term") === t, col("tf")).otherwise(lit(0L))).as(s"tf_$t")): _*)
    val perDoc = tfPivot.join(doclen, Seq("doc_id"))
    // df per term = posting-list length (postings are (term, doc)-unique);
    // N and Σdl reduce the doclen side. All exact integers, so the
    // scoring inputs equal rank()'s bit for bit.
    val dfRow = postings.agg(
      sum(when(col("term") === queryTerms.head, lit(1L)).otherwise(lit(0L)))
        .as(s"df_${queryTerms.head}"),
      queryTerms.tail.map(t =>
        sum(when(col("term") === t, lit(1L)).otherwise(lit(0L))).as(s"df_$t")): _*)
    val totals = doclen
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .crossJoin(dfRow)
    scoreAndRank(perDoc, totals, queryTerms, k)
  }

  /** The DuckDB mirror of `rank` — same fused doc-grain shape and the same
    * fixed-order arithmetic, for the correctness oracle. */
  def oracleSql(queryTerms: Seq[String], k: Int = 20): String =
    oracleCtes(queryTerms) +
      s"""
      |SELECT bm25_rank, doc_id, dl, score, ${queryTerms.map(t => s"c_$t").mkString(", ")}
      |FROM bm WHERE bm25_rank <= $k ORDER BY bm25_rank""".stripMargin

  /** The `rank` mirror as a CTE chain ending in `bm` (all docs, ranked) so
    * composite oracles (e.g. Hybrid.rrf) can reuse the lexical side. */
  def oracleCtes(queryTerms: Seq[String]): String = {
    val tfCols = queryTerms.map(t =>
      s"sum(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n      |    ")
    val dfCols = queryTerms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n      |    ")
    def contribSql(t: String): String =
      s"""CAST(CAST(ln(1.0 + (CAST(t.n_docs AS DOUBLE) - CAST(t.df_$t AS DOUBLE) + 0.5)
      |        / (CAST(t.df_$t AS DOUBLE) + 0.5)) AS FLOAT) AS DOUBLE)
      |      * (CAST(p.tf_$t AS DOUBLE) * ($K1 + 1.0))
      |      / (CAST(p.tf_$t AS DOUBLE)
      |         + $K1 * ((1.0 - $B) + $B * CAST(p.dl AS DOUBLE)
      |                  / (CAST(t.total_len AS DOUBLE) / CAST(t.n_docs AS DOUBLE)))) AS c_$t"""
    val contribCols = queryTerms.map(contribSql).mkString(",\n      |    ")
    val anyMatch = queryTerms.map(t => s"p.tf_$t > 0").mkString(" OR ")
    val sumExpr = queryTerms.map(t => s"c_$t").mkString(" + ")
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tokf AS (
      |  SELECT doc_id, term FROM tok WHERE term <> ''
      |), per_doc AS (
      |  SELECT doc_id, count(*) AS dl,
      |    $tfCols
      |  FROM tokf GROUP BY doc_id
      |), totals AS (
      |  SELECT count(*) AS n_docs, sum(dl) AS total_len,
      |    $dfCols
      |  FROM per_doc
      |), contribs AS (
      |  SELECT p.doc_id, p.dl,
      |    $contribCols
      |  FROM per_doc p CROSS JOIN totals t
      |  WHERE $anyMatch
      |), ranked AS (
      |  SELECT *, $sumExpr AS score FROM contribs
      |), bm AS (
      |  SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank,
      |         doc_id, dl, score, ${queryTerms.map(t => s"c_$t").mkString(", ")}
      |  FROM ranked
      |)""".stripMargin
  }
}
