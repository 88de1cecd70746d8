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
  * Scale shape: the token explode is filtered to the broadcast query-term
  * literal set BEFORE the (doc, term) aggregate, so the corpus-sized tf
  * shuffle carries only query-matching tokens (|Q| terms, not the
  * vocabulary). Document length aggregates once at doc grain; df and the
  * corpus totals are |Q|-row / 1-row broadcasts. The pivot is a map-side
  * conditional aggregate at doc grain, and the final top-k uses the
  * balanced global-rank exchange (ScalableRank) — no single-partition
  * window over the matching-doc set.
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

    // Exact integer corpus stats: per-doc length, N, total token count.
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))

    // Query-matching (doc, term) term frequencies — the only corpus-sized
    // shuffle, pruned map-side by the literal isin filter.
    val qtf = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("term").agg(count(lit(1)).as("df"))

    val contrib = qtf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        // float32-round the ln output (the UnigramLm pattern): ln may
        // differ from the other engine's libm by 1 ulp in double; the
        // float32 collapse absorbs it, and every op after runs on
        // identical inputs (correctly-rounded IEEE → identical results).
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)))
          .cast("float").cast("double"))
      .withColumn("contrib",
        // (k1 + 1) and (1 − b) fold from the same parsed literals as the
        // SQL mirror — never embed a Scala-computed double in only one side.
        col("idf") * (col("tf").cast("double") * (lit(K1) + lit(1.0)))
          / (col("tf").cast("double")
            + lit(K1) * ((lit(1.0) - lit(B)) + lit(B) * col("dl").cast("double") / col("avgdl"))))

    // Pivot the fixed query-term list into columns (each (doc, term) row is
    // unique, so max is a pure selector) and sum left-to-right.
    val pivots: Seq[Column] = queryTerms.map(t =>
      coalesce(max(when(col("term") === t, col("contrib"))), lit(0.0)).as(s"c_$t"))
    val perDoc = contrib.groupBy(col("doc_id"), col("dl"))
      .agg(pivots.head, pivots.tail: _*)
    val score = queryTerms.map(t => col(s"c_$t")).reduceLeft(_ + _)

    val scored = perDoc.withColumn("score", score)
    ScalableRank.withGlobalRowNumber(
        scored, Seq(col("score").desc, col("doc_id").asc), "bm25_rank")
      .filter(col("bm25_rank") <= k)
      .select(Seq(col("bm25_rank"), col("doc_id"), col("dl"), col("score"))
        ++ queryTerms.map(t => col(s"c_$t")): _*)
  }

  /** The DuckDB mirror of `rank` — same fixed-order arithmetic, for the
    * correctness oracle. */
  def oracleSql(queryTerms: Seq[String], k: Int = 20): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    val pivotCols = queryTerms.map(t =>
      s"COALESCE(max(CASE WHEN term = '$t' THEN contrib END), 0.0) AS c_$t").mkString(",\n      |    ")
    val sumExpr = queryTerms.map(t => s"c_$t").mkString(" + ")
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tokf AS (
      |  SELECT doc_id, term FROM tok WHERE term <> ''
      |), dl AS (
      |  SELECT doc_id, count(*) AS dl FROM tokf GROUP BY 1
      |), totals AS (
      |  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl
      |), qtf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tokf
      |  WHERE term IN ($termList) GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM qtf GROUP BY 1
      |), contribs AS (
      |  SELECT qtf.doc_id, qtf.term, dl.dl,
      |    CAST(CAST(ln(1.0 + (CAST(t.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
      |        / (CAST(dfreq.df AS DOUBLE) + 0.5)) AS FLOAT) AS DOUBLE)
      |      * (CAST(qtf.tf AS DOUBLE) * ($K1 + 1.0))
      |      / (CAST(qtf.tf AS DOUBLE)
      |         + $K1 * ((1.0 - $B) + $B * CAST(dl.dl AS DOUBLE)
      |                  / (CAST(t.total_len AS DOUBLE) / CAST(t.n_docs AS DOUBLE)))) AS contrib
      |  FROM qtf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN totals t
      |), pivoted AS (
      |  SELECT doc_id, dl,
      |    $pivotCols
      |  FROM contribs GROUP BY doc_id, dl
      |), ranked AS (
      |  SELECT *, $sumExpr AS score FROM pivoted
      |)
      |SELECT * FROM (
      |  SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank,
      |         doc_id, dl, score, ${queryTerms.map(t => s"c_$t").mkString(", ")}
      |  FROM ranked
      |) t WHERE bm25_rank <= $k ORDER BY bm25_rank""".stripMargin
  }
}
