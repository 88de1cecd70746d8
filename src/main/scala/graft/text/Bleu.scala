package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BLEU-2 clipped n-gram precision between document pairs (Papineni et
  * al. 2002) — the standard overlap metric a curation pipeline uses to
  * VERIFY near-duplicate / contamination candidates beyond raw Jaccard:
  * clipping (min of the two multiset counts) rewards shared content
  * without letting a repeated token in the candidate count twice, and
  * the brevity penalty stops a short extract of a long reference from
  * scoring as a full match.
  *
  *   p_n  = Σ_g min(c_cand(g), c_ref(g)) / (#cand n-grams),  n ∈ {1,2}
  *   BP   = 1 if len_c ≥ len_r else e^(1 − len_r/len_c)
  *   BLEU = BP · exp((ln p₁ + ln p₂)/2),   0 if any p_n = 0.
  *
  * Pair universe: the same bounded same-lang blocking as the exact
  * Jaccard operator (doc_id < maxDocId) — the pair count stays constant
  * per lang at any corpus size; at 100 TB the caller feeds an LSH
  * candidate set instead (the operator is pair-grain either way).
  *
  * Exactness: clipped matches and gram totals are exact integer sums;
  * the BLEU chain is one fixed-order IEEE expression with every libm
  * call (ln, exp) float32-collapsed, spelled identically in both
  * engines. Scale shape: n-gram construction is row-local; the clip is
  * a (pair, gram)-grain equi-join + partial agg; no all-pairs stage.
  */
object Bleu {

  /** One shared IEEE chain for the final score (cast-to-FLOAT collapse
    * after each libm call — the Colloc.q contract). */
  private val BleuSql =
    """CASE WHEN m1 = 0 OR m2 = 0 THEN CAST(0.0 AS DOUBLE)
      |     ELSE (CASE WHEN len_a >= len_b THEN CAST(1.0 AS DOUBLE)
      |                ELSE CAST(CAST(exp(CAST(1.0 AS DOUBLE)
      |                  - CAST(len_b AS DOUBLE) / CAST(len_a AS DOUBLE)) AS FLOAT) AS DOUBLE) END)
      |          * CAST(CAST(exp(CAST(0.5 AS DOUBLE) *
      |              (CAST(CAST(ln(CAST(m1 AS DOUBLE) / CAST(len_a AS DOUBLE)) AS FLOAT) AS DOUBLE)
      |             + CAST(CAST(ln(CAST(m2 AS DOUBLE) / CAST(len_a - 1 AS DOUBLE)) AS FLOAT) AS DOUBLE)))
      |            AS FLOAT) AS DOUBLE)
      |     END""".stripMargin

  /** Pairwise BLEU-2 over bounded same-lang pairs: (doc_a, doc_b, lang,
    * len_a, len_b, m1, m2, p1, p2, bleu2). doc_a is the candidate,
    * doc_b the reference. */
  def bleuPairs(documents: DataFrame, maxDocId: Long = 40): DataFrame = {
    // a candidate with no bigram (len < 2) cannot be BLEU-2 scored —
    // excluding it HERE keeps p2 a real division in both engines (0/0
    // would be NaN in Spark but engine-defined elsewhere: exactly the
    // latent-divergence class the governor review flagged)
    val toks = documents.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .filter(col("len") >= 2L)

    def gramCounts(n: Int): DataFrame = {
      val gram =
        if (n == 1) explode(col("toks"))
        else explode(expr(
          "transform(sequence(1, greatest(size(toks) - 1, 0)), " +
            "j -> concat(element_at(toks, j), ' ', element_at(toks, j + 1)))"))
      toks.select(col("doc_id"), gram.as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    }

    val pairs = toks.select(col("doc_id").as("doc_a"), col("lang"),
        col("len").as("len_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("len").as("len_b")),
        col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "lang", "len_a", "len_b")

    def clipped(n: Int, out: String): DataFrame = {
      val g = gramCounts(n)
      pairs.select("doc_a", "doc_b")
        .join(g.select(col("doc_id").as("doc_a"), col("gram"), col("c").as("ca")), "doc_a")
        .join(g.select(col("doc_id").as("b_id"), col("gram").as("gram_b"),
          col("c").as("cb")),
          col("doc_b") === col("b_id") && col("gram") === col("gram_b"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb"))).as(out))
    }

    pairs
      .join(clipped(1, "m1"), Seq("doc_a", "doc_b"), "left")
      .join(clipped(2, "m2"), Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("m1", "m2"))
      .withColumn("p1", expr("CAST(m1 AS DOUBLE) / CAST(len_a AS DOUBLE)"))
      .withColumn("p2", expr("CAST(m2 AS DOUBLE) / CAST(len_a - 1 AS DOUBLE)"))
      .withColumn("bleu2", expr(BleuSql))
      .select("doc_a", "doc_b", "lang", "len_a", "len_b", "m1", "m2",
        "p1", "p2", "bleu2")
  }

  /** Self-BLEU corpus-diversity rollup (Zhu et al. 2018, Texygen): the
    * average pairwise BLEU-2 within each language — HIGH self-BLEU means
    * the corpus keeps saying the same thing (mode collapse in generated
    * data, boilerplate in crawled data); the share of pairs over 0.5 is
    * the hot-spot indicator. Each pair's score micro-quantizes BEFORE the
    * rollup so the per-lang sums are exact integers (never a raw double
    * sum across rows). Same bounded pair universe as [[bleuPairs]]. */
  def selfBleu(documents: DataFrame, maxDocId: Long = 40): DataFrame =
    bleuPairs(documents, maxDocId)
      .withColumn("bleu_micro",
        floor(col("bleu2") * lit(1000000.0)).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("bleu_micro")).as("_sum_micro"),
        sum(when(col("bleu2") > 0.5, 1L).otherwise(0L)).as("n_high_overlap"))
      .withColumn("self_bleu",
        col("_sum_micro").cast("double") / lit(1000000.0) /
          col("n_pairs").cast("double"))
      .select("lang", "n_pairs", "self_bleu", "n_high_overlap")

  /** DuckDB mirror of [[selfBleu]]: the shared CTE core + the quantized
    * per-lang rollup. */
  def selfBleuOracleSql(maxDocId: Long = 40): String =
    coreCtes(maxDocId) +
      s"""
         |, scored AS (
         |  SELECT lang, $BleuSql AS bleu2 FROM f
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CAST(floor(bleu2 * 1000000.0) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / CAST(count(*) AS DOUBLE) AS self_bleu,
         |  CAST(sum(CASE WHEN bleu2 > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_overlap
         |FROM scored GROUP BY 1 ORDER BY lang""".stripMargin

  /** DuckDB mirror of [[bleuPairs]]. */
  def oracleSql(maxDocId: Long = 40): String =
    coreCtes(maxDocId) +
      s"""
         |SELECT doc_a, doc_b, lang, len_a, len_b, m1, m2,
         |  CAST(m1 AS DOUBLE) / CAST(len_a AS DOUBLE) AS p1,
         |  CAST(m2 AS DOUBLE) / CAST(len_a - 1 AS DOUBLE) AS p2,
         |  $BleuSql AS bleu2
         |FROM f ORDER BY doc_a, doc_b""".stripMargin

  /** Shared oracle CTE chain ending in `f(doc_a, doc_b, lang, len_a,
    * len_b, m1, m2)`. */
  private def coreCtes(maxDocId: Long = 40): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents WHERE doc_id < $maxDocId
       |), dl AS (
       |  SELECT doc_id, lang, toks, CAST(len(toks) AS BIGINT) AS len FROM d
       |  WHERE len(toks) >= 2
       |), uni AS (
       |  SELECT doc_id, unnest(toks) AS gram FROM dl
       |), unic AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1, 2
       |), big AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |    j -> toks[j] || ' ' || toks[j + 1])) AS gram
       |  FROM dl
       |), bigc AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
       |    a.len AS len_a, b.len AS len_b
       |  FROM dl a JOIN dl b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |), m1t AS (
       |  SELECT p.doc_a, p.doc_b, CAST(sum(least(ua.c, ub.c)) AS BIGINT) AS m1
       |  FROM pairs p
       |  JOIN unic ua ON ua.doc_id = p.doc_a
       |  JOIN unic ub ON ub.doc_id = p.doc_b AND ub.gram = ua.gram
       |  GROUP BY 1, 2
       |), m2t AS (
       |  SELECT p.doc_a, p.doc_b, CAST(sum(least(ba.c, bb.c)) AS BIGINT) AS m2
       |  FROM pairs p
       |  JOIN bigc ba ON ba.doc_id = p.doc_a
       |  JOIN bigc bb ON bb.doc_id = p.doc_b AND bb.gram = ba.gram
       |  GROUP BY 1, 2
       |), f AS (
       |  SELECT p.doc_a, p.doc_b, p.lang, p.len_a, p.len_b,
       |    coalesce(m1, 0) AS m1, coalesce(m2, 0) AS m2
       |  FROM pairs p
       |  LEFT JOIN m1t ON p.doc_a = m1t.doc_a AND p.doc_b = m1t.doc_b
       |  LEFT JOIN m2t ON p.doc_a = m2t.doc_a AND p.doc_b = m2t.doc_b
       |)""".stripMargin
}
