package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** chrF — character n-gram F-score between document pairs (Popović
  * 2015) — the SUBWORD-robust overlap metric next to [[Bleu]]'s
  * token-grain BLEU-2: tokenization changes (hyphenation, casing glue,
  * agglutination) that shatter word n-grams barely move character
  * n-grams, so a near-dup that BLEU under-scores because of token
  * drift still lights up here. Spaces are removed before gramming
  * (Popović's convention), so reflowing whitespace is a no-op.
  *
  * Per order n ∈ {1,2,3} (β = 2, recall-weighted):
  *   m_n = Σ_g min(c_cand(g), c_ref(g))    (clipped multiset overlap)
  *   P_n = m_n/(len_a−n+1),  R_n = m_n/(len_b−n+1)
  *   F_n = 5·P_n·R_n / (4·P_n + R_n),  0 when m_n = 0
  *   chrF = (F₁ + F₂ + F₃)/3.
  *
  * Pair universe: the same bounded same-lang blocking as [[Bleu]]
  * (doc_id < maxDocId; at 100 TB the caller feeds an LSH candidate set
  * — the operator is pair-grain either way). Docs shorter than 3
  * despaced chars are excluded so every order's total is ≥ 1.
  *
  * Exactness: clipped matches and gram totals are exact integer sums;
  * the F chain is division/multiply/add only — NO libm call anywhere,
  * so the doubles are IEEE-identical cross-engine with no float32
  * collapse needed. Scale shape: gram construction is row-local; each
  * clip is a (pair, gram)-grain equi-join + partial agg; no all-pairs
  * stage beyond the governed pair universe.
  */
object ChrF {

  private val Orders = Seq(1, 2, 3)

  /** Pairwise chrF over bounded same-lang pairs: (doc_a, doc_b, lang,
    * len_a, len_b, m1..m3, f1..f3, chrf). doc_a is the candidate,
    * doc_b the reference. */
  def chrfPairs(documents: DataFrame, maxDocId: Long = 40): DataFrame = {
    val base = documents.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), col("lang"),
        regexp_replace(col("text"), " ", "").as("s"))
      .withColumn("len", length(col("s")).cast("long"))
      .filter(col("len") >= 3L)

    def gramCounts(n: Int): DataFrame =
      base.select(col("doc_id"),
          explode(expr(s"transform(sequence(1, length(s) - ${n - 1}), " +
            s"j -> substr(s, j, $n))")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))

    val pairs = base.select(col("doc_id").as("doc_a"), col("lang"),
        col("len").as("len_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("len").as("len_b")),
        col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "lang", "len_a", "len_b")

    def clipped(n: Int): DataFrame = {
      val g = gramCounts(n)
      pairs.select("doc_a", "doc_b")
        .join(g.select(col("doc_id").as("doc_a"), col("gram"), col("c").as("ca")), "doc_a")
        .join(g.select(col("doc_id").as("b_id"), col("gram").as("gram_b"),
          col("c").as("cb")),
          col("doc_b") === col("b_id") && col("gram") === col("gram_b"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb"))).as(s"m$n"))
    }

    val withM = Orders.foldLeft(pairs) { (acc, n) =>
      acc.join(clipped(n), Seq("doc_a", "doc_b"), "left")
    }.na.fill(0L, Orders.map(n => s"m$n"))

    val withF = Orders.foldLeft(withM) { (acc, n) =>
      acc.withColumn(s"f$n", expr(fSql(n)))
    }
    withF
      .withColumn("chrf", (col("f1") + col("f2") + col("f3")) / lit(3.0))
      .select("doc_a", "doc_b", "lang", "len_a", "len_b",
        "m1", "m2", "m3", "f1", "f2", "f3", "chrf")
  }

  /** One shared per-order F expression (engine-portable SQL). */
  private def fSql(n: Int): String = {
    val (m, ta, tb) = (s"m$n", s"CAST(len_a - ${n - 1} AS DOUBLE)",
      s"CAST(len_b - ${n - 1} AS DOUBLE)")
    s"""CASE WHEN $m = 0 THEN CAST(0.0 AS DOUBLE)
       |     ELSE 5.0 * (CAST($m AS DOUBLE) / $ta) * (CAST($m AS DOUBLE) / $tb)
       |          / (4.0 * (CAST($m AS DOUBLE) / $ta) + (CAST($m AS DOUBLE) / $tb))
       |END""".stripMargin
  }

  /** DuckDB mirror of [[chrfPairs]]. */
  def oracleSql(maxDocId: Long = 40): String = {
    val gramCtes = Orders.map { n =>
      s"""g$n AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len - ${n - 1} + 1),
         |    j -> substr(s, j, $n))) AS gram
         |  FROM dl
         |), gc$n AS (
         |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM g$n GROUP BY 1, 2
         |), mt$n AS (
         |  SELECT p.doc_a, p.doc_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m$n
         |  FROM pairs p
         |  JOIN gc$n a ON a.doc_id = p.doc_a
         |  JOIN gc$n b ON b.doc_id = p.doc_b AND b.gram = a.gram
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, lang, replace(text, ' ', '') AS s
       |  FROM documents WHERE doc_id < $maxDocId
       |), dl AS (
       |  SELECT doc_id, lang, s, CAST(length(s) AS BIGINT) AS len FROM d
       |  WHERE length(s) >= 3
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
       |    a.len AS len_a, b.len AS len_b
       |  FROM dl a JOIN dl b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |), $gramCtes, f AS (
       |  SELECT p.doc_a, p.doc_b, p.lang, p.len_a, p.len_b,
       |    coalesce(m1, 0) AS m1, coalesce(m2, 0) AS m2, coalesce(m3, 0) AS m3
       |  FROM pairs p
       |  LEFT JOIN mt1 ON p.doc_a = mt1.doc_a AND p.doc_b = mt1.doc_b
       |  LEFT JOIN mt2 ON p.doc_a = mt2.doc_a AND p.doc_b = mt2.doc_b
       |  LEFT JOIN mt3 ON p.doc_a = mt3.doc_a AND p.doc_b = mt3.doc_b
       |)
       |SELECT doc_a, doc_b, lang, len_a, len_b, m1, m2, m3,
       |  ${fSql(1)} AS f1, ${fSql(2)} AS f2, ${fSql(3)} AS f3,
       |  ((${fSql(1)}) + (${fSql(2)}) + (${fSql(3)})) / 3.0 AS chrf
       |FROM f ORDER BY doc_a, doc_b""".stripMargin
  }
}
