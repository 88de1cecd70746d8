package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** Corpus-level distributional diagnostics for training-data curation:
  * the Zipf rank-frequency fit (sibling of the Heaps'-law vocab-growth
  * curve in [[TextAnalysis.vocabGrowth]]), per-source unigram KL
  * divergence against the corpus mixture (the data-mixture design
  * diagnostic: which sources are distributionally far from the blend),
  * and cross-source near-duplicate accounting (which dumps duplicate
  * each other — rides the exact [[SetSimJoin]] pair set).
  *
  * Hash-exactness contract (SURVEY §4): every ln() is float32-collapsed
  * and quantized once to fixed-point micro-nats (the [[BigramLm]]
  * pattern); all sums run over exact integers carried as decimal(38,0)
  * (Spark) / HUGEINT (DuckDB); the published statistics are a fixed,
  * mirrored chain of double ops at the very end — so Spark and the
  * oracle agree bit-for-bit.
  */
object CorpusStats {

  private def lnMicro(d: Column): Column =
    floor(d * lit(1000000.0)).cast("long")

  /** Zipf's-law OLS fit per language: regress ln(freq) on ln(rank) over
    * the (word, freq) vocabulary, rank = position under (freq desc, word
    * asc). Natural corpora run slope ≈ −1; a corpus whose slope drifts
    * flat is boilerplate/template-heavy, one that steepens lost its tail.
    *
    * Scale shape: the corpus collapses ONCE to the zipf-bounded
    * (lang, word, freq) vocabulary table (token-grain partial-agg
    * exchange); ranking uses the grouped-prefix-sum primitive — never a
    * per-lang single-partition window; the OLS moments are one bounded
    * groupBy over vocab rows. x·y products stay < 2^63 (micro-nat logs
    * are ≤ ~3.7e7), sums are exact decimals. */
  def zipfFit(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("lang"),
      explode(split(col("text"), " ")).as("word"))
    zipfFromCounts(tok.groupBy("lang", "word").agg(count(lit(1)).as("freq")))
  }

  /** The fit stage of [[zipfFit]], over any (lang, word, freq) vocabulary
    * frame — shared verbatim by the direct path and the incremental
    * token-count store ([[TokenCounts.zipfFromStore]]), so both answer
    * the same oracle bit-for-bit. */
  def zipfFromCounts(counts: DataFrame): DataFrame = {
    val ranked = ScalableRank.withGroupedPrefixSum(
        counts, col("lang"), Seq(col("freq").desc, col("word").asc),
        lit(1L), "rank0")
      .withColumn("rnk", col("rank0") + 1L)
    val xy = ranked
      .withColumn("x", lnMicro(expr("CAST(CAST(ln(CAST(rnk AS DOUBLE)) AS FLOAT) AS DOUBLE)")))
      .withColumn("y", lnMicro(expr("CAST(CAST(ln(CAST(freq AS DOUBLE)) AS FLOAT) AS DOUBLE)")))
    val moments = xy.groupBy("lang").agg(
      count(lit(1)).as("n_types"),
      sum(col("freq")).as("n_tokens"),
      sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"))
    moments
      .withColumn("nd", col("n_types").cast("double"))
      .withColumn("zipf_slope",
        (col("nd") * col("sxy") - col("sx") * col("sy")) /
        (col("nd") * col("sxx") - col("sx") * col("sx")))
      .withColumn("zipf_intercept",
        (col("sy") - col("zipf_slope") * col("sx")) / col("nd") / lit(1000000.0))
      .select("lang", "n_types", "n_tokens", "zipf_slope", "zipf_intercept")
  }

  /** DuckDB mirror of [[zipfFit]]. The oracle may rank with a plain
    * window — vocabulary scale is the oracle's problem, not the plan's. */
  def zipfFitOracleSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
      |), counts AS (
      |  SELECT lang, word, count(*) AS freq FROM tok GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, freq,
      |    row_number() OVER (PARTITION BY lang ORDER BY freq DESC, word ASC) AS rnk
      |  FROM counts
      |), xy AS (
      |  SELECT lang, freq,
      |    CAST(floor(CAST(CAST(ln(CAST(rnk AS DOUBLE)) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
      |    CAST(floor(CAST(CAST(ln(CAST(freq AS DOUBLE)) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS y
      |  FROM ranked
      |), m AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(freq) AS BIGINT) AS n_tokens,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      |  FROM xy GROUP BY lang
      |), s AS (
      |  SELECT lang, n_types, n_tokens,
      |    (CAST(n_types AS DOUBLE) * sxy - sx * sy) /
      |    (CAST(n_types AS DOUBLE) * sxx - sx * sx) AS zipf_slope,
      |    sx, sy
      |  FROM m
      |)
      |SELECT lang, n_types, n_tokens, zipf_slope,
      |  (sy - zipf_slope * sx) / CAST(n_types AS DOUBLE) / 1000000.0 AS zipf_intercept
      |FROM s ORDER BY lang""".stripMargin

  /** Per-source unigram KL divergence from the corpus mixture:
    * KL(P_s ‖ P) = Σ_w (c_sw/N_s) · ln((c_sw·N)/(N_s·c_w)) — the standard
    * "how far is this source from the blend" score used when designing
    * mixture weights. High-KL sources are outliers (code in a prose
    * corpus, a non-target language, machine spam).
    *
    * Scale shape: one token-grain partial-agg exchange to (source, word)
    * counts; word-marginal counts derive from that table (vocab-grain,
    * never re-scanning the corpus); per-source totals broadcast (sources
    * are a bounded registry, not data-scale); N is a 1-row broadcast.
    * Contributions are exact integer products (c_sw · lp_micro) summed as
    * decimals; one fixed double chain at the end. */
  def sourceKl(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("source"),
      explode(split(col("text"), " ")).as("word"))
    val csw = tok.groupBy("source", "word").agg(count(lit(1)).as("c_sw"))
    val ns = csw.groupBy("source").agg(
      sum(col("c_sw")).as("n_s"), count(lit(1)).as("n_types"))
    val cw = csw.groupBy("word").agg(sum(col("c_sw")).as("c_w"))
    val total = cw.agg(sum(col("c_w")).as("n_total"))
    csw
      .join(cw, "word")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(total))
      .withColumn("lp_micro", lnMicro(expr(
        """CAST(CAST(ln((CAST(c_sw AS DOUBLE) * CAST(n_total AS DOUBLE)) /
          |  (CAST(n_s AS DOUBLE) * CAST(c_w AS DOUBLE))) AS FLOAT) AS DOUBLE)""".stripMargin)))
      .groupBy("source", "n_s", "n_types")
      .agg(sum((col("c_sw").cast("decimal(18,0)") * col("lp_micro").cast("decimal(18,0)")))
        .cast("double").as("sum_micro"))
      .withColumn("kl_nats",
        col("sum_micro") / col("n_s").cast("double") / lit(1000000.0))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_types"), col("kl_nats"))
  }

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions (Lin 1991) — the SYMMETRIC companion to [[sourceKl]]:
    * KL against the corpus mixture says how far each source sits from
    * the average; JS(s,t) says which PAIRS of sources are
    * interchangeable (near 0) vs complementary (near ln 2 — JS is
    * bounded, so the scale is absolute). The mixture-selection question
    * "does adding source t change anything next to s" is a JS question.
    *
    * Exactness: the per-word term p·ln(p/m) is rewritten so the ln sees
    * only an INTEGER ratio — p/m = 2·c_sw·n_t / (c_sw·n_t + c_tw·n_s) —
    * then micro-quantized and weighted by the integer c_sw, so both
    * half-sums are exact decimal sums and JS is one final IEEE chain
    * (the sourceKl contract). Absent words contribute exactly ln 2.
    *
    * Scale: the (source, word) table is the only corpus-bound stage;
    * the pair fan-out multiplies it by (#sources − 1) — sources are a
    * bounded vocabulary (the mixtureWeights reasoning), never the
    * corpus. */
  def jsDivergence(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("source"),
      explode(split(col("text"), " ")).as("word"))
    val csw = tok.groupBy("source", "word").agg(count(lit(1)).as("c"))
    val ns = csw.groupBy("source").agg(sum(col("c")).as("n"))
    val pairs = ns.select(col("source").as("source_a"), col("n").as("n_a"))
      .crossJoin(broadcast(ns.select(col("source").as("source_b"),
        col("n").as("n_b"))))
      .filter(col("source_a") < col("source_b"))

    // one half-sum: Σ_w c_xw · micro(ln(2·c_xw·n_y / (c_xw·n_y + c_yw·n_x)))
    def half(xSrc: String, ySrc: String, nX: String, nY: String): DataFrame = {
      val cx = csw.select(col("source").as(xSrc), col("word"), col("c").as("c_x"))
      val cy = csw.select(col("source").as("_ysrc"), col("word").as("word_y"),
        col("c").as("c_y"))
      pairs
        .join(cx, xSrc)
        .join(cy, col(ySrc) === col("_ysrc") && col("word") === col("word_y"), "left")
        .withColumn("c_yz", coalesce(col("c_y"), lit(0L)))
        .withColumn("term_micro", lnMicro(expr(
          s"""CAST(CAST(ln((2.0 * CAST(c_x AS DOUBLE) * CAST($nY AS DOUBLE)) /
             |  (CAST(c_x AS DOUBLE) * CAST($nY AS DOUBLE)
             |   + CAST(c_yz AS DOUBLE) * CAST($nX AS DOUBLE))) AS FLOAT) AS DOUBLE)""".stripMargin)))
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(sum(col("c_x").cast("decimal(18,0)") *
          col("term_micro").cast("decimal(18,0)")).cast("double").as("_s"))
    }
    val h1 = half("source_a", "source_b", "n_a", "n_b")
      .withColumnRenamed("_s", "_s1")
    val h2 = half("source_b", "source_a", "n_b", "n_a")
      .withColumnRenamed("_s", "_s2")
    h1.join(h2, Seq("source_a", "source_b", "n_a", "n_b"))
      .withColumn("js_nats",
        lit(0.5) * (col("_s1") / col("n_a").cast("double") / lit(1000000.0) +
          col("_s2") / col("n_b").cast("double") / lit(1000000.0)))
      .withColumn("js_bits", col("js_nats") / lit(UnigramLm.Ln2Literal.toDouble))
      .select("source_a", "source_b", "n_a", "n_b", "js_nats", "js_bits")
  }

  /** DuckDB mirror of [[jsDivergence]]. */
  def jsDivergenceOracleSql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
       |), csw AS (
       |  SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
       |), ns AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM csw GROUP BY 1
       |), pr AS (
       |  SELECT a.source AS source_a, a.n AS n_a, b.source AS source_b, b.n AS n_b
       |  FROM ns a JOIN ns b ON a.source < b.source
       |), h1 AS (
       |  SELECT pr.source_a, pr.source_b, pr.n_a, pr.n_b,
       |    sum(CAST(cx.c AS HUGEINT) * CAST(floor(CAST(CAST(ln(
       |      (2.0 * CAST(cx.c AS DOUBLE) * CAST(pr.n_b AS DOUBLE)) /
       |      (CAST(cx.c AS DOUBLE) * CAST(pr.n_b AS DOUBLE)
       |       + CAST(coalesce(cy.c, 0) AS DOUBLE) * CAST(pr.n_a AS DOUBLE))
       |    ) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT)) AS s1
       |  FROM pr
       |  JOIN csw cx ON cx.source = pr.source_a
       |  LEFT JOIN csw cy ON cy.source = pr.source_b AND cy.word = cx.word
       |  GROUP BY 1, 2, 3, 4
       |), h2 AS (
       |  SELECT pr.source_a, pr.source_b,
       |    sum(CAST(cx.c AS HUGEINT) * CAST(floor(CAST(CAST(ln(
       |      (2.0 * CAST(cx.c AS DOUBLE) * CAST(pr.n_a AS DOUBLE)) /
       |      (CAST(cx.c AS DOUBLE) * CAST(pr.n_a AS DOUBLE)
       |       + CAST(coalesce(cy.c, 0) AS DOUBLE) * CAST(pr.n_b AS DOUBLE))
       |    ) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT)) AS s2
       |  FROM pr
       |  JOIN csw cx ON cx.source = pr.source_b
       |  LEFT JOIN csw cy ON cy.source = pr.source_a AND cy.word = cx.word
       |  GROUP BY 1, 2
       |)
       |SELECT h1.source_a AS source_a, h1.source_b AS source_b, n_a, n_b,
       |  0.5 * (CAST(s1 AS DOUBLE) / CAST(n_a AS DOUBLE) / 1000000.0
       |       + CAST(s2 AS DOUBLE) / CAST(n_b AS DOUBLE) / 1000000.0) AS js_nats,
       |  0.5 * (CAST(s1 AS DOUBLE) / CAST(n_a AS DOUBLE) / 1000000.0
       |       + CAST(s2 AS DOUBLE) / CAST(n_b AS DOUBLE) / 1000000.0)
       |    / ${UnigramLm.Ln2Literal} AS js_bits
       |FROM h1 JOIN h2 ON h1.source_a = h2.source_a AND h1.source_b = h2.source_b
       |ORDER BY source_a, source_b""".stripMargin

  /** DuckDB mirror of [[sourceKl]]. */
  def sourceKlOracleSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
      |), csw AS (
      |  SELECT source, word, count(*) AS c_sw FROM tok GROUP BY 1, 2
      |), ns AS (
      |  SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s,
      |    CAST(count(*) AS BIGINT) AS n_types FROM csw GROUP BY 1
      |), cw AS (
      |  SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w FROM csw GROUP BY 1
      |), tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM cw
      |), contrib AS (
      |  SELECT csw.source, ns.n_s, ns.n_types,
      |    CAST(c_sw AS HUGEINT) *
      |    CAST(floor(CAST(CAST(ln((CAST(c_sw AS DOUBLE) * CAST(n_total AS DOUBLE)) /
      |      (CAST(n_s AS DOUBLE) * CAST(c_w AS DOUBLE))) AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS c
      |  FROM csw JOIN cw USING (word) JOIN ns USING (source) CROSS JOIN tot
      |)
      |SELECT source, n_s AS n_tokens, n_types,
      |  CAST(sum(c) AS DOUBLE) / CAST(n_s AS DOUBLE) / 1000000.0 AS kl_nats
      |FROM contrib GROUP BY source, n_s, n_types ORDER BY source""".stripMargin

  /** Per-language vocabulary diagnostics — the corpus-linguistics
    * companions to the Zipf/Heaps fits, each a known data-quality tell:
    * type-token ratio (low = templated/repetitive), hapax rate (share of
    * types seen once — unusually low = boilerplate, unusually high =
    * OCR noise/mojibake), dis-legomena rate, and the head share (top-1
    * word's token share — high = degenerate spam). One vocab-grain
    * partial-agg exchange; exact integers, one IEEE division each. */
  def vocabDiagnostics(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
    counts.groupBy("lang").agg(
        count(lit(1)).as("n_types"),
        sum(col("freq")).as("n_tokens"),
        sum(when(col("freq") === 1, 1L).otherwise(0L)).as("hapax_types"),
        sum(when(col("freq") === 2, 1L).otherwise(0L)).as("dis_types"),
        max(col("freq")).as("top1_freq"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("type_token_ratio"),
        col("hapax_types"),
        (col("hapax_types").cast("double") / col("n_types").cast("double"))
          .as("hapax_rate"),
        (col("dis_types").cast("double") / col("n_types").cast("double"))
          .as("dis_rate"),
        (col("top1_freq").cast("double") / col("n_tokens").cast("double"))
          .as("top1_share"))
  }

  /** DuckDB mirror of [[vocabDiagnostics]]. */
  def vocabDiagnosticsOracleSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
      |), counts AS (
      |  SELECT lang, word, count(*) AS freq FROM tok GROUP BY 1, 2
      |), agg AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(freq) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
      |    CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_types,
      |    CAST(max(freq) AS BIGINT) AS top1_freq
      |  FROM counts GROUP BY 1
      |)
      |SELECT lang, n_types, n_tokens,
      |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
      |  hapax_types,
      |  CAST(hapax_types AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_rate,
      |  CAST(dis_types AS DOUBLE) / CAST(n_types AS DOUBLE) AS dis_rate,
      |  CAST(top1_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top1_share
      |FROM agg ORDER BY lang""".stripMargin

  /** Temperature-scaled source mixture weights (the α-sampling rule of
    * multilingual/multi-source training, mBERT/mT5 family, at α = 1/2):
    * w_s ∝ n_s^α flattens the natural token distribution so small
    * sources aren't drowned and giant crawls don't dominate an epoch.
    * α = 1/2 keeps every operation portable: sqrt is an IEEE
    * correctly-rounded primitive (unlike pow), and the sqrt values are
    * quantized to integer micro-units BEFORE the cross-source sum — a
    * float sum over sources would be order-dependent; the integer sum is
    * exact — so weights are hash-exact. `boost` > 1 marks up-sampled
    * sources. One token-grain exchange + a 1-row broadcast. */
  def mixtureWeights(documents: DataFrame): DataFrame = {
    val ns = documents
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source").agg(count(lit(1)).as("n_tokens"))
      .withColumn("s_micro",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = ns.agg(sum(col("s_micro")).as("sum_s"), sum(col("n_tokens")).as("n_total"))
    ns.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_total").cast("double"))
          .as("natural_share"),
        (col("s_micro").cast("double") / col("sum_s").cast("double"))
          .as("temp_weight"))
      .withColumn("boost", col("temp_weight") / col("natural_share"))
  }

  /** DuckDB mirror of [[mixtureWeights]]. */
  def mixtureWeightsOracleSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
      |), ns AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_micro
      |  FROM tok GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(s_micro) AS BIGINT) AS sum_s,
      |    CAST(sum(n_tokens) AS BIGINT) AS n_total FROM ns
      |)
      |SELECT source, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE) AS natural_share,
      |  CAST(s_micro AS DOUBLE) / CAST(sum_s AS DOUBLE) AS temp_weight,
      |  (CAST(s_micro AS DOUBLE) / CAST(sum_s AS DOUBLE)) /
      |    (CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE)) AS boost
      |FROM ns CROSS JOIN tot ORDER BY source""".stripMargin

  /** Cross-source near-duplicate accounting: for every source pair, how
    * many exact Jaccard-≥-t near-dup pairs cross them (same-source pairs
    * count under (s, s)). The "dump A is a re-crawl of dump B" signal
    * that drives source-level dedup ordering. Rides the exact
    * [[SetSimJoin.ppJoin]] pair set — no new candidate machinery — then
    * two doc-grain joins to attach sources and a pair-grain rollup.
    * `dup_rate` = n_pairs / (docs_a · docs_b) (cross) or / C(docs,2)
    * (diagonal), an exact-integer ratio → hash-exact. */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val pairs = SetSimJoin.ppJoin(documents).select("doc_a", "doc_b")
    val src = documents.select(col("doc_id"), col("source"))
    val perSource = documents.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tagged = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("s_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("s_b")), "doc_b")
      .select(least(col("s_a"), col("s_b")).as("src_a"),
        greatest(col("s_a"), col("s_b")).as("src_b"))
    tagged.groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .join(broadcast(perSource.select(col("source").as("src_a"), col("n_docs").as("docs_a"))), "src_a")
      .join(broadcast(perSource.select(col("source").as("src_b"), col("n_docs").as("docs_b"))), "src_b")
      .withColumn("dup_rate",
        when(col("src_a") === col("src_b"),
          col("n_pairs").cast("double") /
            expr("CAST(docs_a * (docs_a - 1) DIV 2 AS DOUBLE)"))
          .otherwise(col("n_pairs").cast("double") /
            (col("docs_a") * col("docs_b")).cast("double")))
      .select("src_a", "src_b", "n_pairs", "docs_a", "docs_b", "dup_rate")
  }

  /** DuckDB mirror of [[sourceOverlap]] — extends the brute-force
    * all-pairs oracle of [[SetSimJoin.ppJoinOracleSql]]. */
  def sourceOverlapOracleSql: String =
    s"""WITH sh0 AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |      j -> array_to_string(string_split(text, ' ')[j:j+2], ' '))) AS s
       |  FROM documents
       |), pp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(a.s) AS BIGINT) AS size_a, CAST(len(b.s) AS BIGINT) AS size_b,
       |    CAST(len(list_filter(a.s, t -> list_contains(b.s, t))) AS BIGINT) AS inter_size
       |  FROM sh0 a JOIN sh0 b ON a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT doc_a, doc_b FROM pp
       |  WHERE inter_size * ${SetSimJoin.ThrDen} >= (size_a + size_b - inter_size) * ${SetSimJoin.ThrNum}
       |), per_source AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
       |), tagged AS (
       |  SELECT least(da.source, db.source) AS src_a,
       |         greatest(da.source, db.source) AS src_b
       |  FROM pairs JOIN documents da ON doc_a = da.doc_id
       |             JOIN documents db ON doc_b = db.doc_id
       |), rolled AS (
       |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM tagged GROUP BY 1, 2
       |)
       |SELECT src_a, src_b, n_pairs, pa.n_docs AS docs_a, pb.n_docs AS docs_b,
       |  CASE WHEN src_a = src_b
       |    THEN CAST(n_pairs AS DOUBLE) / CAST(pa.n_docs * (pa.n_docs - 1) // 2 AS DOUBLE)
       |    ELSE CAST(n_pairs AS DOUBLE) / CAST(pa.n_docs * pb.n_docs AS DOUBLE) END AS dup_rate
       |FROM rolled JOIN per_source pa ON src_a = pa.source
       |            JOIN per_source pb ON src_b = pb.source
       |ORDER BY src_a, src_b""".stripMargin

  /** Vocabulary-coverage crossing table — the tokenizer-budget design
    * question ("how many types must the vocab hold to cover 95% of
    * running tokens?") answered exactly: for each target percentage,
    * the FIRST frequency-ranked vocabulary prefix whose cumulative
    * token mass reaches it, with the crossing token and its achieved
    * share. The inverse of the Zipf fit's slope view, and the table
    * BPE/unigram budget decisions read.
    *
    * Exactness: the crossing test is pure integer arithmetic
    * (100·cum ≥ p·T over exact BIGINTs — the weightedMedian contract);
    * the achieved share is one IEEE division.
    *
    * Scale shape: corpus → vocabulary (token-grain partial agg), then
    * ONE balanced global-rank exchange and ONE prefix-sum pass over
    * the already-ranked frame (ordering by the computed rank — no
    * second sort of raw data); the 4 crossing rows fall out of a
    * row-local explode × filter. Never a vocab-spanning window.
    */
  def vocabCoverage(documents: DataFrame,
                    pcts: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    val counts = documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))
    val ranked = ScalableRank.withGlobalRowNumber(counts,
      Seq(col("c").desc, col("token").asc), "vocab_size")
    val cum = ScalableRank.withGroupedPrefixSum(ranked, lit(1L),
      Seq(col("vocab_size").asc), col("c"), "_cum_excl")
    val totals = cum.agg(sum(col("c")).as("total_tokens"),
      count(lit(1)).as("total_types"))
    cum.crossJoin(broadcast(totals))
      .withColumn("p_pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      .filter(
        lit(100L) * (col("_cum_excl") + col("c")) >= col("p_pct") * col("total_tokens") &&
          lit(100L) * col("_cum_excl") < col("p_pct") * col("total_tokens"))
      .withColumn("covered_share",
        (col("_cum_excl") + col("c")).cast("double") / col("total_tokens").cast("double"))
      .select(col("p_pct"), col("vocab_size"), col("token").as("crossing_token"),
        col("c").as("crossing_count"), col("covered_share"),
        col("total_types"), col("total_tokens"))
  }

  /** DuckDB mirror of [[vocabCoverage]]. */
  def vocabCoverageOracleSql(pcts: Seq[Int] = Seq(50, 90, 95, 99)): String =
    s"""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |), counts AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
      |  WHERE token <> '' GROUP BY 1
      |), ranked AS (
      |  SELECT token, c,
      |    CAST(row_number() OVER (ORDER BY c DESC, token ASC) AS BIGINT) AS vocab_size,
      |    CAST(sum(c) OVER (ORDER BY c DESC, token ASC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM counts
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
      |    CAST(count(*) AS BIGINT) AS total_types
      |  FROM counts
      |), px AS (
      |  SELECT unnest(ARRAY[${pcts.map(p => s"CAST($p AS BIGINT)").mkString(", ")}]) AS p_pct
      |)
      |SELECT px.p_pct, r.vocab_size, r.token AS crossing_token,
      |  r.c AS crossing_count,
      |  CAST(r.cum AS DOUBLE) / CAST(t.total_tokens AS DOUBLE) AS covered_share,
      |  t.total_types, t.total_tokens
      |FROM ranked r CROSS JOIN tot t CROSS JOIN px
      |WHERE 100 * r.cum >= px.p_pct * t.total_tokens
      |  AND 100 * (r.cum - r.c) < px.p_pct * t.total_tokens
      |ORDER BY px.p_pct""".stripMargin

  /** word2vec-style negative-sampling table (Mikolov et al. 2013): each
    * vocabulary token weighted ∝ count^0.75 — the frequency smoothing
    * that keeps stopwords from dominating negatives while rare words
    * still appear — with the EXCLUSIVE cumulative range [cum_start,
    * cum_end) a trainer inverse-CDF samples from (draw u uniform in
    * [0, Σw), binary-search the token whose range contains u).
    *
    * Cross-engine determinism: c^0.75 forms as exp(0.75·ln c) with BOTH
    * libm outputs float32-rounded (the Colloc.q contract, applied to exp
    * as well — the multiply between them is IEEE on identical operands),
    * then micro-quantized to a BIGINT weight; cumulative ranges are
    * exact integer prefix sums; p is one IEEE division.
    *
    * Scale shape: one token-grain partial-agg exchange to the bounded
    * vocabulary, then the grouped-prefix-sum primitive under a constant
    * group (= the global-offset decomposition — never a vocab-spanning
    * single-partition window); Σw is a 1-row broadcast.
    */
  def negativeSampling(documents: DataFrame, minCount: Long = 5,
                       power: String = "0.75"): DataFrame = {
    val counts = documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val wExpr = s"CAST(floor(CAST(CAST(exp(CAST($power AS DOUBLE)" +
      " * CAST(CAST(ln(CAST(c AS DOUBLE)) AS FLOAT) AS DOUBLE)) AS FLOAT) AS DOUBLE)" +
      " * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"
    val weighted = counts.withColumn("w_micro", expr(wExpr))
    val cum = ScalableRank.withGroupedPrefixSum(
      weighted, lit(1L), Seq(col("token")), col("w_micro"), "cum_start")
    val total = weighted.agg(sum(col("w_micro")).as("total_w"))
    cum.crossJoin(broadcast(total))
      .withColumn("cum_end", col("cum_start") + col("w_micro"))
      .withColumn("p", col("w_micro").cast("double") / col("total_w").cast("double"))
      .select("token", "c", "w_micro", "cum_start", "cum_end", "p")
  }

  /** DuckDB mirror of [[negativeSampling]]. */
  def negativeSamplingOracleSql(minCount: Long = 5,
                                power: String = "0.75"): String =
    s"""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |), counts AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
      |  WHERE token <> '' GROUP BY 1 HAVING count(*) >= $minCount
      |), w AS (
      |  SELECT token, c,
      |    CAST(floor(CAST(CAST(exp(CAST($power AS DOUBLE)
      |      * CAST(CAST(ln(CAST(c AS DOUBLE)) AS FLOAT) AS DOUBLE)) AS FLOAT) AS DOUBLE)
      |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS w_micro
      |  FROM counts
      |), cum AS (
      |  SELECT *, CAST(sum(w_micro) OVER (ORDER BY token
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - w_micro AS cum_start
      |  FROM w
      |), t AS (
      |  SELECT CAST(sum(w_micro) AS BIGINT) AS total_w FROM w
      |)
      |SELECT token, c, w_micro, cum_start, cum_start + w_micro AS cum_end,
      |  CAST(w_micro AS DOUBLE) / CAST(total_w AS DOUBLE) AS p
      |FROM cum CROSS JOIN t ORDER BY token""".stripMargin

  /** Good–Turing frequency-of-frequencies table per language (Good 1953;
    * Gale & Sampson 1995 framing): for each observed frequency r, the
    * type count N_r, the unsmoothed GT adjusted count
    * r* = (r+1)·N_{r+1}/N_r (NULL at tail gaps where N_{r+1} = 0 — the
    * classic estimator edge the smoothed variants exist to fill), the
    * implied probability r* / N, and the unseen-mass estimate P₀ = N₁/N
    * repeated per lang. The table is both a smoothing input and a corpus
    * diagnostic: N₁/N is the expected rate of NOVEL tokens in the next
    * sample — high P₀ means the corpus is too small for its vocabulary.
    *
    * Exactness: r, N_r, N are exact integers; r* is one integer product
    * then one IEEE division, spelled identically in both engines.
    * Scale: token explode + (lang, word) partial agg are the only
    * corpus-scale stages; everything after lives at (lang, r) grain —
    * O(√N) rows per lang, since Σ r·N_r = N bounds distinct r values. */
  def goodTuring(documents: DataFrame): DataFrame = {
    val vocab = documents
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("lang", "word").agg(count(lit(1)).as("r"))
    val coc = vocab.groupBy("lang", "r").agg(count(lit(1)).as("n_r"))
    val totals = coc.groupBy("lang").agg(
      sum(col("r") * col("n_r")).as("n_tokens"),
      sum(when(col("r") === 1L, col("n_r")).otherwise(lit(0L))).as("n1"))
    val next = coc.select(col("lang"), (col("r") - 1L).as("r"),
      col("n_r").as("n_r1"))
    coc
      .join(next, Seq("lang", "r"), "left")
      .join(totals, Seq("lang"))
      .withColumn("tokens_at_r", col("r") * col("n_r"))
      .withColumn("r_star",
        expr("CAST((r + 1) * n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)"))
      .withColumn("p_gt", expr("r_star / CAST(n_tokens AS DOUBLE)"))
      .withColumn("p0_unseen",
        expr("CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)"))
      .select("lang", "r", "n_r", "tokens_at_r", "r_star", "p_gt", "p0_unseen")
  }

  /** DuckDB mirror of [[goodTuring]]. */
  def goodTuringOracleSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
      |), vocab AS (
      |  SELECT lang, word, CAST(count(*) AS BIGINT) AS r FROM tok
      |  WHERE word <> '' GROUP BY 1, 2
      |), coc AS (
      |  SELECT lang, r, CAST(count(*) AS BIGINT) AS n_r FROM vocab GROUP BY 1, 2
      |), tot AS (
      |  SELECT lang, CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
      |  FROM coc GROUP BY 1
      |), nxt AS (
      |  SELECT lang, r - 1 AS r, n_r AS n_r1 FROM coc
      |)
      |SELECT c.lang, c.r, c.n_r, c.r * c.n_r AS tokens_at_r,
      |  CAST((c.r + 1) * n.n_r1 AS DOUBLE) / CAST(c.n_r AS DOUBLE) AS r_star,
      |  CAST((c.r + 1) * n.n_r1 AS DOUBLE) / CAST(c.n_r AS DOUBLE)
      |    / CAST(t.n_tokens AS DOUBLE) AS p_gt,
      |  CAST(t.n1 AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS p0_unseen
      |FROM coc c
      |LEFT JOIN nxt n ON c.lang = n.lang AND c.r = n.r
      |JOIN tot t ON c.lang = t.lang
      |ORDER BY c.lang, c.r""".stripMargin
}
