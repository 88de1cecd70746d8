package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines:
  * Gopher-style repetition filtering and benchmark decontamination.
  *
  * Both follow the reference's curation stage shape (quality gating before
  * the training cut — cf. reference `spark_jobs/silver/transform_transactions.py`
  * bounds/dedup filters, generalized here to document repetition and
  * eval-set leakage).
  */
object Curation {

  /** Gopher-style repetition statistics + keep/drop gate.
    *
    * Word-level analogs of the "repetitious document" rules: the share of
    * bigram instances taken by the single most frequent bigram, and the
    * fraction of trigram instances whose trigram occurs more than once.
    * Combined with token-count and mean-token-length bounds into one
    * `keep` flag.
    *
    * Scale shape: two explode→(doc, gram) partial-agg passes (bigrams,
    * trigrams), each linear in corpus tokens and shuffled at (doc_id, gram)
    * grain — never a cross-doc join. The doc-grain joins at the end are
    * |docs| rows. All ratios are exact-integer divisions (cross-engine
    * deterministic).
    */
  def repetitionStats(documents: DataFrame,
                      maxTopBigramShare: Double = 0.04,
                      maxDupTrigramFrac: Double = 0.25): DataFrame = {
    def gramStats(n: Int, tag: String): DataFrame =
      documents
        .select(col("doc_id"),
          explode(expr(
            s"transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
            s"j -> concat_ws(' ', slice(split(text, ' '), j, $n)))")).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(
          max(col("c")).as(s"top_${tag}_count"),
          sum(col("c")).as(s"total_${tag}s"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as(s"dup_${tag}_instances"))

    val base = documents.select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("non_space_chars"))

    base
      .join(gramStats(2, "bigram"), Seq("doc_id"))
      .join(gramStats(3, "trigram"), Seq("doc_id"))
      .withColumn("mean_token_len",
        col("non_space_chars").cast("double") / col("n_tokens"))
      .withColumn("top_bigram_share",
        col("top_bigram_count").cast("double") / col("total_bigrams"))
      .withColumn("dup_trigram_frac",
        col("dup_trigram_instances").cast("double") / col("total_trigrams"))
      .withColumn("keep",
        col("n_tokens").between(10L, 1000L) &&
          col("mean_token_len").between(2.0, 12.0) &&
          col("top_bigram_share") <= maxTopBigramShare &&
          col("dup_trigram_frac") <= maxDupTrigramFrac)
      .select("doc_id", "lang", "n_tokens", "mean_token_len",
        "top_bigram_count", "top_bigram_share",
        "dup_trigram_instances", "dup_trigram_frac", "keep")
  }

  /** Benchmark decontamination: flag training documents sharing word
    * n-grams with a held-out evaluation set (here: `source = evalSource`).
    *
    * Scale shape: the eval set is small by definition (a benchmark), so its
    * distinct n-gram set broadcasts; the training side is one explode of
    * per-doc DISTINCT grams followed by a broadcast-hash semi-probe and a
    * doc-grain re-aggregation — the corpus is never shuffled at gram grain
    * and never joined against itself. 100 TB-safe.
    */
  def decontaminate(documents: DataFrame, evalSource: String = "src0",
                    n: Int = 4): DataFrame = {
    val grams = expr(
      s"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
      s"j -> concat_ws(' ', slice(split(text, ' '), j, $n))))")

    val evalGrams = documents
      .filter(col("source") === evalSource)
      .select(explode(grams).as("gram"))
      .distinct()

    val trainDocs = documents.filter(col("source") =!= evalSource)

    val hits = trainDocs
      .select(col("doc_id"), explode(grams).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))

    trainDocs
      .select(col("doc_id"), col("source"),
        size(grams).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit_grams", coalesce(col("n_hit_grams"), lit(0L)))
      .withColumn("hit_ratio",
        col("n_hit_grams").cast("double") / col("n_grams"))
      .withColumn("is_contaminated", col("n_hit_grams") > 0L)
      .withColumn("severity",
        when(col("hit_ratio") >= 0.2, lit("high"))
          .when(col("n_hit_grams") > 0L, lit("low"))
          .otherwise(lit("clean")))
      .select("doc_id", "source", "n_grams", "n_hit_grams", "hit_ratio",
        "is_contaminated", "severity")
  }

  /** Decontamination for eval sets TOO BIG to broadcast exactly: a
    * count-min sketch of the eval grams (functions/CmsSketch.scala) acts
    * as a counting Bloom filter — `pointEstimate = 0` means the gram is
    * DEFINITELY absent from the eval set (CMS never undercounts), so the
    * sketch prunes the training gram stream map-side; only the surviving
    * sliver is exact-confirmed with a shuffle join, which removes the
    * sketch's false positives.
    *
    * The output is therefore bit-identical to [[decontaminate]] — the
    * sketch only changes WHERE the work happens: a 100M-gram eval suite
    * is ~GBs of strings broadcast exactly, but depth×width longs (default
    * 4×2^18 = 8 MB) as a sketch, and the gram-grain shuffle carries only
    * grams the sketch could not rule out instead of the whole corpus.
    * Same oracle as decontaminate (CurationSpec proves frame equality).
    */
  /** Threshold on the MinHash signature-agreement estimate above which a
    * train↔eval candidate pair counts as fuzzy contamination — an exact
    * literal mirrored by the oracle. */
  val FuzzyMinEst = "0.5"

  /** FUZZY decontamination: training docs ranked by WHOLE-DOCUMENT
    * similarity to the eval source — the severity signal any-overlap
    * exact decontamination lacks. Under [[decontaminate]], a doc sharing
    * one idiomatic 4-gram with an eval doc and a doc that is a wholesale
    * near-copy both read "contaminated"; the fuzzy estimate separates
    * them (incidental phrase overlap scores near 0, near-copies near 1),
    * which is what decides DROP vs keep-and-audit for each flagged doc.
    * Detection rides the SAME governed banded-LSH candidate join the
    * near-dup pipeline runs: cross-role (train↔eval) candidate pairs
    * with signature-agreement estimate ≥ [[FuzzyMinEst]] flag the
    * training side; every training doc reports its match count and best
    * estimate (left join — clean docs stay visible for accounting, the
    * decontaminate contract).
    *
    * Scale shape: the pair join is the governed LSH join (bucket-capped);
    * role lookup is two doc-grain joins; the rollup is train-doc grain.
    * Hash-exact: the estimate is integer signature agreement / 16, the
    * flag one literal-threshold compare. */
  def decontaminateFuzzy(documents: DataFrame,
                         evalSource: String = "src0"): DataFrame = {
    val roles = documents.select(col("doc_id"),
      (col("source") === evalSource).as("is_eval"))
    val crossPairs = MinHash.nearDupPairsWithSizes(documents)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .join(roles.select(col("doc_id").as("doc_a"), col("is_eval").as("eval_a")), "doc_a")
      .join(roles.select(col("doc_id").as("doc_b"), col("is_eval").as("eval_b")), "doc_b")
      .filter(col("eval_a") =!= col("eval_b"))
      .filter(col("est_jaccard") >= expr(s"CAST($FuzzyMinEst AS DOUBLE)"))
      .select(when(col("eval_a"), col("doc_b")).otherwise(col("doc_a")).as("doc_id"),
        col("est_jaccard"))
    val flagged = crossPairs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_neardups"),
        max(col("est_jaccard")).as("max_est_jaccard"))
    documents.filter(col("source") =!= evalSource)
      .select(col("doc_id"), col("source"))
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_eval_neardups"), lit(0L)).as("n_eval_neardups"),
        col("max_est_jaccard"),
        (coalesce(col("n_eval_neardups"), lit(0L)) > 0L).as("is_contaminated_fuzzy"))
  }

  /** DuckDB mirror of [[decontaminateFuzzy]] — rides the shared
    * candidate-pair CTE builder (governor included). */
  def decontaminateFuzzyOracleSql(evalSource: String = "src0"): String = {
    val agreement = (0 until MinHash.NumHashes)
      .map(i => s"(CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    MinHash.candidatePairsSqlCtes +
      s"""
         |, est AS (
         |  SELECT doc_a, doc_b,
         |    CAST($agreement AS DOUBLE) / CAST(${MinHash.NumHashes}.0 AS DOUBLE) AS est_jaccard
         |  FROM pairs JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id
         |), roles AS (
         |  SELECT doc_id, (source = '$evalSource') AS is_eval FROM documents
         |), cross_pairs AS (
         |  SELECT CASE WHEN ra.is_eval THEN e.doc_b ELSE e.doc_a END AS doc_id,
         |    e.est_jaccard
         |  FROM est e
         |  JOIN roles ra ON e.doc_a = ra.doc_id
         |  JOIN roles rb ON e.doc_b = rb.doc_id
         |  WHERE ra.is_eval <> rb.is_eval
         |    AND e.est_jaccard >= CAST($FuzzyMinEst AS DOUBLE)
         |), flagged AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_neardups,
         |    max(est_jaccard) AS max_est_jaccard
         |  FROM cross_pairs GROUP BY 1
         |)
         |SELECT d.doc_id, d.source,
         |  COALESCE(f.n_eval_neardups, 0) AS n_eval_neardups,
         |  f.max_est_jaccard,
         |  COALESCE(f.n_eval_neardups, 0) > 0 AS is_contaminated_fuzzy
         |FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
         |WHERE d.source <> '$evalSource'
         |ORDER BY d.doc_id""".stripMargin
  }

  def decontaminateSketch(documents: DataFrame, evalSource: String = "src0",
                          n: Int = 4, depth: Int = 4,
                          width: Int = 1 << 18): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    import graft.functions.Cms
    val grams = expr(
      s"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
      s"j -> concat_ws(' ', slice(split(text, ' '), j, $n))))")

    val evalGrams = documents
      .filter(col("source") === evalSource)
      .select(explode(grams).as("gram"))
      .distinct()
    // the fixed-size summary that replaces the exact gram broadcast
    val evalSketch = evalGrams.agg(
      expr(s"cms_sketch(gram, $depth, $width)").as("eval_sk"))

    val trainDocs = documents.filter(col("source") =!= evalSource)

    val candidates = trainDocs
      .select(col("doc_id"), explode(grams).as("gram"))
      .crossJoin(broadcast(evalSketch)) // one sketch row → map-side gate
      .filter(Cms.pointEstimate(col("eval_sk"), col("gram"), depth, width) > 0L)
      .select("doc_id", "gram")

    // exact confirm on the survivors only — false positives die here, so
    // the result is bit-identical to the broadcast-exact path
    val hits = candidates
      .join(evalGrams, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))

    trainDocs
      .select(col("doc_id"), col("source"),
        size(grams).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit_grams", coalesce(col("n_hit_grams"), lit(0L)))
      .withColumn("hit_ratio",
        col("n_hit_grams").cast("double") / col("n_grams"))
      .withColumn("is_contaminated", col("n_hit_grams") > 0L)
      .withColumn("severity",
        when(col("hit_ratio") >= 0.2, lit("high"))
          .when(col("n_hit_grams") > 0L, lit("low"))
          .otherwise(lit("clean")))
      .select("doc_id", "source", "n_grams", "n_hit_grams", "hit_ratio",
        "is_contaminated", "severity")
  }

  /** End-to-end corpus curation as ONE composed Spark plan — the cut
    * order every large pretraining corpus build runs (quality gate →
    * duplicate election → benchmark decontamination), emitted at
    * per-document audit grain so the final `kept` set is reproducible
    * and every exclusion names its reason:
    *
    *  1. Gopher hard quality rules ([[QualityRules.gopherQuality]]).
    *  2. Exact-dedup canonical election AMONG the quality survivors
    *     (min doc_id per content hash — dropping low-quality copies
    *     first, so a failing near-twin can never become canonical).
    *  3. Benchmark decontamination ([[decontaminate]]) against the
    *     held-out eval source.
    *
    * `kept = passes_gopher AND is_canonical AND NOT is_contaminated`.
    *
    * Scale shape: the corpus is read exactly THREE times, each a linear
    * pass — (1) one row-local projection computing quality evidence AND
    * the content hash together (a naive stage-per-subtree composition
    * plans 7 corpus scans — measured — because Catalyst reuses exchanges,
    * not scans); (2) the train-side gram explode for the decontamination
    * probe; (3) the eval-side gram scan (broadcast). Canonical election
    * is a WINDOW over the content-hash partition (min passing doc_id),
    * not a groupBy+self-join — dup groups are small, and it saves both a
    * scan and a join. The only shuffles: by content_hash (window), by
    * doc_id (hit counts join). */
  def curatePipeline(documents: DataFrame,
                     evalSource: String = "src0", n: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val train = documents.filter(col("source") =!= evalSource)
    val grams = expr(
      s"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
      s"j -> concat_ws(' ', slice(split(text, ' '), j, $n))))")
    val evalGrams = documents.filter(col("source") === evalSource)
      .select(explode(grams).as("gram")).distinct()
    val hits = train
      .select(col("doc_id"), explode(grams).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    val w = Window.partitionBy("content_hash")
    QualityRules.gopherQuality(train, keepText = true)
      .select(col("doc_id"), col("lang"), col("source"),
        col("passes_gopher"), md5(col("text")).as("content_hash"))
      .withColumn("canonical_doc_id",
        min(when(col("passes_gopher"), col("doc_id"))).over(w))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit_grams", coalesce(col("n_hit_grams"), lit(0L)))
      .withColumn("is_contaminated", col("n_hit_grams") > 0L)
      .withColumn("is_canonical",
        col("passes_gopher") && col("doc_id") === col("canonical_doc_id"))
      .withColumn("kept",
        col("passes_gopher") && col("is_canonical") && !col("is_contaminated"))
      .select("doc_id", "lang", "source", "content_hash", "passes_gopher",
        "canonical_doc_id", "is_canonical", "n_hit_grams",
        "is_contaminated", "kept")
  }
}
