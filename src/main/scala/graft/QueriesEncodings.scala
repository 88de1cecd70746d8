package graft

import graft.gold.{Attribution, DataQuality, Drift, Forensics, FraudSummary, Graph, Markov, Pipelines, Revenue, Rings, Seasonal, StarSchema}
import graft.ml.{Evaluation, FraudScore, GbtModel, TrainedModel}
import graft.multimodal.Multimodal
import graft.operators.{AsOfJoin, Bronze, Cleaning, Enrichment, Features, MergeUpsert, RangeJoin, Resample, Sessionize}
import graft.sim.Similarity
import graft.text.{Components, Dedup, MinHash, SimHash, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueriesShared._

/** Registry slice: encodings, incremental stores, sampling, retrieval fusion.
  * Split from the monolithic Queries.scala (r11) — a pure move with zero
  * behavior change; shared oracle CTE fragments live in [[QueriesShared]].
  */
private[graft] object QueriesEncodings {
  private[graft] lazy val defs: Seq[QueryDef] = Seq(

    // Weight-of-Evidence / Information-Value profile of the fraud label
    // across the categorical features — the classic credit-risk encoder.
    QueryDef("q_woe_encoding",
      (s, d) => {
        val enr = Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
        val base = enr
          .withColumn("user_avg_amount",
            operators.Features.winAvg(col("o_totalprice"), w))
          .withColumn("amount_vs_user_avg",
            col("o_totalprice") / col("user_avg_amount"))
          .withColumn("label", FraudScore.fraudLabel(col("amount_vs_user_avg"),
            col("region_risk"), col("amount_tier")).cast("long"))
        ml.Encodings.woe(base, "label", Seq(
            "amount_tier" -> col("amount_tier"),
            "order_dow" -> dayofweek(col("order_date")).cast("long"),
            "order_month" -> month(col("order_date")).cast("long"),
            "is_weekend" -> dayofweek(col("order_date")).isin(1, 7).cast("long")))
          .orderBy("feature", "category")
      },
      Some(EnrichedFeaturesCte +
        """
        |, base AS (
        |  SELECT amount_tier, order_dow, order_month, is_weekend,
        |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
        |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
        |  FROM fx
        |), stacked AS (
        |  SELECT 'amount_tier' AS feature, amount_tier AS category, label FROM base
        |  UNION ALL SELECT 'order_dow', CAST(order_dow AS VARCHAR), label FROM base
        |  UNION ALL SELECT 'order_month', CAST(order_month AS VARCHAR), label FROM base
        |  UNION ALL SELECT 'is_weekend', CAST(is_weekend AS VARCHAR), label FROM base
        |), bc AS (
        |  SELECT feature, category, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_bad
        |  FROM stacked GROUP BY 1, 2
        |), bc2 AS (
        |  SELECT *, CAST(n - n_bad AS BIGINT) AS n_good FROM bc
        |), pf AS (
        |  SELECT feature, CAST(sum(n_bad) AS BIGINT) AS bad_tot,
        |    CAST(sum(n_good) AS BIGINT) AS good_tot
        |  FROM bc2 GROUP BY 1
        |), sh AS (
        |  SELECT bc2.feature, bc2.category, bc2.n, bc2.n_bad, bc2.n_good,
        |    (CAST(bc2.n_bad AS DOUBLE) + 0.5) / CAST(pf.bad_tot AS DOUBLE) AS bad_share,
        |    (CAST(bc2.n_good AS DOUBLE) + 0.5) / CAST(pf.good_tot AS DOUBLE) AS good_share
        |  FROM bc2 JOIN pf USING (feature)
        |), wx AS (
        |  SELECT *, CAST(CAST(ln(bad_share / good_share) AS FLOAT) AS DOUBLE) AS woe FROM sh
        |)
        |SELECT feature, category, n, n_bad, n_good, woe,
        |  (bad_share - good_share) * woe AS iv_contrib
        |FROM wx ORDER BY feature, category""".stripMargin)),

    // Leakage-free K-fold out-of-fold target encoding of amount_tier:
    // the (category, fold) lookup table a scorer broadcast-joins at apply
    // time; each fold's encoding uses only the other folds' labels.
    QueryDef("q_target_encode",
      (s, d) => {
        val enr = Enrichment.enrichOrders(
          Cleaning.cleanOrders(Tables.orders(s, d)),
          Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
        val base = enr
          .withColumn("user_avg_amount",
            operators.Features.winAvg(col("o_totalprice"), w))
          .withColumn("amount_vs_user_avg",
            col("o_totalprice") / col("user_avg_amount"))
          .withColumn("label", FraudScore.fraudLabel(col("amount_vs_user_avg"),
            col("region_risk"), col("amount_tier")).cast("long"))
        ml.Encodings.targetEncodeOof(base, col("amount_tier"), "label",
            col("o_orderkey") % 5, m = 10.0)
          .orderBy("category", "fold")
      },
      Some(EnrichedFeaturesCte +
        """
        |, base AS (
        |  SELECT amount_tier AS category, o_orderkey % 5 AS fold,
        |    CAST((amount_vs_user_avg > 2.5 AND region_risk > 0.05)
        |         OR (amount_tier = 'premium' AND region_risk >= 0.09) AS BIGINT) AS label
        |  FROM fx
        |), g AS (
        |  SELECT category, CAST(fold AS BIGINT) AS fold,
        |    CAST(count(*) AS BIGINT) AS n_in_fold, CAST(sum(label) AS BIGINT) AS sum_in_fold
        |  FROM base GROUP BY 1, 2
        |), ct AS (
        |  SELECT category, CAST(sum(n_in_fold) AS BIGINT) AS n_cat,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_cat FROM g GROUP BY 1
        |), ft AS (
        |  SELECT fold, CAST(sum(n_in_fold) AS BIGINT) AS n_fold,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_fold FROM g GROUP BY 1
        |), gt AS (
        |  SELECT CAST(sum(n_in_fold) AS BIGINT) AS n_all,
        |    CAST(sum(sum_in_fold) AS BIGINT) AS sum_all FROM g
        |), pri AS (
        |  SELECT g.category, g.fold, g.n_in_fold,
        |    CAST(ct.n_cat - g.n_in_fold AS BIGINT) AS n_oof,
        |    CAST(ct.sum_cat - g.sum_in_fold AS BIGINT) AS sum_oof,
        |    CAST(gt.sum_all - ft.sum_fold AS DOUBLE)
        |      / CAST(gt.n_all - ft.n_fold AS DOUBLE) AS prior_oof
        |  FROM g JOIN ct USING (category) JOIN ft USING (fold) CROSS JOIN gt
        |)
        |SELECT category, fold, n_in_fold, n_oof, sum_oof, prior_oof,
        |  (CAST(sum_oof AS DOUBLE) + 10.0 * prior_oof)
        |    / (CAST(n_oof AS DOUBLE) + 10.0) AS encoding
        |FROM pri ORDER BY category, fold""".stripMargin)),

    // Hybrid retrieval: BM25 top-50 fused with cosine-ANN top-50 (query =
    // vec 0's embedding) by Reciprocal Rank Fusion, final top-20.
    QueryDef("q_hybrid_rrf",
      (s, d) => text.Hybrid.rrf(Tables.documents(s, d), Tables.embeddings(s, d),
          Bm25QueryTerms, queryVecId = 0L, kPerSide = 50, k = 20)
        .orderBy("rrf_rank"),
      Some(text.Bm25.oracleCtes(Bm25QueryTerms) +
        s"""
        |, lex AS (
        |  SELECT doc_id, bm25_rank FROM bm WHERE bm25_rank <= 50
        |), qv AS (
        |  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
        |), semscored AS (
        |  SELECT e.vec_id, ${cosSql("q.qvec", "e.embedding")} AS cos_sim
        |  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0
        |), sem AS (
        |  SELECT vec_id, cos_sim, sem_rank FROM (
        |    SELECT vec_id, cos_sim,
        |      row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS sem_rank
        |    FROM semscored) t WHERE sem_rank <= 50
        |), fused AS (
        |  SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id, l.bm25_rank, s.sem_rank, s.cos_sim,
        |    COALESCE(1.0 / (60.0 + CAST(l.bm25_rank AS DOUBLE)), 0.0)
        |      + COALESCE(1.0 / (60.0 + CAST(s.sem_rank AS DOUBLE)), 0.0) AS rrf_score
        |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
        |)
        |SELECT rrf_rank, doc_id, rrf_score, bm25_rank, sem_rank, cos_sim FROM (
        |  SELECT row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rrf_rank, *
        |  FROM fused) t WHERE rrf_rank <= 20 ORDER BY rrf_rank""".stripMargin)),

    // Hard-negative mining for contrastive retrieval training: per query,
    // the top-k most-similar vectors EXCLUDING near-duplicates (cos >=
    // 0.95), i.e. the highest-scoring wrong answers.
    QueryDef("q_hard_negatives",
      (s, d) => Similarity.hardNegatives(Tables.embeddings(s, d))
        .orderBy("query_id", "neg_rank"),
      Some(s"""WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id, e.label,
        |    ${cosSql("q.qv", "e.embedding")} AS cos_sim
        |  FROM embeddings e JOIN q ON e.vec_id != q.query_id
        |), fl AS (
        |  SELECT * FROM scored WHERE cos_sim < 0.95
        |), ranked AS (
        |  SELECT query_id, vec_id, label, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS neg_rank
        |  FROM fl
        |)
        |SELECT query_id, neg_rank, vec_id, label, cos_sim FROM ranked
        |WHERE neg_rank <= 10 ORDER BY query_id, neg_rank""".stripMargin)),

    // Leakage-free train/val/test split: the split key is the document's
    // DEDUP CLUSTER id, not the document id — every near-duplicate group
    // lands in one split, so eval can never contain a near-copy of a
    // training doc (the split-side complement of decontamination).
    // Quantifies the train->eval leakage a NAIVE per-doc hash split
    // incurs: every LSH near-dup candidate pair labeled with endpoint
    // splits + a crossing flag. The cluster-keyed split below is the fix
    // (its pairs can never cross: candidate pairs are intra-cluster).
    QueryDef("q_split_leakage_audit",
      (s, d) => MinHash.splitLeakageAudit(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(MinHash.splitLeakageOracleSql())),

    QueryDef("q_split_leakage_free",
      (s, d) => operators.Sampling.hashSplit(
          Components.dedupClusters(Tables.documents(s, d))
            .select(col("doc_id"), col("cluster_id")),
          col("cluster_id"), trainBp = 8000, valBp = 1000)
        .orderBy("doc_id"),
      Some(DedupClusterCtes +
        """
        |SELECT doc_id, cluster_id,
        |  CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS split_bp,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 9000 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM lab ORDER BY doc_id""".stripMargin)),

    // Deterministic per-epoch corpus shuffle: reproducible independent
    // permutations per training epoch, global position via the grouped
    // prefix-sum primitive.
    QueryDef("q_epoch_shuffle",
      (s, d) => operators.Sampling.epochShuffle(
          Tables.documents(s, d).select("doc_id"), col("doc_id"), epochs = 2)
        .select("epoch", "position", "doc_id")
        .orderBy("epoch", "position"),
      Some("""WITH e AS (
        |  SELECT doc_id, unnest([0, 1]) AS epoch FROM documents
        |), k AS (
        |  SELECT doc_id, epoch,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS sk
        |  FROM e
        |)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY sk, doc_id) AS BIGINT) AS position,
        |  doc_id
        |FROM k ORDER BY epoch, position""".stripMargin)),

    // Corpus accounting: the data-governance table per (lang, source) —
    // docs/tokens/chars, corpus-wide exact-dup share (hash-grain join,
    // never a text broadcast), and quality-bucket counts. All exact-int
    // aggregates; shares are int/int ratios formed once.
    // Duplicate-token inflation per source: tokens counted once per
    // distinct content hash vs total tokens — "how much of this crawl is
    // redundant bytes", the number that prices a dedup pass before
    // running it (within-source grain: a text shared across sources
    // counts once per source). Token def = ws_tokens (q_token_count).
    QueryDef("q_dedup_inflation",
      (s, d) => {
        val perHash = Tables.documents(s, d)
          .select(col("source"), md5(col("text")).as("h"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("copies"),
            sum(col("n_tokens")).as("tok_all"),
            min(col("n_tokens")).as("tok_once"))
        perHash.groupBy(col("source"))
          .agg(count(lit(1)).as("distinct_docs"),
            sum(col("copies")).as("total_docs"),
            sum(col("tok_all")).as("tokens_total"),
            sum(col("tok_once")).as("tokens_unique"))
          .withColumn("inflation",
            col("tokens_total").cast("double") / col("tokens_unique").cast("double"))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), ph AS (
        |  SELECT source, h, CAST(count(*) AS BIGINT) AS copies,
        |    CAST(sum(n_tokens) AS BIGINT) AS tok_all,
        |    CAST(min(n_tokens) AS BIGINT) AS tok_once
        |  FROM d GROUP BY 1, 2
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS distinct_docs,
        |  CAST(sum(copies) AS BIGINT) AS total_docs,
        |  CAST(sum(tok_all) AS BIGINT) AS tokens_total,
        |  CAST(sum(tok_once) AS BIGINT) AS tokens_unique,
        |  CAST(sum(tok_all) AS DOUBLE) / CAST(sum(tok_once) AS DOUBLE) AS inflation
        |FROM ph GROUP BY 1 ORDER BY source""".stripMargin)),

    QueryDef("q_corpus_accounting",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val quality = TextAnalysis.qualityScore(docs)
          .select("doc_id", "n_tokens", "quality_bucket")
        val hashed = docs.select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(col("text")).as("h"))
        val dupCounts = hashed.groupBy("h").agg(count(lit(1)).as("c"))
        hashed.join(dupCounts, "h")
          .withColumn("is_dup", col("c") > 1)
          .join(quality, "doc_id")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            sum(col("is_dup").cast("long")).as("dup_docs"),
            sum((col("quality_bucket") === "high").cast("long")).as("high_q_docs"),
            sum((col("quality_bucket") === "medium").cast("long")).as("med_q_docs"),
            sum((col("quality_bucket") === "low").cast("long")).as("low_q_docs"))
          .withColumn("dup_share", col("dup_docs").cast("double") / col("n_docs"))
          .withColumn("avg_tokens", col("n_tokens").cast("double") / col("n_docs"))
          .orderBy("lang", "source")
      },
      Some(QualityCtes +
        """
        |, d AS (
        |  SELECT doc_id, lang, source, n_chars, md5(text) AS h FROM documents
        |), hc AS (
        |  SELECT h, count(*) AS c FROM d GROUP BY 1
        |), f AS (
        |  SELECT d.doc_id, d.lang, d.source, d.n_chars, hc.c > 1 AS is_dup
        |  FROM d JOIN hc USING (h)
        |), j AS (
        |  SELECT f.lang, f.source, f.n_chars, f.is_dup, t3.n_tokens,
        |    CASE WHEN t3.quality_score >= 0.7 THEN 'high'
        |         WHEN t3.quality_score >= 0.4 THEN 'medium' ELSE 'low' END AS qb
        |  FROM f JOIN t3 ON f.doc_id = t3.doc_id
        |)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
        |  CAST(sum(CASE WHEN qb = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS high_q_docs,
        |  CAST(sum(CASE WHEN qb = 'medium' THEN 1 ELSE 0 END) AS BIGINT) AS med_q_docs,
        |  CAST(sum(CASE WHEN qb = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS low_q_docs,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_share,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Token-budget sampling: per-language corpus cut denominated in TOKENS
    // ("20k tokens of en"), walked in deterministic hash order via the
    // distributed grouped prefix sum (no per-language single-partition
    // window).
    QueryDef("q_sample_token_budget",
      (s, d) => operators.Sampling.sampleTokenBudget(
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          col("lang"), col("doc_id"), col("n_tokens"),
          Map("en" -> 6000L, "zh" -> 2000L), defaultBudget = 1500L)
        .select("doc_id", "lang", "n_tokens", "tokens_before")
        .orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS hbp
        |  FROM documents
        |), ps AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY hbp, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tokens, tokens_before FROM ps
        |WHERE tokens_before < CASE lang WHEN 'en' THEN 6000 WHEN 'zh' THEN 2000 ELSE 1500 END
        |ORDER BY doc_id""".stripMargin)),

    // Tokenizer-artifact persistence: train BPE merges once, publish
    // through the versioned registry, reload, and prove the reloaded
    // table tokenizes every document identically to the live one
    // (rows-only: the merge table is a learned artifact; CurationSpec
    // asserts table round-trip equality and all-docs token parity).
    QueryDef("q_bpe_reload",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val root = graft.util.Scratch.dir("graft-bpe-registry")
        val merges = text.Bpe.trainMerges(docs, numMerges = 64)
        val version = text.Bpe.saveMerges(s, merges, root)
        val live = text.Bpe.encode(docs, merges)
          .select(col("doc_id"), col("tokens").as("tokens_live"))
        val re = text.Bpe.encode(docs, text.Bpe.loadMerges(s, root))
          .select(col("doc_id"), col("tokens").as("tokens_reloaded"))
        live.join(re, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            lit(merges.length.toLong).as("n_merges"),
            lit(version).as("merges_version"),
            size(col("tokens_live")).cast("long").as("n_tokens_live"),
            size(col("tokens_reloaded")).cast("long").as("n_tokens_reloaded"),
            (col("tokens_live") <=> col("tokens_reloaded")).as("tokens_equal"))
          .orderBy("doc_id")
      },
      None),

    // Unigram-LM (SentencePiece-family) tokenizer: per-doc subword
    // accounting under a Viterbi-EM-trained piece table — the second
    // mainstream subword trainer next to BPE. Rows-only (learned
    // vocabulary; SURVEY §4 class 1): CurationSpec binds a hand-computed
    // EM step, word-grain round-trip, repartition/cross-path determinism,
    // and compression ≥ char-level.
    QueryDef("q_spm_tokens",
      (s, d) => text.SpmUnigram.tokenStats(Tables.documents(s, d),
          vocabSize = 512, emIters = 3)
        .orderBy("doc_id"),
      None),

    // Tokenizer coverage audit on the held-out split: unknown-piece
    // fallbacks, OOV rate, pieces-per-word off the training
    // distribution — the deploy-time health check for a shipped
    // tokenizer. Rows-only (learned vocabulary); CurationSpec plants a
    // never-seen character and binds the fallback accounting.
    QueryDef("q_spm_coverage",
      (s, d) => text.SpmUnigram.coverageStats(Tables.documents(s, d),
          vocabSize = 512, emIters = 3)
        .orderBy("doc_id"),
      None),

    // Unigram-tokenizer persistence: train, publish through the versioned
    // registry, reload, and prove the reloaded piece table tokenizes every
    // document identically (counts are stored as integers, so reloaded
    // log-probs rebuild bit-exactly — same contract as q_bpe_reload).
    QueryDef("q_spm_reload",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val root = graft.util.Scratch.dir("graft-spm-registry")
        val pieces = text.SpmUnigram.train(docs, vocabSize = 512, emIters = 3)
        val version = text.SpmUnigram.savePieces(s, pieces, root)
        val live = text.SpmUnigram.encode(docs, pieces)
          .select(col("doc_id"), col("tokens").as("tokens_live"))
        val re = text.SpmUnigram.encode(docs, text.SpmUnigram.loadPieces(s, root))
          .select(col("doc_id"), col("tokens").as("tokens_reloaded"))
        live.join(re, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            lit(pieces.length.toLong).as("n_pieces"),
            lit(version).as("pieces_version"),
            size(col("tokens_live")).cast("long").as("n_tokens_live"),
            size(col("tokens_reloaded")).cast("long").as("n_tokens_reloaded"),
            (col("tokens_live") <=> col("tokens_reloaded")).as("tokens_equal"))
          .orderBy("doc_id")
      },
      None),

    // WordPiece (BERT-family) tokenizer: likelihood-gain merges +
    // greedy longest-match encode — the third mainstream subword family
    // next to BPE (frequency merges) and unigram-LM (likelihood prune).
    // Per-doc fertility/UNK accounting. Rows-only (learned vocabulary,
    // SURVEY §4 class 1); CurationSpec binds a hand-computed scored
    // merge, max-munch encode, whole-word-UNK, driver≡distributed
    // training parity, and round-trip reconstruction.
    QueryDef("q_wordpiece_tokens",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = text.WordPiece.trainMerges(docs, numMerges = 64)
        text.WordPiece.tokenStats(docs, text.WordPiece.vocabulary(docs, merges))
          .orderBy("doc_id")
      },
      None),

    // WordPiece persistence: train, publish through the versioned
    // registry, reload, and prove the reloaded vocabulary tokenizes every
    // document identically — same contract as q_bpe_reload/q_spm_reload.
    QueryDef("q_wordpiece_reload",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val root = graft.util.Scratch.dir("graft-wp-registry")
        val merges = text.WordPiece.trainMerges(docs, numMerges = 64)
        val vocab = text.WordPiece.vocabulary(docs, merges)
        val version = text.WordPiece.saveVocab(s, merges, vocab, root)
        val live = text.WordPiece.encode(docs, vocab)
          .select(col("doc_id"), col("tokens").as("tokens_live"))
        val re = text.WordPiece.encode(docs, text.WordPiece.loadVocab(s, root))
          .select(col("doc_id"), col("tokens").as("tokens_reloaded"))
        live.join(re, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            lit(vocab.size.toLong).as("n_vocab"),
            lit(version).as("vocab_version"),
            size(col("tokens_live")).cast("long").as("n_tokens_live"),
            size(col("tokens_reloaded")).cast("long").as("n_tokens_reloaded"),
            (col("tokens_live") <=> col("tokens_reloaded")).as("tokens_equal"))
          .orderBy("doc_id")
      },
      None),

    // Cross-family tokenizer benchmark: whitespace / BPE / WordPiece /
    // unigram-LM trained on the 80% split, fertility + compression on
    // the held-out 20% per lang — the table a tokenizer decision comes
    // down to. Rows-only (three learned vocabularies, §4 class 1);
    // CurationSpec binds the whitespace fertility-1 floor and that every
    // learned family compresses below the char ceiling.
    QueryDef("q_tokenizer_bench",
      (s, d) => graft.text.TokenizerBench.fertility(Tables.documents(s, d))
        .orderBy("tokenizer", "lang"),
      None),

    // Robust-scaler preprocessing statistics: per-feature exact quartiles
    // (rank-interpolated, non-buffering) + decimal-exact mean/std + IQR —
    // the broadcast lookup for median/IQR feature scaling.
    QueryDef("q_robust_scaler",
      (s, d) => operators.Profiling.robustScaler(
          Cleaning.cleanLineitem(Tables.lineitem(s, d)),
          Seq("l_quantity" -> col("l_quantity"),
            "l_extendedprice" -> col("l_extendedprice"),
            "l_discount" -> col("l_discount")))
        .orderBy("feature"),
      Some(CleanLineitemCte +
        """
        |, stacked AS (
        |  SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS v FROM clean_lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM clean_lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM clean_lineitem
        |), agg AS (
        |  SELECT feature, CAST(count(*) AS BIGINT) AS n,
        |    min(v) AS min_v, max(v) AS max_v,
        |    CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s,
        |    CAST(CAST(sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s2,
        |    quantile_cont(v, 0.25) AS p25,
        |    quantile_cont(v, 0.5) AS median,
        |    quantile_cont(v, 0.75) AS p75
        |  FROM stacked WHERE v IS NOT NULL GROUP BY 1
        |)
        |SELECT feature, n, min_v, max_v,
        |  s / n AS mean,
        |  sqrt(s2 / n - (s / n) * (s / n)) AS std,
        |  p25, median, p75, p75 - p25 AS iqr
        |FROM agg ORDER BY feature""".stripMargin)),

    // Stored mergeable quantile sketches: per-day bottom-k-by-hash samples
    // of order amounts, merged to month grain WITHOUT re-scanning raw rows
    // (rows-only: xxhash64 priorities are engine-local; SketchesSpec binds
    // exact merge associativity and the estimate error vs exact).
    QueryDef("q_quantile_sketch",
      (s, d) => {
        val co = Cleaning.cleanOrders(Tables.orders(s, d))
          .withColumn("order_month", date_trunc("month", col("order_date")).cast("date"))
        val daily = gold.QuantileSketch.sketch(co,
          Seq("order_month", "order_date"), col("o_totalprice"), col("o_orderkey"))
        val monthly = gold.QuantileSketch.merge(daily, Seq("order_month"))
        gold.QuantileSketch.estimate(monthly,
            Seq("est_p50" -> 0.5, "est_p90" -> 0.9, "est_p99" -> 0.99))
          .select("order_month", "n_rows", "sample_size",
            "est_p50", "est_p90", "est_p99")
          .orderBy("order_month")
      },
      None),

    // Incremental SCD2 maintenance: history built from pre-cutoff days,
    // then the post-cutoff days applied via Scd.scd2Apply at stored-version
    // grain — and the DuckDB oracle is the BATCH scd2 over all days, so the
    // hash gate itself proves incremental ≡ from-scratch.
    QueryDef("q_scd2_incremental",
      (s, d) => {
        val cutoff = lit("1997-06-01").cast("date")
        val daily = Cleaning.cleanOrders(Tables.orders(s, d))
          .repartition(col("o_custkey"))
          .groupBy("o_custkey", "order_date")
          .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
        val existing = operators.Scd.scd2(daily.filter(col("order_date") < cutoff),
          "o_custkey", "order_date", Seq("amount_tier"))
        operators.Scd.scd2Apply(existing, daily.filter(col("order_date") >= cutoff),
            "o_custkey", "order_date", Seq("amount_tier"))
          .select("o_custkey", "version", "amount_tier", "valid_from",
            "last_observed", "observation_count", "valid_to", "is_current")
          .orderBy("o_custkey", "version")
      },
      Some(Scd2VersionCtes +
        """
        |SELECT o_custkey, version, amount_tier, valid_from, last_observed, observation_count,
        |  COALESCE(lead(valid_from) OVER wv, DATE '9999-12-31') AS valid_to,
        |  lead(valid_from) OVER wv IS NULL AS is_current
        |FROM coll WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        |ORDER BY o_custkey, version""".stripMargin))
  )
}
