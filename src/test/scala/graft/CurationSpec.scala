package graft

import graft.text.{Curation, ExactSubstr, Packing, UnigramLm}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: repetition gate, decontamination, sequence
  * packing, unigram-LM scoring. */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, TinySf)

  test("repetitionStats flags a synthetic repetitious doc and keeps clean text") {
    import spark.implicits._
    val synth = Seq(
      (1L, ("spam ham " * 40).trim, "en"),                       // one bigram dominates
      (2L, (1 to 80).map(i => s"w$i").mkString(" "), "en"),      // all-distinct, clean
      (3L, "short text", "en")                                   // under token floor
    ).toDF("doc_id", "text", "lang")
    val out = Curation.repetitionStats(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Double]("top_bigram_share") > 0.4)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(!out(3L).getAs[Boolean]("keep"))
  }

  test("decontaminate never misses a verbatim copy of an eval doc") {
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val synth = Seq(
      (1L, evalText, "src0"),                                  // the benchmark doc
      (2L, "prefix words " + evalText, "src1"),                // verbatim leak
      (3L, "totally different content with no overlap at all", "src1")
    ).toDF("doc_id", "text", "source")
    val out = Curation.decontaminate(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[Boolean]("is_contaminated"))
    assert(out(2L).getAs[String]("severity") == "high")
    assert(!out(3L).getAs[Boolean]("is_contaminated"))
    assert(!out.contains(1L)) // eval docs are not training rows
  }

  test("decontaminateSketch is bit-identical to the broadcast-exact path " +
    "and its CMS gate actually prunes") {
    val docs = Tables.documents(spark, TinySf)
    val exact = Curation.decontaminate(docs).orderBy("doc_id").collect()
    val sketch = Curation.decontaminateSketch(docs).orderBy("doc_id").collect()
    // the sketch can only PRUNE work (no false negatives + exact confirm),
    // never change the answer — every cell must match, bit for bit
    assert(exact.length == sketch.length && exact.nonEmpty)
    exact.zip(sketch).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    assert(exact.exists(_.getAs[Boolean]("is_contaminated")),
      "corpus must contain contamination for the parity to be meaningful")

    // the gate must rule out a real share of train grams map-side — that
    // pruning is the entire point vs the exact broadcast (recompute it
    // standalone: estimate 0 = definitely not an eval gram)
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.Cms
    val (depth, width) = (4, 1 << 18)
    val grams = expr(
      "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 3, 1)), " +
      "j -> concat_ws(' ', slice(split(text, ' '), j, 4))))")
    val evalSketch = docs.filter(col("source") === "src0")
      .select(explode(grams).as("gram")).distinct()
      .agg(expr(s"cms_sketch(gram, $depth, $width)").as("sk"))
    val gate = docs.filter(col("source") =!= "src0")
      .select(explode(grams).as("gram"))
      .crossJoin(broadcast(evalSketch))
      .agg(count(lit(1)).as("total"),
        sum(when(Cms.pointEstimate(col("sk"), col("gram"), depth, width) > 0L,
          1L).otherwise(0L)).as("survived"))
      .collect()(0)
    val (total, survived) = (gate.getAs[Long]("total"), gate.getAs[Long]("survived"))
    assert(survived < total,
      s"CMS gate pruned nothing ($survived of $total grams survived)")
  }

  test("exact-substring spans recover planted verbatim passages at exact offsets") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"dup$i").mkString(" ")
    def filler(d: Int, n: Int, off: Int) =
      (0 until n).map(i => s"d${d}t${off + i}").mkString(" ")
    val synth = Seq(
      (1L, s"${filler(1, 10, 0)} $shared ${filler(1, 9, 10)}"), // span [10, 22)
      (2L, s"${filler(2, 3, 0)} $shared ${filler(2, 20, 3)}"),  // span [3, 15)
      (3L, filler(3, 40, 0))                                    // clean
    ).toDF("doc_id", "text")
    val spans = ExactSubstr.duplicateSpans(synth).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
          r.getAs[Long]("span_tokens"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Long]("max_docs_sharing")))).toMap
    // a 12-token shared passage under l=8 yields 5 duplicated 8-grams
    // merging into ONE span that reconstructs the passage boundaries
    assert(spans.keySet == Set(1L, 2L), s"spans for wrong docs: $spans")
    assert(spans(1L) == ((10L, 22L, 12L, 5L, 2L)), spans(1L).toString)
    assert(spans(2L) == ((3L, 15L, 12L, 5L, 2L)), spans(2L).toString)

    // the real corpus: spans must agree with the exact gram-string
    // pipeline (the hash stands in for string equality)
    val byHash = ExactSubstr.duplicateSpans(docs).orderBy("doc_id", "span_start")
    assert(byHash.count() > 0, "testdata corpus should contain verbatim dups")
  }

  test("curation pipeline: every exclusion names its stage, canonical election ignores failing twins") {
    import spark.implicits._
    // 60-word quality-passing body with stop words
    val good = (("the data and that value have with be to of " +
      "rows tables joins scans merges sorts groups filters windows streams ") * 3).trim
    val short = "the and that have with to be of"
    val evalText = (0 until 60).map(i => s"eval$i").mkString(" ") +
      " the and that have with of to be"
    val contaminated = good + " " + (0 until 10).map(i => s"eval$i").mkString(" ")
    val synth = Seq(
      (0L, evalText, "src0"),         // the eval doc (held out)
      (1L, good, "src1"),             // canonical survivor
      (2L, good, "src1"),             // exact duplicate -> dropped as non-canonical
      (3L, short, "src1"),            // fails quality
      (4L, contaminated, "src1"),     // passes quality, shares eval 4-grams
      (5L, short, "src1")             // failing twin of 3 (same hash): neither canonical
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))

    val out = Curation.curatePipeline(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "train docs only")
    assert(out(1L).getAs[Boolean]("kept"), "canonical clean survivor must be kept")
    // duplicate: passes quality but loses the canonical election to doc 1
    assert(out(2L).getAs[Boolean]("passes_gopher"))
    assert(!out(2L).getAs[Boolean]("is_canonical") && !out(2L).getAs[Boolean]("kept"))
    assert(out(2L).getAs[Long]("canonical_doc_id") == 1L)
    // quality failure: never canonical even though its hash group has no passer
    assert(!out(3L).getAs[Boolean]("passes_gopher") && !out(3L).getAs[Boolean]("kept"))
    assert(!out(3L).getAs[Boolean]("is_canonical") && !out(5L).getAs[Boolean]("is_canonical"))
    // contamination: quality-canonical but flagged by the eval gram probe
    assert(out(4L).getAs[Boolean]("passes_gopher") && out(4L).getAs[Boolean]("is_canonical"))
    assert(out(4L).getAs[Boolean]("is_contaminated") && !out(4L).getAs[Boolean]("kept"))
    assert(out(4L).getAs[Long]("n_hit_grams") >= 7L) // 10 planted eval words -> 7 shared 4-grams

    // corpus invariants: kept implies all three stage gates
    Curation.curatePipeline(docs).collect().foreach { r =>
      if (r.getAs[Boolean]("kept")) {
        assert(r.getAs[Boolean]("passes_gopher") && r.getAs[Boolean]("is_canonical")
          && !r.getAs[Boolean]("is_contaminated"))
      }
    }
  }

  test("exactConfirm parity: string-confirmed spans equal hash-only spans on a collision-free corpus") {
    // 64-bit hashes don't collide at testdata scale, so the confirm
    // re-join must be a no-op — bit-identical output, flag on vs off
    val cols = Seq("doc_id", "span_start", "span_end", "span_tokens",
      "n_dup_grams", "max_docs_sharing")
    val hashOnly = ExactSubstr.duplicateSpans(docs)
      .orderBy("doc_id", "span_start").select(cols.head, cols.tail: _*).collect()
    val confirmed = ExactSubstr.duplicateSpans(docs, exactConfirm = true)
      .orderBy("doc_id", "span_start").select(cols.head, cols.tail: _*).collect()
    assert(hashOnly.nonEmpty, "corpus should contain verbatim dups")
    assert(hashOnly.toSeq == confirmed.toSeq,
      "exactConfirm changed output on a collision-free corpus")
  }

  test("exactConfirm catches hash collisions the hash-only path misreports") {
    import spark.implicits._
    // force collisions with a deliberately 1-bit hash space: every gram
    // of the two UNRELATED docs collides with something in the other
    val narrow = (g: String) => s"pmod(xxhash64($g), 2)"
    val shared = (0 until 12).map(i => s"dup$i").mkString(" ")
    val synth = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ")),          // unrelated
      (2L, (0 until 30).map(i => s"b$i").mkString(" ")),          // unrelated
      (3L, s"head3a head3b $shared tail3"),                       // true dup [2,14)
      (4L, s"$shared tail4a tail4b tail4c")                       // true dup [0,12)
    ).toDF("doc_id", "text")
    val falsePos = ExactSubstr
      .duplicateSpansHashed(synth, 8, 2, exactConfirm = false, narrow)
      .filter(col("doc_id").isin(1L, 2L)).count()
    assert(falsePos > 0,
      "narrow hash produced no collisions — the test premise is broken")
    val confirmed = ExactSubstr
      .duplicateSpansHashed(synth, 8, 2, exactConfirm = true, narrow)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))))
    // the collision spans on docs 1/2 are gone; the REAL shared passage
    // survives the string re-check at its exact offsets
    assert(confirmed.map(_._1).toSet == Set(3L, 4L),
      s"confirm kept wrong docs: ${confirmed.toSeq.sortBy(_._1)}")
    assert(confirmed.toMap == Map(3L -> ((2L, 14L)), 4L -> ((0L, 12L))))
  }

  test("spliceSpans cuts exactly the duplicated passages and nothing else") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"dup$i").mkString(" ")
    def filler(d: Int, n: Int, off: Int) =
      (0 until n).map(i => s"d${d}t${off + i}").mkString(" ")
    val doc1Pre = filler(1, 10, 0); val doc1Post = filler(1, 9, 10)
    val doc2Pre = filler(2, 3, 0);  val doc2Post = filler(2, 20, 3)
    val clean = filler(3, 40, 0)
    val synth = Seq(
      (1L, s"$doc1Pre $shared $doc1Post"),
      (2L, s"$doc2Pre $shared $doc2Post"),
      (3L, clean)
    ).toDF("doc_id", "text")
    val out = ExactSubstr.spliceSpans(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the shared passage is spliced from BOTH carriers at exact bounds
    assert(out(1L).getAs[String]("clean_text") == s"$doc1Pre $doc1Post")
    assert(out(2L).getAs[String]("clean_text") == s"$doc2Pre $doc2Post")
    assert(out(1L).getAs[Long]("removed_tokens") == 12L)
    assert(out(1L).getAs[Long]("spans_cut") == 1L)
    // the clean doc passes through byte-identical with zero cuts
    assert(out(3L).getAs[String]("clean_text") == clean)
    assert(out(3L).getAs[Long]("spans_cut") == 0L)
    // conservation: kept + removed == orig, on every row
    out.values.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("removed_tokens")
        == r.getAs[Long]("orig_tokens"))
    }
  }

  test("mixtureSample hits per-lang quotas exactly and is deterministic") {
    import graft.text.Mixture
    val out = Mixture.mixtureSample(docs).cache()
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // testdata langs all have ≥ quota docs at sf0.001+, so counts are exact
    val quotas = Mixture.DefaultTargets.map { case (g, f) =>
      g -> math.floor(200 * f).toLong }
    assert(byLang == quotas, s"got $byLang, want $quotas")
    // seedless determinism: a second draw is the identical corpus
    val again = Mixture.mixtureSample(docs)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // hash-rank actually mixes: the draw is not a doc_id prefix
    val en = out.filter(col("lang") === "en")
    val maxId = en.agg(max("doc_id")).head().getLong(0)
    val n = en.count()
    assert(maxId > n, s"en draw looks like a doc_id prefix (max $maxId, n $n)")
    out.unpersist()
  }

  test("packSequences covers every token exactly once, in order, within capacity") {
    val cap = 128
    val packed = Packing.packSequences(docs, cap).cache()
    try {
      // every doc's slices reassemble the doc: contiguous offsets, full count
      val perDoc = packed.groupBy("doc_id")
        .agg(sum("tokens_in_seq").as("tok_sum"),
          max("n_tokens").as("n_tokens"),
          min("doc_offset").as("first_off"))
        .collect()
      perDoc.foreach { r =>
        assert(r.getAs[Long]("tok_sum") == r.getAs[Long]("n_tokens"))
        assert(r.getAs[Long]("first_off") == 0L)
      }
      // every sequence except the last per lang is filled to exactly capacity
      val perSeq = packed.groupBy("lang", "seq_idx")
        .agg(sum("tokens_in_seq").as("fill"))
      val lastSeq = perSeq.groupBy("lang").agg(max("seq_idx").as("last"))
      val under = perSeq.join(lastSeq, Seq("lang"))
        .filter(col("seq_idx") =!= col("last") && col("fill") =!= cap.toLong)
      assert(under.count() == 0)
      // positions never exceed capacity
      assert(packed.filter(col("pos_in_seq") + col("tokens_in_seq") > cap.toLong)
        .count() == 0)
    } finally packed.unpersist()
  }

  test("packSequences output is invariant to docsPerBucket (distributed scan == single window)") {
    val ord = Seq("lang", "seq_idx", "pos_in_seq", "doc_id").map(col)
    val one = Packing.packSequences(docs, 128, docsPerBucket = Long.MaxValue)
      .orderBy(ord: _*).collect().toSeq // single bucket == the naive per-lang window
    Seq(1L, 7L, 100L).foreach { b =>
      val got = Packing.packSequences(docs, 128, docsPerBucket = b)
        .orderBy(ord: _*).collect().toSeq
      assert(got == one, s"docsPerBucket=$b diverged")
    }
  }

  test("packSequences plans no per-lang window over the document grain") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = Packing.packSequences(docs, 128, docsPerBucket = 100L)
    val wins = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val parts = w.partitionSpec.map(_.toString).mkString(",")
      // doc-grain scan is sharded by (lang, bucket); the lang-only window
      // may only ever sit over the bucket-grain carry frame
      if (!parts.contains("bucket"))
        assert(w.child.toString.contains("bucket_tokens"),
          s"lang-only window over doc grain: ${w.child.toString.take(400)}")
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("packSequences tokenizes the corpus once: carry branch reuses the shard exchange") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Packing.packSequences(Tables.documents(spark, TinySf), 128, docsPerBucket = 100L)
      val plan = df.queryExecution.executedPlan
      // both the local-scan branch and the carry branch hang off the same
      // (lang, bucket) exchange; the second consumer must be a ReusedExchange,
      // and the expensive scan+tokenize below it must appear exactly once
      assert(plan.toString.contains("ReusedExchange"), plan.toString.take(1200))
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1, s"documents scanned ${scans.size}x")
      // no FORCED broadcast on the carry join: the logical plan must carry
      // no join hint, leaving broadcast-vs-shuffle to statistics (carry
      // cardinality grows with the corpus, so a forced broadcast is a
      // latent OOM; a stats-chosen broadcast at tiny scale is correct)
      val hints = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hints.isEmpty, s"join hint present: $hints")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("unigram LM joins the vocabulary by shuffle, never broadcast") {
    val df = UnigramLm.docLogProb(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the token-grain vocab join must be a shuffle join; the only broadcast
    // allowed is the single-row corpus total. Unwrap the adaptive plan —
    // collecting over the AdaptiveSparkPlanExec wrapper itself sees a leaf
    // and the guard is vacuous.
    val nodes = allNodes(df.queryExecution.executedPlan)
    val broadcasts = nodes.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(nodes.exists {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }, "no shuffle join found in the finalized plan")
    broadcasts.foreach { b =>
      assert(!b.leftKeys.exists(_.toString.contains("token")) &&
        !b.rightKeys.exists(_.toString.contains("token")),
        s"vocab broadcast-joined: ${b.toString.take(400)}")
    }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(800))
  }

  test("bigram LM penalizes shuffled word order that unigram scoring cannot see") {
    import spark.implicits._
    // Both docs use EXACTLY the same multiset of words; doc 2 repeats the
    // corpus-dominant bigram sequence, doc 1 scrambles it. A unigram LM
    // scores them identically; the bigram LM must rank doc 2 higher. Docs
    // 3..8 establish "the quick brown fox" as the dominant word order.
    val phrase = "the quick brown fox"
    val docs = (
      Seq((1L, "fox the brown quick"), (2L, phrase)) ++
      (3L to 8L).map(i => (i, phrase))
    ).toDF("doc_id", "text")
    val bi = graft.text.BigramLm.docLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(bi(2L) > bi(1L), s"ordered ${bi(2L)} !> shuffled ${bi(1L)}")
    val uni = graft.text.UnigramLm.docLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(uni(1L) == uni(2L), "unigram must be order-blind on equal multisets")
    // Token accounting: every real token scored exactly once.
    val n = graft.text.BigramLm.docLogProb(docs)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(n == 8 * 4)
  }

  test("perplexity buckets: fluent docs lead, scrambles land tail, terciles exact") {
    import spark.implicits._
    // 9 docs: 6 fluent (dominant word order) + 3 scrambles of the SAME
    // word multiset — scrambled order is what the bigram LM penalizes
    // (an all-rare-token doc would self-predict under a same-corpus LM:
    // c_bi == c_left → conditional prob 1 — the reason CCNet trains its
    // LM on a reference corpus; the bucket mechanics are what this test
    // binds). Tercile cut: 3 head / 3 middle / 3 tail, scrambles last.
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = (
      (1L to 6L).map(i => (i, phrase)) ++ Seq(
        (7L, "fox the brown quick dog lazy the over jumps"),
        (8L, "over dog the jumps quick lazy fox the brown"),
        (9L, "dog fox quick the brown the jumps lazy over"))
    ).toDF("doc_id", "text")
    val out = graft.text.BigramLm.pplBuckets(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ppl_rank"), r.getAs[String]("bucket"))).toMap
    assert(out.size == 9)
    // rank is a 1..9 permutation
    assert(out.values.map(_._1).toSeq.sorted == (1L to 9L).toSeq)
    // exact tercile sizes
    val sizes = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes == Map("head" -> 3, "middle" -> 3, "tail" -> 3), sizes.toString)
    // dominant-order docs fill head+middle; all three scrambles are tail
    assert(out(1L)._2 == "head")
    Seq(7L, 8L, 9L).foreach { d =>
      assert(out(d)._2 == "tail", s"scrambled doc $d bucketed ${out(d)}")
    }
    // bucket is monotone in rank: every head rank < every middle rank < tail
    def ranksOf(b: String) = out.values.collect { case (r, `b`) => r }
    assert(ranksOf("head").max < ranksOf("middle").min)
    assert(ranksOf("middle").max < ranksOf("tail").min)
  }

  test("split-leakage audit flags a planted cross-split near-dup; cluster split never crosses") {
    import spark.implicits._
    import graft.operators.Sampling
    // choose two doc_ids the NAIVE per-doc split sends to different
    // splits (computed, not assumed)
    val probe = Sampling.hashSplit(
        (0L until 100L).toDF("doc_id"), col("doc_id"), 8000, 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainId = probe.collectFirst { case (id, "train") => id }.get
    val testId = probe.collectFirst { case (id, "test") => id }.get
    val dupText = (0 until 30).map(i => s"shared$i").mkString(" ")
    def filler(d: Long) = (0 until 30).map(i => s"only${d}x$i").mkString(" ")
    val others = (200L to 205L).map(i => (i, filler(i)))
    val docs = (Seq((trainId, dupText), (testId, dupText)) ++ others)
      .toDF("doc_id", "text")

    val audit = graft.text.MinHash.splitLeakageAudit(docs).collect()
    val crossing = audit.filter(_.getAs[Boolean]("crosses_split"))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(crossing.contains((math.min(trainId, testId), math.max(trainId, testId))),
      s"planted train/test near-dup not flagged: ${audit.mkString(", ")}")

    // the cluster-keyed split (q_split_leakage_free) cannot leak: both
    // endpoints of every audited pair share a cluster, hence a split
    val clusterSplit = Sampling.hashSplit(
        graft.text.Components.dedupClusters(docs.withColumn("lang", lit("en")))
          .select(col("doc_id"), col("cluster_id")),
        col("cluster_id"), 8000, 1000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    audit.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(clusterSplit(a) == clusterSplit(b),
        s"cluster-keyed split separated near-dup pair ($a,$b)")
    }
  }

  test("containment pairs: subset docs classify asymmetrically, dups stay duplicate") {
    import spark.implicits._
    val core = (0 until 40).map(i => s"core$i").mkString(" ")
    val extra = (0 until 12).map(i => s"extra$i").mkString(" ")
    val synth = Seq(
      (1L, core + " " + extra), // superset: B's tokens + 12 new types
      (2L, core),               // subset — contained in doc 1
      (3L, core + " " + extra), // exact duplicate of doc 1
      (4L, (0 until 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.text.MinHash.containmentPairs(synth).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // exact duplicate pair (1,3): jaccard 1 → duplicate
    assert(out.contains((1L, 3L)), s"dup pair not a candidate: ${out.keySet}")
    assert(out((1L, 3L)).getAs[String]("relation") == "duplicate")
    // subset pair: doc 2's vocab fully inside doc 1, jaccard 40/52 < 0.9
    assert(out.contains((1L, 2L)), s"subset pair not a candidate: ${out.keySet}")
    val sub = out((1L, 2L))
    assert(sub.getAs[Double]("contain_b") == 1.0)
    assert(sub.getAs[Double]("exact_jaccard") < 0.9)
    assert(sub.getAs[String]("relation") == "b_in_a", sub.toString)
    // every row's relation re-derives from its own numbers
    out.values.foreach { r =>
      val (j, ca, cb) = (r.getAs[Double]("exact_jaccard"),
        r.getAs[Double]("contain_a"), r.getAs[Double]("contain_b"))
      val expect =
        if (j >= 0.9) "duplicate"
        else if (ca >= 0.9 && ca >= cb) "a_in_b"
        else if (cb >= 0.9) "b_in_a"
        else "overlap"
      assert(r.getAs[String]("relation") == expect, r.toString)
    }
  }

  test("vocab growth: novelty accounting is exact and the curve is monotone") {
    import spark.implicits._
    val synth = Seq(
      (1L, "a b c"),        // 3 tokens, 3 new types
      (2L, "a b d d"),      // 4 tokens, 1 new type (d)
      (3L, "a a a"),        // 3 tokens, 0 new types
      (4L, "e")             // 1 token, 1 new type
    ).toDF("doc_id", "text")
    val rows = graft.text.TextAnalysis.vocabGrowth(synth)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, 3L, 3L, 3L, 3L),
      (2L, 4L, 1L, 7L, 4L),
      (3L, 3L, 0L, 10L, 4L),
      (4L, 1L, 1L, 11L, 5L)))
    // real corpus: final cum_types == corpus distinct-token count, curve monotone
    val out = graft.text.TextAnalysis.vocabGrowth(docs).orderBy("doc_id").collect()
    val vocab = docs.select(explode(expr(
        "filter(split(text, ' '), t -> t <> '')")).as("t"))
      .distinct().count()
    assert(out.last.getAs[Long]("cum_types") == vocab)
    out.sliding(2).foreach { case Array(p, c) =>
      assert(c.getAs[Long]("cum_tokens") > p.getAs[Long]("cum_tokens"))
      assert(c.getAs[Long]("cum_types") >= p.getAs[Long]("cum_types"))
    }
  }

  test("unigram LM: rare-token docs score lower than common-token docs") {
    import spark.implicits._
    val synth = (Seq((1L, "the the the the the the the the"),
      (2L, "qzx wvu rrr qzx wvu rrr qzx wvu")) ++
      (3L to 40L).map(i => (i, "the and of to in a is on the and of to")))
      .toDF("doc_id", "text")
    val out = UnigramLm.docLogProb(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    assert(out(1L) > out(2L)) // common tokens -> higher (less negative) logprob
  }

  test("unigram LM micro-nat quantization bounds the score error") {
    // sum_lp_micro / 1e6 / n within 2e-6 nat/token of a direct double calc
    val out = UnigramLm.docLogProb(docs)
    val direct = out.withColumn("reconstructed",
      col("sum_lp_micro").cast("double") / lit(1e6) / col("n_tokens"))
    val drift = direct.filter(abs(col("reconstructed") - col("avg_logprob")) > 1e-12)
    assert(drift.count() == 0)
    assert(out.filter(col("avg_logprob") >= 0.0).count() == 0)
  }

  test("PII scrub replaces emails/phones/IPs with typed placeholders and counts them") {
    import spark.implicits._
    val synth = Seq(
      (1L, "contact alice.smith+x@example.co.uk or 555-123-4567 now"),
      (2L, "server at 192.168.1.10 and 10.0.0.1 answered"),
      (3L, "totally clean text with no identifiers"),
      (4L, "two mails a@b.io c@d.org one phone 800 555 1234"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synthetic"))
    val out = graft.text.PiiScrub.scrub(synth).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3), r.getInt(4), r.getInt(5), r.getInt(6)))
    assert(out(0)._2 == "contact <EMAIL> or <PHONE> now")
    assert(out(0)._3 == 1 && out(0)._4 == 1 && out(0)._5 == 0)
    assert(out(1)._2 == "server at <IP> and <IP> answered")
    assert(out(1)._5 == 2)
    assert(out(2)._2 == "totally clean text with no identifiers")
    assert(out(2)._3 + out(2)._4 + out(2)._5 == 0)
    assert(out(3)._2 == "two mails <EMAIL> <EMAIL> one phone <PHONE>")
    assert(out(3)._3 == 2 && out(3)._4 == 1)
  }

  test("incremental band store: delta probe equals full recompute filtered to delta pairs") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft-band-test").toString + "/bands"
    val old = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    graft.text.MinHash.buildBandStore(old, store)
    graft.text.MinHash.appendBandStore(delta, store)
    val incr = graft.text.MinHash
      .incrementalNearDups(spark, store, col("doc_id") % 10 === 7)
      .as[(Long, Long)].collect().toSet
    // Ground truth: capped full-corpus candidate pairs, restricted to
    // pairs with at least one delta doc (the exact contract the oracle
    // re-states in SQL).
    val deltaIds = delta.select("doc_id").as[Long].collect().toSet
    val full = graft.text.MinHash.nearDupPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) => deltaIds(a) || deltaIds(b) }
    assert(incr == expected, s"incr ${incr.size} vs expected ${expected.size}")
    // No old-only pairs leak into the delta probe.
    assert(incr.forall { case (a, b) => deltaIds(a) || deltaIds(b) })
    // Appending never rewrites existing store rows: the store row count is
    // the sum of the two writes (pure per-doc band fan-out).
    val bandRows = spark.read.parquet(store).count()
    val expectedRows = docs.count() * graft.text.MinHash.Bands
    assert(bandRows == expectedRows)
  }

  test("source reputation drops boilerplate and stub domains, keeps clean ones") {
    import spark.implicits._
    val boiler = "copy of the same page body repeated verbatim across the mirror"
    val synth = (
      // srcA: clean — distinct, long docs
      (1 to 6).map(i => (i.toLong, s"unique long document number $i with plenty of genuine content to pass", "en", "srcA")) ++
      // srcB: boilerplate mirror — all docs identical
      (11 to 16).map(i => (i.toLong, boiler, "en", "srcB")) ++
      // srcC: stub farm — short docs
      (21 to 26).map(i => (i.toLong, s"stub $i", "en", "srcC")) ++
      // srcD: clean but one doc is a cross-source copy of srcB's page
      Seq((31L, boiler, "en", "srcD")) ++
      (32 to 36).map(i => (i.toLong, s"independent editorial piece $i long enough to look like real content here", "en", "srcD"))
    ).toDF("doc_id", "text", "lang", "source")
    val rep = graft.text.SourceReputation
      .sourceReputation(synth, dupShareMax = 0.5, minAvgChars = 20.0, minChars = 15)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rep("srcA").getAs[Boolean]("keep"))
    assert(!rep("srcB").getAs[Boolean]("keep"))          // dup_share = 1.0
    assert(rep("srcB").getAs[Double]("dup_share") == 1.0)
    assert(!rep("srcC").getAs[Boolean]("keep"))          // avg_chars below floor
    // srcD: 1 of 6 docs is a cross-source copy → dup_share 1/6, kept.
    assert(rep("srcD").getAs[Boolean]("keep"))
    assert(rep("srcD").getAs[Double]("dup_share") == 1.0 / 6.0)
    // Document-level filter keeps exactly the surviving sources' docs.
    val kept = graft.text.SourceReputation
      .filterBySource(synth, dupShareMax = 0.5, minAvgChars = 20.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == ((1 to 6) ++ (31 to 36)).map(_.toLong).toSet)
  }

  test("BPE training reproduces the textbook merge sequence on the Sennrich corpus") {
    import spark.implicits._
    // Sennrich et al. 2016 §3.2 example vocabulary: low×5, lower×2,
    // newest×6, widest×3. With a separate </w> symbol the weighted pair
    // counts make the first merges (e,s)→9, (es,t)→9, (est,</w>)→9.
    val corpus = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))
    ).toDF("doc_id", "text")
    val merges = graft.text.Bpe.trainMerges(corpus, 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", graft.text.Bpe.EndOfWord)))
    // Determinism: retraining yields the identical table.
    assert(graft.text.Bpe.trainMerges(corpus, 3) === merges)
  }

  test("BPE driver-side and distributed merge loops are bit-for-bit equal") {
    import spark.implicits._
    val sample = docs.limit(60).cache()
    // driverRowBudget=0 forces the distributed loop; the default takes the
    // driver-side path. Same corpus, same merge count — identical table,
    // including tie-break order deep into the schedule.
    val local = graft.text.Bpe.trainMerges(sample, 48)
    val dist = graft.text.Bpe.trainMerges(sample, 48, driverRowBudget = 0L)
    assert(local === dist)
    sample.unpersist()
  }

  test("BPE encode round-trips exactly and compresses under more merges") {
    import spark.implicits._
    val sample = docs.limit(40).cache()
    val merges = graft.text.Bpe.trainMerges(sample, 40)
    val encoded = graft.text.Bpe.encode(sample, merges)
      .as[(Long, Seq[String])].collect().toMap
    val original = sample.select("doc_id", "text").as[(Long, String)].collect().toMap
    // Exact round-trip: concatenating subwords and splitting on </w>
    // reconstructs the whitespace tokens of every document.
    original.foreach { case (id, text) =>
      val rebuilt = encoded(id).mkString
        .split(java.util.regex.Pattern.quote(graft.text.Bpe.EndOfWord))
        .filter(_.nonEmpty)
      assert(rebuilt.toSeq === text.split(" ").filter(_.nonEmpty).toSeq, s"doc $id")
    }
    // A trained vocabulary strictly beats characters: fewer tokens than
    // chars+end-markers, and token count shrinks monotonically vs no merges.
    val stats = graft.text.Bpe.tokenStats(sample, 40)
      .agg(sum("n_tokens"), sum("n_chars"), sum("n_words")).collect()(0)
    val (nTok, nChars, nWords) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(nTok < nChars + nWords) // strictly better than char-level
    val noMerges = graft.text.Bpe.encode(sample, Seq.empty)
      .select(size(col("tokens")).cast("long")).as[Long].collect().sum
    assert(nTok < noMerges)
    sample.unpersist()
  }

  test("BPE merge table round-trips the registry and tokenizes identically") {
    val docs = Tables.documents(spark, TinySf)
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-spec").toString
    val merges = graft.text.Bpe.trainMerges(docs, numMerges = 32)
    val v1 = graft.text.Bpe.saveMerges(spark, merges, root)
    // table round-trip is exact and ordered
    assert(graft.text.Bpe.loadMerges(spark, root) == merges)
    // a second publish bumps the version; latest wins, old stays loadable
    val v2 = graft.text.Bpe.saveMerges(spark, merges.take(8), root)
    assert(v2 == v1 + 1)
    assert(graft.text.Bpe.loadMerges(spark, root).length == 8)
    assert(graft.text.Bpe.loadMerges(spark, root, version = Some(v1)) == merges)
    // the parity query reports zero mismatches
    val out = Queries.all("q_bpe_reload")(spark, TinySf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(5), s"doc ${r.getLong(0)} tokenized differently")
      assert(r.getLong(3) == r.getLong(4))
    }
  }

  test("fuzzy decontamination separates a wholesale near-copy from " +
       "incidental phrase overlap") {
    import graft.text.Curation
    import spark.implicits._
    val evalText = (1 to 40).map(i => s"evaltok$i").mkString(" ")
    // near-copy: the eval doc with ONE word changed (shingle jaccard ≈ 0.9);
    // incidental: an unrelated doc sharing one 4-gram run with the eval doc
    val nearCopy = evalText.replace("evaltok20", "changed")
    val incidental = "evaltok1 evaltok2 evaltok3 evaltok4 " +
      (1 to 40).map(i => s"other$i").mkString(" ")
    val clean = (1 to 40).map(i => s"clean$i").mkString(" ")
    val docs = Seq(
      (0L, evalText, "src0", "en"),
      (1L, nearCopy, "src1", "en"),
      (2L, incidental, "src1", "en"),
      (3L, clean, "src1", "en")
    ).toDF("doc_id", "text", "source", "lang")

    // exact any-overlap decontamination flags BOTH the near-copy and the
    // incidental doc — no severity separation
    val exact = Curation.decontaminate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_contaminated")).toMap
    assert(exact(1L) && exact(2L) && !exact(3L), s"exact: $exact")

    // fuzzy: the near-copy flags with a high estimate, the incidental doc
    // and the clean doc stay clean
    val fuzzy = Curation.decontaminateFuzzy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(fuzzy.keySet == Set(1L, 2L, 3L), "training side only")
    assert(fuzzy(1L).getAs[Boolean]("is_contaminated_fuzzy"))
    assert(fuzzy(1L).getAs[Double]("max_est_jaccard") >= 0.5)
    assert(!fuzzy(2L).getAs[Boolean]("is_contaminated_fuzzy"),
      "one shared phrase must not read as wholesale contamination")
    assert(!fuzzy(3L).getAs[Boolean]("is_contaminated_fuzzy"))
  }

  test("stupid backoff walks the full ladder with hand-checked tiers and scores") {
    import graft.text.StupidBackoff
    import spark.implicits._
    // train = doc_id % 5 != 0 (three copies of "a b c"); eval = the rest.
    // Train trigram stream (2 start pads): (<s>,<s>,a), (<s>,a,b), (a,b,c)
    // ×3 → every observed trigram/history count is 3, N = 9.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (5L, "a b c"), // every trigram seen: 3 tri hits, S = 3/3 = 1 → lp 0
      (10L, "b c"),  // (<s>,<s>,b) backs off past (<s>,b) to unigram 'b';
                     // (<s>,b,c) backs off to bigram (b,c)
      (15L, "z")     // out-of-vocabulary floor
    ).toDF("doc_id", "text")
    val out = StupidBackoff.docLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L, 15L), s"eval split wrong: ${out.keySet}")

    assert(out(5L).getAs[Long]("n_tri") == 3L && out(5L).getAs[Long]("n_oov") == 0L)
    assert(out(5L).getAs[Long]("sum_lp_micro") == 0L,
      "perfectly predicted doc must score ln(1) = 0")

    assert(out(10L).getAs[Long]("n_uni") == 1L && out(10L).getAs[Long]("n_bi") == 1L
      && out(10L).getAs[Long]("n_tri") == 0L)
    def micro(x: Double): Long = math.floor(math.log(x).toFloat.toDouble * 1e6).toLong
    val expected10 = micro(0.16 * (3.0 / 9.0)) + micro(0.4 * (3.0 / 3.0))
    assert(out(10L).getAs[Long]("sum_lp_micro") == expected10,
      s"got ${out(10L).getAs[Long]("sum_lp_micro")}, want $expected10")

    assert(out(15L).getAs[Long]("n_oov") == 1L)
    assert(out(15L).getAs[Long]("sum_lp_micro") == micro(0.16 * (0.5 / 9.0)))
  }

  test("Kneser-Ney interpolation matches hand math incl. the continuation-count edge") {
    import graft.text.KneserNey
    import spark.implicits._
    // train = doc_id % 5 != 0. Train bigrams (one <s> pad):
    //   (<s>,a):2 (a,b):2 (<s>,c):1 (c,b):1 (<s>,x):3 (x,franc):3
    // → n_types=6; c_hist: <s>:6 a:2 c:1 x:3; N1+(v·): <s>:3 a:1 c:1 x:1;
    //   N1+(·w): a:1 b:2 c:1 x:1 franc:1.
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "c b"),
      (4L, "x franc"), (6L, "x franc"), (7L, "x franc"),
      (5L, "a q"),     // bi tier + OOV floor
      (10L, "b franc") // cont tier twice, incl. the Francisco edge
    ).toDF("doc_id", "text")
    val out = KneserNey.docLogProb(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L))
    def micro(x: Double): Long = math.floor(math.log(x).toFloat.toDouble * 1e6).toLong

    // doc 5 "a q": (<s>,a) seen bigram; (a,q) has seen history, OOV word.
    assert(out(5L).getAs[Long]("n_bi") == 1L && out(5L).getAs[Long]("n_oov") == 1L)
    val pSa = (2.0 - 0.75) / 6.0 + ((0.75 * 3.0) / 6.0) * (1.0 / 6.0) // 0.270833…
    val pAq = 0.0 / 2.0 + ((0.75 * 1.0) / 2.0) * (0.5 / 6.0)          // 0.03125
    assert(out(5L).getAs[Long]("sum_lp_micro") == micro(pSa) + micro(pAq))

    // doc 10 "b franc": (<s>,b) unseen bigram → discounted mass × P_cont(b);
    // (b,franc) unseen HISTORY → pure P_cont(franc).
    assert(out(10L).getAs[Long]("n_cont") == 2L)
    val pSb = 0.0 / 6.0 + ((0.75 * 3.0) / 6.0) * (2.0 / 6.0)  // 0.125
    val pBf = 1.0 / 6.0                                        // 0.166667…
    assert(out(10L).getAs[Long]("sum_lp_micro") == micro(pSb) + micro(pBf))

    // THE KN edge: 'franc' occurs 3 times (raw unigram share 3/12 = 0.25)
    // but always after the same history, so its continuation probability
    // is only N1+(·franc)/n_types = 1/6 — the model scores it BELOW the
    // twice-seen-but-two-histories 'b' (2/6), where raw-frequency backoff
    // would rank them the other way around.
    assert(pBf < 2.0 / 6.0 && pBf < 3.0 / 12.0)
  }

  test("Moore-Lewis selects in-domain-looking held-out docs and rejects the rest") {
    import graft.text.MooreLewis
    import spark.implicits._
    // train (doc_id % 5 != 0): en docs speak 'alpha beta', de docs speak
    // 'zug bahn'. Held-out doc 5 is alpha-beta-like -> selected; doc 10
    // is zug-bahn-like -> rejected (general LM covers both, in-domain
    // only covers en).
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "beta alpha beta alpha", "en"),
      (3L, "zug bahn zug bahn", "de"),
      (4L, "bahn zug bahn zug", "de"),
      (5L, "alpha beta beta", "en"),
      (10L, "zug bahn bahn", "de")
    ).toDF("doc_id", "text", "lang")
    val out = MooreLewis.docScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L))
    assert(out(5L).getAs[Boolean]("selected"),
      s"in-domain doc rejected: ${out(5L)}")
    assert(!out(10L).getAs[Boolean]("selected"),
      s"out-of-domain doc selected: ${out(10L)}")
    assert(out(5L).getAs[Long]("n_tokens") == 3L)
    // hand math for one token: 'alpha' has c_in=4/N_in=8, c_gen=4/N_gen=16
    // -> delta = ln(1/2) - ln(1/4) = +ln 2 per token; all of doc 5's
    // tokens have the same 2x in-domain preference
    def micro(x: Double): Long = math.floor(math.log(x).toFloat.toDouble * 1e6).toLong
    assert(out(5L).getAs[Long]("sum_delta_micro") ==
      3L * (micro(0.5) - micro(0.25)))
    // doc 10's tokens are OOV in the in-domain LM (floor 0.5/8) but seen
    // in the general LM (4/16) -> strongly negative
    assert(out(10L).getAs[Long]("sum_delta_micro") ==
      3L * (micro(0.5 / 8.0) - micro(0.25)))
  }

  test("BLEU-2 pairs match hand math: clipping, brevity penalty, zero-bigram floor") {
    import graft.text.Bleu
    import spark.implicits._
    def f32(x: Double): Double = x.toFloat.toDouble
    val docs = Seq(
      // Papineni's clipping pathology: all-'the' candidate vs a normal ref
      (1L, "the the the the the the the", "en"),
      (2L, "the cat is on the mat", "en"),
      // normal overlap pair (doc_a=11 is the candidate)
      (11L, "the cat sat", "zh"),
      (12L, "the cat is", "zh"),
      // brevity-penalty pair: short candidate, perfect precision
      (21L, "the cat", "de"),
      (22L, "the cat is", "de"),
      // single-token doc: no bigram -> excluded from the pair universe
      // (0/0 in p2 would be NaN in Spark, engine-defined elsewhere)
      (23L, "the", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Bleu.bleuPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap

    // clipped unigrams: min(7 'the', 2 'the') = 2; no shared bigram -> 0
    val p12 = out((1L, 2L))
    assert(p12.getAs[Long]("m1") == 2L && p12.getAs[Long]("m2") == 0L)
    assert(p12.getAs[Double]("p1") == 2.0 / 7.0)
    assert(p12.getAs[Double]("bleu2") == 0.0)

    // m1=2 (the, cat), m2=1 ('the cat'); equal lengths -> BP=1;
    // bleu = exp(0.5*(ln(2/3)+ln(1/2)))
    val p1112 = out((11L, 12L))
    assert(p1112.getAs[Long]("m1") == 2L && p1112.getAs[Long]("m2") == 1L)
    assert(p1112.getAs[Double]("bleu2") ==
      f32(math.exp(0.5 * (f32(math.log(2.0 / 3.0)) + f32(math.log(0.5))))))

    // perfect precision but short: BP = exp(1 - 3/2) bites
    val p2122 = out((21L, 22L))
    assert(p2122.getAs[Double]("p1") == 1.0 && p2122.getAs[Double]("p2") == 1.0)
    assert(p2122.getAs[Double]("bleu2") ==
      f32(math.exp(1.0 - 3.0 / 2.0)) * f32(math.exp(0.0)))

    // the single-token doc appears in NO pair (unscoreable by BLEU-2)
    assert(!out.keySet.exists { case (a, b) => a == 23L || b == 23L })
  }

  test("chrF pairs match hand math and are whitespace-reflow invariant") {
    import graft.text.ChrF
    import spark.implicits._
    val docs = Seq(
      (1L, "ab ab", "en"), // despaced: "abab"
      (2L, "aba", "en"),
      (3L, "abab", "en"), // same despaced content as doc 1
      (4L, "xyzw", "en")
    ).toDF("doc_id", "text", "lang")
    val out = ChrF.chrfPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap

    // "abab" vs "aba": m1 = min(2,2)+min(2,1) = 3; m2 = ab:1 + ba:1 = 2;
    // m3 = aba:1 → P = (3/4, 2/3, 1/2), R = (1, 1, 1)
    val p12 = out((1L, 2L))
    assert(p12.getAs[Long]("m1") == 3L && p12.getAs[Long]("m2") == 2L &&
      p12.getAs[Long]("m3") == 1L)
    def fOf(m: Double, ta: Double, tb: Double): Double =
      5.0 * (m / ta) * (m / tb) / (4.0 * (m / ta) + (m / tb))
    assert(p12.getAs[Double]("f1") == fOf(3.0, 4.0, 3.0))
    assert(p12.getAs[Double]("f2") == fOf(2.0, 3.0, 2.0))
    assert(p12.getAs[Double]("f3") == fOf(1.0, 2.0, 1.0))
    assert(p12.getAs[Double]("chrf") ==
      (fOf(3.0, 4.0, 3.0) + fOf(2.0, 3.0, 2.0) + fOf(1.0, 2.0, 1.0)) / 3.0)

    // whitespace reflow is invisible: "ab ab" ≡ "abab" → perfect score
    val p13 = out((1L, 3L))
    assert(p13.getAs[Double]("chrf") == 1.0)
    // disjoint alphabets: every order clips to zero → chrf = 0
    assert(out((1L, 4L)).getAs[Double]("chrf") == 0.0)
  }

  test("word dropout is reproducible, epoch-independent, and mask-consistent") {
    import graft.text.Augment
    import spark.implicits._
    val synth = (1L to 40L).map(i =>
      (i, (1 to 50).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    def run() = Augment.wordDropout(synth, epochs = 2, keepBp = 8500)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")) -> r)
      .toMap
    val a = run(); val b = run()
    // bit-reproducible across runs
    assert(a.keySet == b.keySet && a.keySet.size == 80)
    for (k <- a.keySet) {
      assert(a(k).getAs[String]("view_text") == b(k).getAs[String]("view_text"))
      val r = a(k)
      val kept = r.getAs[String]("view_text").split(" ").filter(_.nonEmpty).length
      assert(kept == r.getAs[Long]("n_kept"), s"mask/text mismatch at $k")
      val dropped = r.getAs[String]("dropped_pos")
      val nDropped = if (dropped.isEmpty) 0 else dropped.split(",").length
      assert(r.getAs[Long]("n_tokens") - r.getAs[Long]("n_kept") == nDropped)
    }
    // epochs draw independently: the two views differ somewhere
    assert(a.keys.exists(k => k._2 == 0L &&
      a(k).getAs[String]("view_text") != a((k._1, 1L)).getAs[String]("view_text")))
    // aggregate keep rate ~ 85% (binomial: 2000 draws per epoch)
    val totKept = a.values.map(_.getAs[Long]("n_kept")).sum.toDouble
    val tot = a.values.map(_.getAs[Long]("n_tokens")).sum.toDouble
    assert(math.abs(totKept / tot - 0.85) < 0.03, s"keep rate ${totKept / tot}")
  }

  test("incremental gram store serves novelty bit-identically to a from-scratch probe") {
    import graft.text.Novelty
    import spark.implicits._
    val train = docs.filter(Novelty.defaultTrainPred)
    val eval = docs.filter(!Novelty.defaultTrainPred)
    val root = java.nio.file.Files
      .createTempDirectory("graft-gram-spec").toString + "/grams"
    Novelty.buildGramStore(train.filter(col("doc_id") % 2 === 0), root)
    Novelty.appendGramStore(train.filter(col("doc_id") % 2 === 1), root)
    val incr = Novelty.noveltyFromStore(spark, root, eval)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"))).toMap
    val direct = Novelty.docNovelty(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"))).toMap
    assert(incr == direct, "store-served novelty diverged from from-scratch")
    assert(incr.nonEmpty)
    // re-appending an already-ingested slice is a no-op by set union
    Novelty.appendGramStore(train.filter(col("doc_id") % 2 === 0), root)
    val replay = Novelty.noveltyFromStore(spark, root, eval)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"))).toMap
    assert(replay == direct, "replayed append changed the gram set")
  }

  test("self-BLEU reads 1 for a duplicated corpus and 0 for a disjoint one") {
    import graft.text.Bleu
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "en"), (2L, "a b c d", "en"),   // identical pair
      (21L, "a b c d", "de"), (22L, "w x y z", "de")  // zero overlap
    ).toDF("doc_id", "text", "lang")
    val out = Bleu.selfBleu(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("en").getAs[Long]("n_pairs") == 1L)
    assert(out("en").getAs[Double]("self_bleu") == 1.0)
    assert(out("en").getAs[Long]("n_high_overlap") == 1L)
    assert(out("de").getAs[Double]("self_bleu") == 0.0)
    assert(out("de").getAs[Long]("n_high_overlap") == 0L)
  }

  test("n-gram novelty counts seen vs novel grams against the train split") {
    import graft.text.Novelty
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // train: grams "a b c d e", "b c d e f"
      (5L, "a b c d e x"),   // eval: one seen, one novel -> rate 0.5
      (10L, "a b c d e f"),  // eval: exact train copy -> rate 0
      (15L, "a b")           // eval: too short for a 5-gram -> absent
    ).toDF("doc_id", "text")
    val out = Novelty.docNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L))
    assert(out(5L).getAs[Long]("n_grams") == 2L &&
      out(5L).getAs[Long]("n_seen") == 1L)
    assert(out(5L).getAs[Double]("novelty_rate") == 0.5)
    assert(!out(5L).getAs[Boolean]("mostly_seen")) // 0.5 < 0.5 is false
    assert(out(10L).getAs[Long]("n_novel") == 0L &&
      out(10L).getAs[Boolean]("mostly_seen"))
  }

  test("compression ratio orders repetitive < prose < random; flags and " +
       "determinism hold") {
    import graft.text.CompressRatio
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val random = Array.fill(3000)((33 + rnd.nextInt(94)).toChar).mkString
    val prose = ("the quick brown fox jumps over a lazy dog while seventy " +
      "wizards brew giant hexes of quartz jugs and vexing sphinxes judge " +
      "my vow about fjords packing boxes with five dozen liquor glasses " +
      "under bright amber skylines near quiet harbors every autumn evening")
    val synth = Seq(
      (1L, ("spam ham " * 300).trim),
      (2L, prose),
      (3L, random)
    ).toDF("doc_id", "text")
    val out = CompressRatio.compressionStats(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val (rep, pr, rn) = (out(1L).getAs[Double]("compress_ratio"),
      out(2L).getAs[Double]("compress_ratio"),
      out(3L).getAs[Double]("compress_ratio"))
    assert(rep < pr && pr < rn, s"ordering broken: $rep, $pr, $rn")
    assert(out(1L).getAs[Boolean]("is_repetitive")
      && !out(2L).getAs[Boolean]("is_repetitive"))
    assert(out(3L).getAs[Boolean]("is_incompressible")
      && !out(2L).getAs[Boolean]("is_incompressible"), s"random ratio $rn")
    // byte accounting is exact and deterministic under repartitioning
    val again = CompressRatio.compressionStats(synth.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_compressed")).toMap
    assert(out.forall { case (k, r) => again(k) == r.getAs[Long]("n_compressed") })
  }

  test("unigram tokenizer reproduces a hand-computed Viterbi-EM step") {
    import graft.text.SpmUnigram
    import spark.implicits._
    // corpus: "ab ab abc" → words ab(×2), abc(×1); maxPieceLen 3.
    // Seed substring counts: a=3, b=3, ab=3, c=1, bc=1, abc=1 (total 12).
    // Viterbi under the seed: "ab" → [ab] (ln(3/12) beats 2·ln(3/12)),
    // "abc" → [abc] (ln(1/12) beats ln(3/12)+ln(1/12)).
    // Hard-EM counts: ab=2, abc=1; unused chars floored at 1 →
    // {ab:2, abc:1, a:1, b:1, c:1}.
    val docs = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val pieces = SpmUnigram.train(docs, vocabSize = 100, emIters = 1,
      maxPieceLen = 3)
    val expected = Seq("ab" -> 2L, "abc" -> 1L, "a" -> 1L, "b" -> 1L, "c" -> 1L)
    assert(pieces.toSet == expected.toSet, s"got $pieces")
    // canonical order: count desc, then UTF-8 piece asc
    assert(pieces == Seq("ab" -> 2L, "a" -> 1L, "abc" -> 1L, "b" -> 1L, "c" -> 1L),
      s"order: $pieces")
    // a second EM round under {ab:2,abc:1,...} re-derives the same table
    // (the segmentations are unchanged) — the EM fixpoint
    val pieces2 = SpmUnigram.train(docs, vocabSize = 100, emIters = 2,
      maxPieceLen = 3)
    assert(pieces2 == pieces, s"EM not at fixpoint: $pieces2")
  }

  test("unigram tokenizer: round-trip, determinism across partitionings " +
       "and training paths, compression beats char-level") {
    import graft.text.SpmUnigram
    val sample = docs.limit(300).cache()
    try {
      val pieces = SpmUnigram.train(sample, vocabSize = 256, emIters = 3)
      // cross-path parity: forcing the distributed EM loop (budget 0) must
      // produce the bit-identical table (integer Viterbi counts are
      // associative), as must a repartitioned corpus
      val distributed = SpmUnigram.train(sample, vocabSize = 256, emIters = 3,
        driverRowBudget = 0L)
      assert(distributed == pieces, "driver vs distributed EM diverged")
      val repart = SpmUnigram.train(sample.repartition(13), vocabSize = 256,
        emIters = 3)
      assert(repart == pieces, "piece table depends on partitioning")

      // word-grain round trip: a word's pieces concatenate back exactly
      val enc = SpmUnigram.encode(sample, pieces)
        .join(sample.select("doc_id", "text"), "doc_id")
        .select(col("doc_id"), concat_ws("", col("tokens")).as("glued"),
          regexp_replace(col("text"), " ", "").as("squashed"))
      assert(enc.filter(col("glued") =!= col("squashed")).count() == 0L,
        "tokens do not round-trip to the source text")

      // compression: multi-char pieces must beat one-token-per-char
      val stats = SpmUnigram.encode(sample, pieces)
        .select(size(col("tokens")).cast("long").as("n_tokens"))
        .agg(sum("n_tokens")).collect()(0).getLong(0)
      val chars = sample
        .select(length(regexp_replace(col("text"), " ", "")).cast("long").as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
      assert(stats < chars,
        s"no compression: $stats tokens vs $chars chars")
    } finally sample.unpersist(blocking = false)
  }

  test("tokenizer coverage audit counts unknown-char fallbacks on held-out text") {
    import graft.text.SpmUnigram
    import spark.implicits._
    // train split (ids % 5 != 0) sees only letters a/b/c; held-out doc 10
    // repeats train text (full coverage), doc 5 carries the never-seen 'z'
    val docs = Seq(
      (1L, "ab ab abc"), (2L, "ab abc"), (3L, "abc ab"),
      (5L, "ab zz"), (10L, "ab abc")
    ).toDF("doc_id", "text")
    val out = SpmUnigram.coverageStats(docs, vocabSize = 100, emIters = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(5L, 10L), "held-out split only")
    assert(out(10L).getAs[Long]("n_unk") == 0L, "train-distribution text must cover")
    assert(out(5L).getAs[Long]("n_unk") == 2L,
      s"'zz' must fall back to two unknown chars: ${out(5L)}")
    assert(out(5L).getAs[Double]("oov_rate") > 0.0)
    assert(out(10L).getAs[Double]("pieces_per_word") >= 1.0)
  }

  test("unigram piece table round-trips the registry and tokenizes identically") {
    import graft.text.SpmUnigram
    val sample = docs.limit(150)
    val pieces = SpmUnigram.train(sample, vocabSize = 128, emIters = 2)
    val root = java.nio.file.Files.createTempDirectory("spm-reg").toString
    val v = SpmUnigram.savePieces(spark, pieces, root)
    assert(v == 1L)
    val reloaded = SpmUnigram.loadPieces(spark, root)
    assert(reloaded == pieces, "piece table mutated through the registry")
    val live = SpmUnigram.encode(sample, pieces).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val re = SpmUnigram.encode(sample, reloaded).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(live.sameElements(re), "reloaded table tokenizes differently")
  }

  test("RAKE scores match the hand-computed degree/freq example") {
    import spark.implicits._
    // phrases: [deep learning], [deep networks] — "of"/"the" break
    val synth = Seq((1L, "Deep learning of the deep networks")).toDF("doc_id", "text")
    val words = graft.text.Keywords.rakeWordScores(synth).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    assert(words.keySet == Set("deep", "learning", "networks"))
    assert(words("deep").getAs[Long]("freq") == 2L)
    assert(words("deep").getAs[Long]("degree") == 4L)      // 2 phrases of len 2
    assert(words("deep").getAs[Double]("score") == 2.0)
    assert(words("learning").getAs[Long]("degree") == 2L)  // its phrase's length
    val phrases = graft.text.Keywords.rakePhrases(synth).collect()
      .map(r => r.getAs[String]("phrase") -> r).toMap
    assert(phrases.keySet == Set("deep learning", "deep networks"))
    assert(phrases("deep learning").getAs[Long]("score_micro") == 4000000L)
    assert(phrases("deep learning").getAs[Long]("occurrences") == 1L)
    assert(phrases("deep learning").getAs[Long]("n_words") == 2L)
  }

  test("TextRank ranks the hub word above leaves on a star-shaped corpus") {
    import spark.implicits._
    // "core" is adjacent to every other content word; leaves see only core
    val synth = Seq(
      (1L, "core alpha"), (2L, "core beta"), (3L, "core gamma"),
      (4L, "core delta"), (5L, "core epsilon")
    ).toDF("doc_id", "text")
    val out = graft.text.Keywords.textrank(synth).collect()
      .map(r => r.getAs[String]("token") -> r).toMap
    assert(out("core").getAs[Long]("degree") == 5L)
    assert(out("alpha").getAs[Long]("degree") == 1L)
    val leafScores = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      .map(out(_).getAs[Double]("pr_score"))
    assert(leafScores.forall(_ < out("core").getAs[Double]("pr_score")))
    // leaves are symmetric: identical integer fixed-point scores
    assert(leafScores.distinct.size == 1)
  }

  test("packHistogram respects capacity, preserves counts, and meets the 2x bin bound") {
    val cap = 100
    val hist = Map(60 -> 5L, 40 -> 7L, 30 -> 4L, 25 -> 10L, 3 -> 50L)
    val strategies = graft.text.BinPacking.packHistogram(hist, cap)
    // every composition fits, every length class is fully consumed
    strategies.foreach(s => assert(s.lengths.sum <= cap && s.count > 0))
    val consumed = strategies.flatMap(s => s.lengths.map(_ -> s.count))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    assert(consumed == hist)
    // theorem-backed bound: at most one bin fills <= cap/2 (a half-empty
    // bin means nothing remaining fit), so n_bins <= 2*LB + 1
    val totalTokens = hist.map { case (l, c) => l * c }.sum
    val nBins = strategies.map(_.count).sum
    val lb = (totalTokens + cap - 1) / cap
    assert(nBins <= 2 * lb + 1, s"$nBins bins vs lower bound $lb")
  }

  test("packBins assigns every doc exactly once within capacity; overflow isolated") {
    import spark.implicits._
    val cap = 64
    val synth = Seq(
      (1L, ("w " * 70).trim),  // 70 tokens: overflow
      (2L, ("w " * 40).trim), (3L, ("w " * 40).trim),
      (4L, ("w " * 24).trim), (5L, ("w " * 24).trim),
      (6L, ("w " * 10).trim), (7L, ("w " * 3).trim)
    ).toDF("doc_id", "text")
    val out = graft.text.BinPacking.packBins(synth, cap).cache()
    try {
      // bijective: one row per doc
      assert(out.count() == 7 && out.select("doc_id").distinct().count() == 7)
      // non-overflow bins never exceed capacity; overflow docs sit alone
      val perBin = out.groupBy("bin_id", "overflow")
        .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n")).collect()
      perBin.foreach { r =>
        if (r.getAs[Long]("overflow") == 0L)
          assert(r.getAs[Long]("fill") <= cap.toLong)
        else assert(r.getAs[Long]("n") == 1L)
      }
      // the overflow doc's bin id sits above the normal id space
      val overBin = out.filter(col("overflow") === 1L)
        .select("bin_id").head().getLong(0)
      val maxNormal = out.filter(col("overflow") === 0L)
        .agg(max("bin_id")).head().getLong(0)
      assert(overBin > maxNormal)
    } finally out.unpersist()
  }

  test("packBins is deterministic under repartitioning and meets the bin bound on the corpus") {
    val cap = 128
    val base = graft.text.BinPacking.packBins(docs, cap)
      .orderBy("doc_id").collect().toSeq
    val reparted = graft.text.BinPacking.packBins(docs.repartition(7), cap)
      .orderBy("doc_id").collect().toSeq
    assert(base == reparted, "bin assignment moved under repartitioning")
    // every doc placed, capacity respected, bin count near-optimal
    val byBin = base.filter(_.getAs[Long]("overflow") == 0L)
      .groupBy(_.getAs[Long]("bin_id"))
    byBin.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum <= cap.toLong)
    }
    val totalTokens = base.filter(_.getAs[Long]("overflow") == 0L)
      .map(_.getAs[Long]("n_tokens")).sum
    val lb = (totalTokens + cap - 1) / cap
    assert(byBin.size.toLong <= 2 * lb + 1)
    // bin-stats view is consistent with the assignment
    val stats = graft.text.BinPacking.packBinStats(docs, cap)
    val statTotal = stats.agg(sum("fill_tokens")).head().getLong(0)
    assert(statTotal == base.map(_.getAs[Long]("n_tokens")).sum)
    assert(stats.filter(col("overflow") === 0L &&
      col("slack_tokens") =!= lit(cap.toLong) - col("fill_tokens")).count() == 0)
  }

  test("bloom-gated incremental dedup is bit-identical to exact dedup, " +
       "even at a forced false-positive rate; the gate actually prunes") {
    import graft.text.{BloomDedup, Dedup}
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    val expected = Dedup.exactDups(docs)
      .orderBy("content_hash").collect().toSeq

    // healthy geometry: gated merge == from-scratch exact dedup, and the
    // gate sends most unique-in-delta groups around the confirm join
    val store = java.nio.file.Files.createTempDirectory("bloomded").toString + "/b"
    BloomDedup.buildHashBloom(base, store)
    val got = BloomDedup.exactDupsIncremental(Dedup.exactDups(base), delta, store)
      .orderBy("content_hash").collect().toSeq
    assert(got == expected, "gated merge diverged from exact dedup")
    val probed = BloomDedup.probedDeltaGroups(delta, store)
    val negatives = probed.filter(!col("might")).count()
    assert(negatives > 0, "gate pruned nothing — bloom miswired or saturated")
    // every true base-duplicate hash MUST probe positive (no false negatives)
    val trueDup = BloomDedup.contentHashes(delta)
      .join(BloomDedup.contentHashes(base), Seq("content_hash"), "left_semi")
      .select("content_hash").distinct()
    val missed = trueDup.join(probed.filter(!col("might")),
      Seq("content_hash"), "inner").count()
    assert(missed == 0L, "bloom false negative — impossible unless miswired")

    // pathological geometry (64 bits for the whole corpus → FPs everywhere):
    // the result must STILL be exact; only the pruning degrades
    val tiny = java.nio.file.Files.createTempDirectory("bloomded-tiny").toString + "/b"
    BloomDedup.buildHashBloom(base, tiny, mBits = 64, nHashes = 2)
    val gotTiny = BloomDedup.exactDupsIncremental(Dedup.exactDups(base), delta, tiny)
      .orderBy("content_hash").collect().toSeq
    assert(gotTiny == expected, "false positives corrupted the merge")
  }

  test("bloom store: build+append OR-merges to the from-scratch bitset; " +
       "mixed geometry is rejected") {
    import graft.text.BloomDedup
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val incr = java.nio.file.Files.createTempDirectory("bloom-incr").toString + "/b"
    val full = java.nio.file.Files.createTempDirectory("bloom-full").toString + "/b"
    BloomDedup.buildHashBloom(a, incr, mBits = 4096)
    BloomDedup.appendHashBloom(b, incr, mBits = 4096)
    BloomDedup.buildHashBloom(docs, full, mBits = 4096)
    val mi = BloomDedup.mergedBitset(spark, incr).collect()(0).getSeq[Long](0)
    val mf = BloomDedup.mergedBitset(spark, full).collect()(0).getSeq[Long](0)
    assert(mi == mf, "append+merge must equal the from-scratch bitset")
    // a slice appended with different geometry must fail loudly at read
    BloomDedup.appendHashBloom(b, incr, mBits = 8192)
    val ex = intercept[IllegalArgumentException] {
      BloomDedup.geometry(spark, incr)
    }
    assert(ex.getMessage.contains("geometries"), ex.getMessage)
  }

  test("line dedup strips a repeated footer corpus-wide, keeps prose in order") {
    import spark.implicits._
    val footer = "copyright 2026 example corp\nall rights reserved"
    val synth = Seq(
      (1L, s"alpha prose one\nbeta prose two\n$footer"),
      (2L, s"$footer\ngamma unique line"),
      (3L, s"delta standalone\n$footer\nepsilon closing"),
      (4L, footer) // boilerplate-only doc must survive as an empty row
    ).toDF("doc_id", "text")
    val out = graft.text.LineDedup.dedupLines(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "a document vanished")
    assert(out(1L).getAs[String]("clean_text") == "alpha prose one\nbeta prose two")
    assert(out(2L).getAs[String]("clean_text") == "gamma unique line")
    // order preserved around the excised footer
    assert(out(3L).getAs[String]("clean_text") == "delta standalone\nepsilon closing")
    assert(out(4L).getAs[String]("clean_text") == "" &&
      out(4L).getAs[Long]("n_kept") == 0L)
    // the audit adds up: footer = 2 lines per occurrence
    assert(out(1L).getAs[Long]("n_removed") == 2L &&
      out(1L).getAs[Long]("n_lines") == 4L)
    assert(out(4L).getAs[Long]("n_removed") == 2L)
  }

  test("line dedup removal threshold: minDupCount=3 spares a twice-seen line") {
    import spark.implicits._
    val synth = Seq(
      (1L, "twice seen\nunique a"),
      (2L, "twice seen\nunique b"),
      (3L, "thrice seen\nunique c"),
      (4L, "thrice seen\nunique d"),
      (5L, "thrice seen\nunique e")
    ).toDF("doc_id", "text")
    val out = graft.text.LineDedup.dedupLines(synth, minDupCount = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(out(1L) == "twice seen\nunique a", "line under threshold removed")
    assert(out(3L) == "unique c", "line at threshold kept")
  }

  test("line-count store: build+append merges to the from-scratch counts exactly") {
    import spark.implicits._
    val footer = "shared footer line"
    val synth = (1L to 12L).map(i =>
      (i, s"unique opener $i\n$footer\nunique closer $i"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-lines").toString
    // incremental: old slice then delta append
    graft.text.LineDedup.buildLineStore(
      synth.filter(col("doc_id") <= 8L), s"$root/inc")
    graft.text.LineDedup.appendLineStore(
      synth.filter(col("doc_id") > 8L), s"$root/inc")
    // from-scratch twin
    graft.text.LineDedup.buildLineStore(synth, s"$root/full")
    val inc = graft.text.LineDedup.mergedLineCounts(spark, s"$root/inc")
      .orderBy("line").collect().toSeq
    val full = graft.text.LineDedup.mergedLineCounts(spark, s"$root/full")
      .orderBy("line").collect().toSeq
    assert(inc == full, "appended counts diverged from the from-scratch build")
    // cleaning through the store == the in-query path, bit for bit
    val viaStore = graft.text.LineDedup.dedupLinesWithStore(synth, s"$root/inc")
      .orderBy("doc_id").collect().toSeq
    val direct = graft.text.LineDedup.dedupLines(synth)
      .orderBy("doc_id").collect().toSeq
    assert(viaStore == direct)
    // and the footer is actually gone
    assert(viaStore.forall(!_.getAs[String]("clean_text").contains(footer)))
  }

  test("reflowed line dedup matches a hand computation on planted token docs") {
    import spark.implicits._
    // 3-token reflow: doc 1/2 share their first reflowed line exactly
    val synth = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c p q r"),
      (3L, "m n o")
    ).toDF("doc_id", "text")
    val out = graft.text.LineDedup.dedupReflowed(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "x y z")
    assert(out(2L).getAs[String]("clean_text") == "p q r")
    assert(out(3L).getAs[String]("clean_text") == "m n o")
    assert(out(1L).getAs[Long]("n_lines") == 2L &&
      out(1L).getAs[Long]("n_removed") == 1L)
  }

  test("WordPiece picks the likelihood-gain merge a hand computation gives, " +
    "with UTF-8 tie order") {
    import spark.implicits._
    import graft.text.WordPiece
    // words: ab(2), ac(1) -> symCnt a:3 ##b:2 ##c:1; pair (a,##b) cnt 2
    // score 2/(3·2)=1/3; (a,##c) cnt 1 is filtered (must recur) -> stop
    val corpus = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    assert(WordPiece.trainMerges(corpus, 5) === Seq(("a", "##b")))
    // exact score tie: (x,##y) vs (x,##z) both 2/(4·2) — ##y wins by bytes
    val tie = Seq((1L, "xy xy xz xz")).toDF("doc_id", "text")
    assert(WordPiece.trainMerges(tie, 1) === Seq(("x", "##y")))
    // BPE would pick by raw count: give a frequent-but-expected pair and a
    // rare-symbols pair with equal count — WordPiece prefers the rare one
    // (higher likelihood gain), the family's defining difference
    val lik = Seq((1L, ("ee " * 8).trim + " " + ("qz " * 4).trim)).toDF("doc_id", "text")
    val first = WordPiece.trainMerges(lik, 1).head
    // (e,##e) cnt 8, e:8·##e:8 -> 8/64 = 0.125; (q,##z) cnt 4,
    // q:4·##z:4 -> 4/16 = 0.25 -> rare pair wins despite half the count
    assert(first == ("q", "##z"))
  }

  test("WordPiece driver-side and distributed training are bit-for-bit equal") {
    import spark.implicits._
    val sample = docs.limit(60).cache()
    val local = graft.text.WordPiece.trainMerges(sample, 32)
    val dist = graft.text.WordPiece.trainMerges(sample, 32, driverRowBudget = 0L)
    assert(local === dist)
    sample.unpersist()
  }

  test("WordPiece max-munch encode round-trips, handles UNK whole-word, " +
    "and fertility accounting is exact") {
    import spark.implicits._
    import graft.text.WordPiece
    val sample = docs.limit(40).cache()
    val merges = WordPiece.trainMerges(sample, 40)
    val vocab = WordPiece.vocabulary(sample, merges)
    // greedy longest-match: every non-UNK word reconstructs by stripping ##
    val enc = WordPiece.encode(sample, vocab).collect()
    val texts = sample.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val toks = r.getSeq[String](1)
      val rebuilt = new StringBuilder
      toks.foreach { t =>
        // [UNK] is whole-word, so it starts a word like any plain token
        if (t.startsWith(WordPiece.ContPrefix))
          rebuilt.append(t.drop(WordPiece.ContPrefix.length))
        else { if (rebuilt.nonEmpty) rebuilt.append(" "); rebuilt.append(t) }
      }
      assert(rebuilt.toString == texts(r.getLong(0)),
        s"round-trip failed for doc ${r.getLong(0)}")
    }
    // a word containing a character outside the alphabet -> whole-word UNK
    val unkDoc = Seq((99L, "hello ¤strange")).toDF("doc_id", "text")
    val unkEnc = WordPiece.encode(unkDoc, vocab).collect().head.getSeq[String](1)
    assert(unkEnc.count(_ == WordPiece.Unk) == 1,
      s"expected exactly one whole-word UNK, got $unkEnc")
    val stats = WordPiece.tokenStats(unkDoc, vocab).collect().head
    assert(stats.getAs[Long]("n_unk_words") >= 1L)
    assert(stats.getAs[Long]("n_words") == 2L)
    sample.unpersist()
  }

  test("tokenizer benchmark: whitespace floor at fertility 1, all families " +
    "cover the held-out split") {
    val out = graft.text.TokenizerBench.fertility(docs).collect()
    val fams = out.map(_.getAs[String]("tokenizer")).toSet
    assert(fams == Set("whitespace", "bpe", "wordpiece", "unigram_lm"))
    out.foreach { r =>
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0, s"${r.getAs[String]("tokenizer")} fertility $f < 1")
      assert(r.getAs[Double]("chars_per_token") > 0.0)
      assert(r.getAs[Long]("n_docs") > 0L)
    }
    // the untrained floor is exactly 1 token per word
    out.filter(_.getAs[String]("tokenizer") == "whitespace")
      .foreach(r => assert(r.getAs[Double]("fertility") == 1.0))
    // every family reports the same held-out doc partition per lang
    val docsPerLang = out.groupBy(_.getAs[String]("lang"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_docs")).toSet.size }
    assert(docsPerLang.forall(_ == 1), "families disagree on the split")
  }

  test("WordPiece vocabulary persists and reloads to identical encodes") {
    import graft.text.WordPiece
    val sample = docs.limit(30)
    val root = java.nio.file.Files.createTempDirectory("graft-wp-spec").toString
    val merges = WordPiece.trainMerges(sample, 24)
    val vocab = WordPiece.vocabulary(sample, merges)
    val v1 = WordPiece.saveVocab(spark, merges, vocab, root)
    assert(WordPiece.loadVocab(spark, root) == vocab)
    val v2 = WordPiece.saveVocab(spark, merges.take(4),
      WordPiece.vocabulary(sample, merges.take(4)), root)
    assert(v2 > v1)
    assert(WordPiece.loadVocab(spark, root, version = Some(v1)) == vocab)
  }
}
