package graft

import graft.text.{CorpusStats, MinHash, SetSimJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity join (PPJoin family) + corpus distribution
  * diagnostics (Zipf fit, per-source KL, cross-source overlap). */
class CorpusStatsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, TinySf)

  /** Brute-force exact all-pairs Jaccard ≥ t over the SAME shingle sets —
    * the spec-side oracle for the filtered join. */
  private def bruteJaccardPairs(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val d = documents.select(col("doc_id"),
      array_sort(array_distinct(MinHash.shingles(col("text")))).as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter_size", expr("sorted_intersect_count(sha, shb)"))
      .withColumn("union_size",
        size(col("sha")).cast("long") + size(col("shb")).cast("long") - col("inter_size"))
      .filter(col("inter_size") * SetSimJoin.ThrDen >= col("union_size") * SetSimJoin.ThrNum)
      .select(col("doc_a"), col("doc_b"), col("inter_size"), col("union_size"))
  }

  test("ppJoin finds exactly the brute-force Jaccard>=t pair set (no miss, no extra)") {
    val got = SetSimJoin.ppJoin(docs)
      .select("doc_a", "doc_b", "inter_size", "union_size")
      .orderBy("doc_a", "doc_b").collect().toSeq
    val want = bruteJaccardPairs(docs).orderBy("doc_a", "doc_b").collect().toSeq
    assert(want.nonEmpty, "test corpus must contain near-dup pairs")
    assert(got == want)
  }

  test("ppJoin handles threshold-boundary and degenerate sets and never " +
    "builds an all-pairs product") {
    import spark.implicits._
    // doc 1/2: identical (J=1); doc 3: J=0.6 vs both (kept); doc 4:
    // disjoint (dropped); doc 5: <3 words (degenerates to one whole-text
    // shingle), exact-dup of doc 6.
    val synth = Seq(
      (1L, "a b c d e f"),        // shingles: abc bcd cde def
      (2L, "a b c d e f"),
      (3L, "a b c d e x"),        // abc bcd cde dex -> inter 3, union 5 = 0.6 kept
      (4L, "z y x w v u"),
      (5L, "hi there"),
      (6L, "hi there")
    ).toDF("doc_id", "text")
    val out = SetSimJoin.ppJoin(synth)
    val rows = out.collect().map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    assert(rows.map(t => (t._1, t._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
    assert(rows.collect { case (1L, 2L, j) => j }.head == 1.0)
    assert(rows.collect { case (5L, 6L, j) => j }.head == 1.0)
    // the plan must contain no quadratic join (that is the point)
    out.collect()
    val nodes = allNodes(finalPlan(out)).map(_.getClass.getSimpleName.stripSuffix("$"))
    assert(!nodes.exists(n => n.contains("CartesianProduct") ||
      n.contains("BroadcastNestedLoop")), s"quadratic join in plan: $nodes")
  }

  test("ppJoin is invariant under input repartitioning") {
    val base = SetSimJoin.ppJoin(docs).orderBy("doc_a", "doc_b").collect().toSeq
    val rep = SetSimJoin.ppJoin(docs.repartition(7)).orderBy("doc_a", "doc_b").collect().toSeq
    assert(base == rep)
  }

  test("zipfFit matches a hand-computed OLS on a tiny known vocabulary") {
    import spark.implicits._
    // one lang, vocab {a:4, b:2, c:1} -> ranks 1,2,3
    val synth = Seq((1L, "a a b c", "en"), (2L, "a a b", "en")).toDF("doc_id", "text", "lang")
    val row = CorpusStats.zipfFit(synth).collect().head
    def q(v: Double): Long = math.floor(v.toFloat.toDouble * 1e6).toLong
    val xs = Seq(1L, 2L, 3L).map(r => q(math.log(r.toDouble)))
    val ys = Seq(4L, 2L, 1L).map(f => q(math.log(f.toDouble)))
    val n = 3.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n / 1e6
    assert(row.getAs[Long]("n_types") == 3L)
    assert(row.getAs[Long]("n_tokens") == 7L)
    assert(row.getAs[Double]("zipf_slope") == slope)
    assert(row.getAs[Double]("zipf_intercept") == intercept)
    // natural-ish corpora slope is negative
    assert(slope < 0)
  }

  test("Good-Turing counts-of-counts match hand math incl. the tail-gap NULL") {
    import spark.implicits._
    // "a a a b b c d e": freqs a:3 b:2 c,d,e:1 -> N_1=3, N_2=1, N_3=1; N=8
    val docs = Seq((1L, "a a a b b c d e", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.CorpusStats.goodTuring(docs).orderBy("r").collect()
    assert(out.map(_.getAs[Long]("r")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_r")).toSeq == Seq(3L, 1L, 1L))
    assert(out.map(_.getAs[Long]("tokens_at_r")).toSeq == Seq(3L, 2L, 3L))
    // r*=1: 2*N_2/N_1 = 2/3; r*=2: 3*N_3/N_2 = 3; r=3 has no N_4 -> NULL
    assert(out(0).getAs[Double]("r_star") == 2.0 / 3.0)
    assert(out(1).getAs[Double]("r_star") == 3.0)
    assert(out(2).isNullAt(out(2).fieldIndex("r_star")))
    assert(out(0).getAs[Double]("p_gt") == 2.0 / 3.0 / 8.0)
    // unseen mass P0 = N_1/N = 3/8 on every row
    out.foreach(r => assert(r.getAs[Double]("p0_unseen") == 3.0 / 8.0))
  }

  test("JS divergence is 0 for identical sources, ln 2 for disjoint ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b", "en", "srcA"),
      (2L, "a b a b", "en", "srcB"),   // identical distribution to srcA
      (3L, "x y x y", "en", "srcC")    // disjoint vocabulary
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.text.CorpusStats.jsDivergence(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r)
      .toMap
    assert(out.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    // identical distributions: every per-word ratio is exactly 1 -> ln 1 = 0
    assert(out(("srcA", "srcB")).getAs[Double]("js_nats") == 0.0)
    // disjoint vocabularies: every term is ln 2 (micro-floored once)
    val ln2micro = math.floor(math.log(2.0).toFloat.toDouble * 1e6)
    val expected = ln2micro / 1e6
    assert(out(("srcA", "srcC")).getAs[Double]("js_nats") == expected)
    assert(out(("srcB", "srcC")).getAs[Double]("js_nats") == expected)
    // bits view: disjoint pair sits at ~1 bit (the JS upper bound)
    assert(math.abs(out(("srcA", "srcC")).getAs[Double]("js_bits") - 1.0) < 1e-6)
  }

  test("sourceKl is exactly zero for identically-distributed sources and " +
    "positive for a skewed one") {
    import spark.implicits._
    val synth = Seq(
      (1L, "a a b c", "same0"), (2L, "a a b c", "same1"),   // identical dists
      (3L, "z z z z", "skew")                               // singleton-word source
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceKl(synth).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    // same-dist sources: every ratio is p_s(w)/p(w) with p_s == p only if
    // the mixture equals the source dist; here 'skew' shifts the mixture,
    // so instead check the two identical sources agree exactly
    assert(out("same0") == out("same1"))
    assert(out("skew") > out("same0"))
    assert(out("skew") > 0.1)
    // a corpus of ONE source has KL exactly 0 (every ratio is ln(1)=0)
    val solo = CorpusStats.sourceKl(synth.filter(col("source") === "skew")).collect().head
    assert(solo.getAs[Double]("kl_nats") == 0.0)
  }

  test("sourceOverlap counts cross- and same-source near-dup pairs with exact rates") {
    import spark.implicits._
    val synth = Seq(
      (1L, "a b c d e f", "sA"), (2L, "a b c d e f", "sB"),  // cross pair
      (3L, "a b c d e f", "sB"),                             // sB-sB pair + another cross
      (4L, "q r s t u v", "sA")                              // no pair
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceOverlap(synth).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("dup_rate"))).toMap
    assert(out(("sA", "sB"))._1 == 2L)               // 1-2, 1-3
    assert(out(("sA", "sB"))._2 == 2.0 / (2 * 2))    // 2 pairs / (2 docs x 2 docs)
    assert(out(("sB", "sB"))._1 == 1L)               // 2-3
    assert(out(("sB", "sB"))._2 == 1.0)              // 1 pair / C(2,2)=1
  }

  test("vocabDiagnostics matches hand counts on a planted vocabulary") {
    import spark.implicits._
    // lang en: a a a b b c d -> types 4, tokens 7, hapax {c,d}=2,
    // dis {b}=1, top1 a=3
    val synth = Seq((1L, "a a a b", "en"), (2L, "b c d", "en")).toDF("doc_id", "text", "lang")
    val r = CorpusStats.vocabDiagnostics(synth).collect().head
    assert(r.getAs[Long]("n_types") == 4L)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Double]("type_token_ratio") == 4.0 / 7.0)
    assert(r.getAs[Long]("hapax_types") == 2L)
    assert(r.getAs[Double]("hapax_rate") == 0.5)
    assert(r.getAs[Double]("dis_rate") == 0.25)
    assert(r.getAs[Double]("top1_share") == 3.0 / 7.0)
  }

  test("mixtureWeights flatten the distribution: small sources up, big down") {
    import spark.implicits._
    val synth = Seq(
      (1L, ("w " * 400).trim, "big"),
      (2L, ("w " * 100).trim, "small")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.mixtureWeights(synth).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // sqrt(400)=20, sqrt(100)=10 -> weights 2/3 vs 1/3 exactly (micro-int
    // quantization of integer-rooted counts is exact)
    assert(out("big").getAs[Double]("temp_weight") == 2.0 / 3.0)
    assert(out("small").getAs[Double]("temp_weight") == 1.0 / 3.0)
    assert(out("big").getAs[Double]("natural_share") == 0.8)
    assert(out("small").getAs[Double]("boost") > 1.0, "small source must up-sample")
    assert(out("big").getAs[Double]("boost") < 1.0, "big source must down-sample")
    // weights always sum to 1 exactly at the integer-micro grain
    val sum = CorpusStats.mixtureWeights(docs).agg(
      org.apache.spark.sql.functions.sum("temp_weight")).head().getDouble(0)
    assert(math.abs(sum - 1.0) < 1e-9)
  }

  test("truncated-dim recall ladder self-checks at full width") {
    val e = Tables.embeddings(spark, TinySf)
    val out = graft.sim.Similarity.truncDimRecall(e).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Double]("recall")).toMap
    assert(out.keySet == Set(8L, 16L, 32L, 64L))
    assert(out(64L) == 1.0, "full-width rung must recall the golden set exactly")
    assert(out(8L) <= out(64L))
    assert(out.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("CUSUM fires on a planted sustained shift and stays quiet on the " +
    "stationary prefix") {
    import spark.implicits._
    // 14 days at ~100 with tiny alternating noise, then 14 days at ~130:
    // per-day z never clears a 4-sigma test, but CUSUM accumulates
    val ev = (0 until 28).map { i =>
      val base = if (i < 14) 100.0 else 130.0
      val v = base + (if (i % 2 == 0) 1.0 else -1.0)
      (i.toLong, 1L, "purchase", v,
        java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.gold.Seasonal.cusum(ev).collect()
    val flagsUp = out.filter(_.getAs[Boolean]("shift_up"))
      .map(_.getAs[java.sql.Date]("day").toString)
    assert(flagsUp.nonEmpty, "sustained +2sigma-ish shift must trip CUSUM")
    assert(flagsUp.forall(_ >= "2024-01-15"),
      s"no alarm may fire before the planted shift: $flagsUp")
    // per-day |z| stays modest (the shift is ~1.9 sigma of the pooled
    // series) — the point is accumulation, not a single outlier
    assert(out.map(r => math.abs(r.getAs[Double]("z"))).max < 4.0)
    // stationary series: no alarms either direction
    val flat = (0 until 20).map { i =>
      (i.toLong, 1L, "purchase", 100.0 + (if (i % 2 == 0) 1.0 else -1.0),
        java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val quiet = graft.gold.Seasonal.cusum(flat).collect()
    assert(!quiet.exists(r => r.getAs[Boolean]("shift_up") ||
      r.getAs[Boolean]("shift_down")))
  }

  test("token-count store: base+append equals from-scratch, and zipf served " +
    "from the store is bit-identical to the direct fit") {
    import graft.text.{CorpusStats, TokenCounts}
    val root = java.nio.file.Files
      .createTempDirectory("graft-token-spec").toString
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    TokenCounts.buildStore(a, s"$root/inc")
    TokenCounts.appendStore(b, s"$root/inc")
    TokenCounts.buildStore(docs, s"$root/scratch")
    val inc = TokenCounts.mergedCounts(spark, s"$root/inc")
      .orderBy("lang", "word").collect().toSeq
    val scr = TokenCounts.mergedCounts(spark, s"$root/scratch")
      .orderBy("lang", "word").collect().toSeq
    assert(inc.nonEmpty && inc == scr)
    val viaStore = TokenCounts.zipfFromStore(spark, s"$root/inc")
      .orderBy("lang").collect().toSeq
    val direct = CorpusStats.zipfFit(docs).orderBy("lang").collect().toSeq
    assert(viaStore == direct,
      "store-served zipf must be bit-identical to the direct corpus fit")
  }

  test("zipfFit and sourceKl are invariant under input repartitioning") {
    val z1 = CorpusStats.zipfFit(docs).orderBy("lang").collect().toSeq
    val z2 = CorpusStats.zipfFit(docs.repartition(5)).orderBy("lang").collect().toSeq
    assert(z1 == z2)
    val k1 = CorpusStats.sourceKl(docs).orderBy("source").collect().toSeq
    val k2 = CorpusStats.sourceKl(docs.repartition(5)).orderBy("source").collect().toSeq
    assert(k1 == k2)
  }

  test("readability counts and scores match a hand-computed document") {
    import graft.text.Readability
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("xx", "The cat sat. It ran fast! Done?"), // 7 words, 3 marks, 22 letters, 25 chars
      ("yy", "no terminal marks here")           // mark-free doc floors at 1 sentence
    ).toDF("lang", "text")
    val rows = Readability.byLanguage(df).orderBy("lang").collect()
    val xx = rows(0)
    assert(xx.getLong(2) == 7L && xx.getLong(3) == 3L &&
      xx.getLong(4) == 22L && xx.getLong(5) == 25L)
    val ari = 4.71 * (25.0 / 7.0) + 0.5 * (7.0 / 3.0) - 21.43
    val cli = 0.0588 * ((22.0 / 7.0) * 100.0) - 0.296 * ((3.0 / 7.0) * 100.0) - 15.8
    assert(xx.getDouble(6) == ari && xx.getDouble(7) == cli)
    val yy = rows(1)
    assert(yy.getLong(2) == 4L && yy.getLong(3) == 1L)
  }

  test("blocklist tagger matches the per-pattern contains definition on real docs") {
    import graft.text.Blocklist
    val tagged = Blocklist.tagDocs(docs).orderBy("doc_id")
    val naive = docs.select(col("doc_id"),
      filter(
        expr(Blocklist.DefaultTags.map(t => s"'$t'").mkString("array(", ", ", ")")),
        t => col("text").contains(t)).as("tags"))
      .select(col("doc_id"), size(col("tags")).cast("long").as("n_tags"),
        array_join(col("tags"), ",").as("tags_csv"))
      .orderBy("doc_id")
    assert(tagged.select("doc_id", "n_tags", "tags_csv").collect().toSeq ==
      naive.collect().toSeq)
    // the corpus actually exercises multi-word and overlapping tags
    assert(tagged.filter(col("tags_csv").contains("hash join")).count() > 0)
    val summary = Blocklist.tagSummary(docs)
    assert(summary.count() > 0 &&
      summary.filter(col("tag") === "fraud alert").count() == 0)
  }

  test("skipgram pairs match hand enumeration and are symmetric") {
    import graft.text.Colloc
    val spark2 = spark
    import spark2.implicits._
    // "a b c a", window 2: d1 = (a,b),(b,c),(c,a); d2 = (a,c),(b,a)
    val df = Seq("a b c a").toDF("text")
    val out = Colloc.skipgramPairs(df, window = 2, minCount = 1)
      .orderBy("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("weight_micro"))).toSeq
    assert(out == Seq(
      ("a", "b", 2L, 1500000L),
      ("a", "c", 2L, 1500000L),
      ("b", "a", 2L, 1500000L),
      ("b", "c", 1L, 1000000L),
      ("c", "a", 2L, 1500000L),
      ("c", "b", 1L, 1000000L)))
    // symmetry on the real corpus: X_ij == X_ji
    val real = Colloc.skipgramPairs(Tables.documents(spark, TinySf), 2, 1)
    val asym = real.select(col("center").as("c1"), col("context").as("c2"),
        col("n_pairs").as("n12"), col("weight_micro").as("w12"))
      .join(real.select(col("context").as("c1"), col("center").as("c2"),
        col("n_pairs").as("n21"), col("weight_micro").as("w21")), Seq("c1", "c2"))
      .filter(col("n12") =!= col("n21") || col("w12") =!= col("w21")).count()
    assert(asym == 0, "skip-gram co-occurrence must be symmetric")
  }

  test("vocab coverage: crossing prefix is minimal and shares are exact") {
    import graft.text.CorpusStats
    val spark2 = spark
    import spark2.implicits._
    // counts: a 10, b 5, c 4, d 1 -> T = 20.
    // 50%: cum(a)=10 >= 10 -> vocab 1 (share .5); 90%: cum(abc)=19 >= 18
    // -> vocab 3 (share .95); 95%: same row; 99%: needs d -> vocab 4.
    val docs = Seq((1L,
      (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(4)("c") ++ Seq("d"))
        .mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(docs).orderBy("p_pct").collect()
    val byP = out.map(r => r.getAs[Long]("p_pct") -> r).toMap
    assert(byP(50L).getAs[Long]("vocab_size") == 1L)
    assert(byP(50L).getAs[String]("crossing_token") == "a")
    assert(byP(50L).getAs[Double]("covered_share") == 0.5)
    assert(byP(90L).getAs[Long]("vocab_size") == 3L)
    assert(byP(95L).getAs[Long]("vocab_size") == 3L)
    assert(byP(95L).getAs[Double]("covered_share") == 0.95)
    assert(byP(99L).getAs[Long]("vocab_size") == 4L)
    assert(byP(99L).getAs[Long]("total_tokens") == 20L)
  }

  test("negative-sampling table: smoothed weights, disjoint covering ranges, " +
    "min-count floor") {
    import graft.text.CorpusStats
    val spark2 = spark
    import spark2.implicits._
    // counts: the 16, of 8, rare 1 (dropped by minCount=2)
    val docs = Seq((1L, (Seq.fill(16)("the") ++ Seq.fill(8)("of") ++ Seq("rare"))
      .mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.negativeSampling(docs, minCount = 2)
      .orderBy("token").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("of", "the"))
    def w(c: Long): Long = math.floor(
      math.exp(0.75 * math.log(c.toDouble).toFloat.toDouble).toFloat.toDouble * 1e6).toLong
    val byT = out.map(r => r.getString(0) -> r).toMap
    assert(byT("the").getAs[Long]("w_micro") == w(16))
    assert(byT("of").getAs[Long]("w_micro") == w(8))
    // smoothing: 16/8 = 2x count ratio compresses to 2^0.75 in weight
    assert(byT("the").getAs[Long]("w_micro") < 2L * byT("of").getAs[Long]("w_micro"))
    // ranges tile [0, total) with no gap or overlap, in token order
    val total = w(16) + w(8)
    assert(byT("of").getAs[Long]("cum_start") == 0L)
    assert(byT("of").getAs[Long]("cum_end") == byT("the").getAs[Long]("cum_start"))
    assert(byT("the").getAs[Long]("cum_end") == total)
    assert(out.map(_.getAs[Double]("p")).sum == 1.0)
  }
}
