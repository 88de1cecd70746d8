package graft

import graft.gold.{Attribution, Drift, Forensics, Rings}
import graft.ml.Evaluation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** r8 evaluation/monitoring family: exact ROC-AUC, calibration bins,
  * binned drift (PSI/chi²/KS), Benford screen, shared-device ring pairs,
  * and multi-touch attribution. */
class EvalDriftSpec extends SparkSpec {

  import spark.implicits._

  // ---- ROC-AUC ----

  test("rocAuc matches the hand-computed Mann–Whitney value with ties") {
    // scores: pos {0.9, 0.8, 0.5}, neg {0.5, 0.3, 0.1}
    // pairs (pos > neg): 0.9 beats all 3; 0.8 beats all 3; 0.5 beats 2
    // and ties 1 → U = 3 + 3 + 2.5 = 8.5, AUC = 8.5 / 9
    val df = Seq(
      (1L, 0.9f, 1L), (2L, 0.8f, 1L), (3L, 0.5f, 1L),
      (4L, 0.5f, 0L), (5L, 0.3f, 0L), (6L, 0.1f, 0L)
    ).toDF("id", "score", "label")
    val r = Evaluation.rocAuc(df, "score", "label", "id").collect().head
    assert(r.getAs[Long]("pos_n") === 3L)
    assert(r.getAs[Long]("neg_n") === 3L)
    assert(math.abs(r.getAs[Double]("auc") - 8.5 / 9.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("gini") - (2 * 8.5 / 9.0 - 1)) < 1e-12)
  }

  test("rocAuc is 1.0 on perfectly separated scores and 0.5 on a constant") {
    val perfect = Seq((1L, 0.9f, 1L), (2L, 0.8f, 1L), (3L, 0.2f, 0L), (4L, 0.1f, 0L))
      .toDF("id", "score", "label")
    assert(Evaluation.rocAuc(perfect, "score", "label", "id")
      .collect().head.getAs[Double]("auc") === 1.0)
    // all-tied scores: every pos/neg pair is a tie → AUC exactly 0.5
    val const = Seq((1L, 0.5f, 1L), (2L, 0.5f, 1L), (3L, 0.5f, 0L), (4L, 0.5f, 0L))
      .toDF("id", "score", "label")
    assert(Evaluation.rocAuc(const, "score", "label", "id")
      .collect().head.getAs[Double]("auc") === 0.5)
  }

  test("literal fraud scorer has real ranking power on the testdata") {
    val r = Queries.all("q_roc_auc")(spark, TinySf).collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc > 0.8 && auc <= 1.0, s"literal scorer AUC $auc")
  }

  // ---- calibration ----

  test("calibration bins partition the scored rows and bound the rates") {
    val cal = Queries.all("q_calibration")(spark, TinySf).collect()
    val scored = Queries.all("q_fraud_score")(spark, TinySf)
    assert(cal.map(_.getAs[Long]("n")).sum === scored.count())
    cal.foreach { r =>
      val n = r.getAs[Long]("n"); val pos = r.getAs[Long]("positives")
      assert(pos >= 0 && pos <= n)
      val lo = r.getAs[Double]("bin_lo")
      val mp = r.getAs[Double]("mean_pred")
      // micro-quantization can pull mean_pred at most 1e-6 below the bin
      assert(mp >= lo - 1e-6 && mp < lo + 0.1 + 1e-6,
        s"mean_pred $mp outside bin [$lo, ${lo + 0.1})")
    }
  }

  // ---- threshold sweep ----

  test("thresholdSweep rows satisfy the confusion-matrix identities and agree with q_model_eval") {
    val rows = Queries.all("q_threshold_sweep")(spark, TinySf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fp") +
      rows.head.getAs[Long]("fn") + rows.head.getAs[Long]("tn")
    var lastRecall = Double.MaxValue
    rows.foreach { r =>
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn === total, "confusion matrix must cover all rows")
      assert(tp + fn === rows.head.getAs[Long]("tp") + rows.head.getAs[Long]("fn"),
        "positives are threshold-invariant")
      // recall is non-increasing in the threshold
      val rec = r.getAs[Double]("recall")
      assert(rec <= lastRecall + 1e-12)
      lastRecall = rec
    }
    // on the SAME held-out split q_model_eval uses, the sweep's 0.5
    // operating point must reproduce its confusion matrix
    import graft.ml.FraudScore
    import graft.operators.{Cleaning, Enrichment}
    val scoredTest = FraudScore.withSplit(FraudScore.score(FraudScore.featureVector(
        Enrichment.enrichOrders(Cleaning.cleanOrders(Tables.orders(spark, TinySf)),
          Tables.customer(spark, TinySf), Tables.nation(spark, TinySf),
          Tables.region(spark, TinySf)))))
      .filter(col("is_test"))
    val sweepTest = graft.ml.Evaluation
      .thresholdSweep(scoredTest, "fraud_score", "label", 20).collect()
    val at05 = sweepTest.find(_.getAs[Double]("threshold") === 0.5)
    val eval = Queries.all("q_model_eval")(spark, TinySf).collect().head
    at05.foreach { r =>
      assert(r.getAs[Long]("tp") === eval.getAs[Long]("tp"))
      assert(r.getAs[Long]("fp") === eval.getAs[Long]("fp"))
      assert(r.getAs[Long]("fn") === eval.getAs[Long]("fn"))
      assert(r.getAs[Long]("tn") === eval.getAs[Long]("tn"))
    }
    assert(at05.nonEmpty, "0.5 bin unoccupied at this SF — widen the check")
  }

  // ---- int8 search ----

  test("knnInt8 recall@10 vs the float brute golden set is >= 0.9") {
    import graft.sim.{Quantize, Similarity}
    val emb = Tables.embeddings(spark, TinySf)
    val golden = Similarity.knnBrute(emb).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Quantize.knnInt8(emb).select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = golden.intersect(got).size.toDouble / golden.size
    assert(recall >= 0.9, s"int8 recall@10 = $recall")
  }

  // ---- drift ----

  test("binnedDrift is ~zero on identical halves and flags a planted shift") {
    val same = (1 to 1000).map(i => (i.toLong, if (i % 2 == 0) "x" else "y", i % 4 < 2))
      .toDF("id", "bin", "in_a")
    val ord = when(col("bin") === "x", 0L).otherwise(1L)
    val psiSame = Drift.binnedDrift(same, col("bin"), ord, col("in_a"), 2)
      .agg(sum("psi_term")).as[Double].head()
    assert(math.abs(psiSame) < 1e-4, s"psi on identical halves: $psiSame")

    // period B heavily shifted toward bin y
    val shifted = (1 to 1000).map { i =>
      val inA = i <= 500
      val bin = if (inA) (if (i % 2 == 0) "x" else "y")
                else (if (i % 10 == 0) "x" else "y")
      (i.toLong, bin, inA)
    }.toDF("id", "bin", "in_a")
    val drifted = Drift.binnedDrift(shifted, col("bin"), ord, col("in_a"), 2)
    val psi = drifted.agg(sum("psi_term")).as[Double].head()
    assert(psi > 0.2, s"psi on shifted halves: $psi")
    // binned KS: ECDF gap at bin x is |0.5 - 0.1| = 0.4
    val ks = drifted.agg(max("ecdf_gap")).as[Double].head()
    assert(math.abs(ks - 0.4) < 1e-9)
  }

  // ---- Benford ----

  test("leadingDigit is exact on decimal boundaries") {
    val df = Seq(999.99, 1000.00, 100.00, 1.23, 95000.50).toDF("amt")
      .select(Forensics.leadingDigit(col("amt")).as("d"))
    assert(df.as[Long].collect().toSeq === Seq(9L, 1L, 1L, 1L, 9L))
  }

  test("benford passes Benford-like data and flags uniform leading digits") {
    // Benford-ish: amounts 10^(u) for u uniform in [0,3) have Benford digits
    val ben = (0 until 3000).map { i =>
      val u = i / 1000.0 // deterministic grid over [0,3)
      ("s", math.pow(10.0, u))
    }.toDF("seg", "amt")
    val benChi = Forensics.benford(ben, col("seg"), col("amt"))
      .agg(sum("chi2_term")).as[Double].head()
    // fabricated: every amount starts with digit 5
    val fab = (0 until 3000).map(i => ("s", 5000.0 + i % 100)).toDF("seg", "amt")
    val fabChi = Forensics.benford(fab, col("seg"), col("amt"))
      .agg(sum("chi2_term")).as[Double].head()
    // chi² critical value at 8 df / p=0.001 is 26.1
    assert(benChi < 26.1, s"Benford grid flagged: $benChi")
    assert(fabChi > 1000.0, s"uniform-digit data not flagged: $fabChi")
  }

  // ---- shared-device rings ----

  test("sharedDevicePairs finds a planted ring and drops hot buckets") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    def ev(id: Long, user: Long, device: Int, dayOff: Int) =
      (id, new java.sql.Timestamp(ts0.getTime + dayOff * 86400000L), user,
        "purchase", 1.0, s"""{"k": $device}""")
    // ring: users 1,2,3 share device 7 on day 0; pair (1,2) also on day 1
    val ring = Seq(ev(1, 1, 7, 0), ev(2, 2, 7, 0), ev(3, 3, 7, 0),
      ev(4, 1, 7, 1), ev(5, 2, 7, 1))
    // hot bucket: 60 users on device 9 (NAT artifact) — excluded by governor
    val hot = (100 until 160).map(u => ev(u.toLong, u.toLong, 9, 0))
    // singleton: user 50 alone on device 3
    val solo = Seq(ev(200, 50, 3, 0))
    val events = (ring ++ hot ++ solo)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val pairs = Rings.sharedDevicePairs(events).collect()
    val byPair = pairs.map(r => ((r.getAs[Long]("user_a"), r.getAs[Long]("user_b")),
      r.getAs[Long]("shared_device_days"))).toMap
    assert(byPair.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected only the ring pairs, got ${byPair.keySet}")
    assert(byPair((1L, 2L)) === 2L) // shared on both days
    assert(byPair((1L, 3L)) === 1L)
  }

  // ---- attribution ----

  test("multiTouch credits sum to purchase value; first/last and window bounds hold") {
    val base = java.sql.Timestamp.valueOf("2024-01-10 12:00:00").getTime
    def ev(id: Long, user: Long, typ: String, minOff: Long, value: Double) =
      (id, new java.sql.Timestamp(base + minOff * 60000L), user, typ, value, "{}")
    val events = Seq(
      ev(1, 1, "click", -300, 0.0),   // 5h before — in window
      ev(2, 1, "view", -100, 0.0),    // in window
      ev(3, 1, "click", -30, 0.0),    // in window (last touch)
      ev(4, 1, "purchase", 0, 90.0),
      ev(5, 1, "click", -1500, 0.0),  // 25h before — outside 24h
      ev(6, 1, "click", 10, 0.0),     // after purchase — excluded
      ev(7, 2, "purchase", 0, 50.0),  // no touches → no rows
      ev(8, 3, "view", -10, 0.0),
      ev(9, 3, "purchase", 0, 10.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val att = Attribution.multiTouch(events).collect()
    val byPurchase = att.groupBy(_.getAs[Long]("purchase_id"))
    assert(byPurchase.keySet === Set(4L, 9L))
    val p4 = byPurchase(4L)
    assert(p4.map(_.getAs[Long]("touch_id")).toSet === Set(1L, 2L, 3L))
    assert(math.abs(p4.map(_.getAs[Double]("credit_linear")).sum - 90.0) < 1e-9)
    assert(p4.filter(_.getAs[Boolean]("is_first_touch"))
      .map(_.getAs[Long]("touch_id")).toSeq === Seq(1L))
    assert(p4.filter(_.getAs[Boolean]("is_last_touch"))
      .map(_.getAs[Long]("touch_id")).toSeq === Seq(3L))
    val p9 = byPurchase(9L)
    assert(p9.length === 1 &&
      p9.head.getAs[Boolean]("is_first_touch") && p9.head.getAs[Boolean]("is_last_touch"))
  }

  test("attribution rollup: channel credits partition the purchase value") {
    import graft.gold.Attribution
    val ev = Tables.events(spark, TinySf)
    val pairGrain = Attribution.multiTouch(ev)
    val rollup = Attribution.creditRollup(ev).collect()
    assert(rollup.nonEmpty)
    // channel touch counts partition the pair-grain rows
    val totalTouches = rollup.map(_.getAs[Long]("touches")).sum
    assert(totalTouches == pairGrain.count())
    // micro-quantized linear credits sum exactly to the per-row quanta
    val directMicro = pairGrain
      .select(floor(col("credit_linear") * lit(1000000.0)).cast("long").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    assert(rollup.map(_.getAs[Long]("linear_credit_micro")).sum == directMicro)
    // first/last counts both partition the distinct purchase set
    val nPurch = pairGrain.select("purchase_id").distinct().count()
    assert(rollup.map(_.getAs[Long]("n_first")).sum == nPurch)
    assert(rollup.map(_.getAs[Long]("n_last")).sum == nPurch)
  }

  test("multiTouch day-bin pairing crosses midnight (lookback spans two days)") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-09 23:30:00"), 1L, "click", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-10 00:30:00"), 1L, "purchase", 20.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val att = Attribution.multiTouch(events).collect()
    assert(att.length === 1 && att.head.getAs[Long]("touch_id") === 1L)
  }

  // ---- label-noise screen ----

  test("label-noise screen flags a planted mislabel and clears correct labels") {
    def v(x: Float, y: Float) = Array(x, y)
    // two tight clusters; vec 0 sits in the label-0 cluster but carries
    // label 1 (the planted mislabel); vec 1 is correctly labeled
    val emb = (
      Seq((0L, v(1f, 0.01f), 1), (1L, v(1f, -0.01f), 0)) ++
      (2L to 6L).map(i => (i, v(1f, 0.02f * i), 0)) ++
      (7L to 11L).map(i => (i, v(0.01f * i, 1f), 1))
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ml.LabelNoise.screen(emb, numQueries = 2, k = 5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 2)
    // the mislabeled vector: all 5 nearest neighbors are label 0
    assert(out(0L).getAs[Long]("n_disagree") == 5L)
    assert(out(0L).getAs[Boolean]("suspected_mislabel"))
    // the correctly labeled twin: same neighborhood, agreeing labels
    assert(out(1L).getAs[Long]("n_disagree") <= 1L)
    assert(!out(1L).getAs[Boolean]("suspected_mislabel"))
  }

  test("ANN-backed label-noise sweep recovers planted mislabels on a known geometry") {
    def v(x: Float, y: Float) = Array(x, y)
    // two tight 40-vector clusters; vecs 0 and 1 sit INSIDE the label-0
    // cluster but carry label 1 (planted mislabels); vecs 2,3 are correct
    val emb = (
      Seq((0L, v(1f, 0.011f), 1), (1L, v(1f, -0.011f), 1),
          (2L, v(1f, 0.013f), 0), (3L, v(1f, -0.013f), 0)) ++
      (4L to 41L).map(i => (i, v(1f, 0.001f * i), 0)) ++
      (42L to 79L).map(i => (i, v(0.001f * i, 1f), 1))
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ml.LabelNoise.screenAnn(emb, numQueries = 4, k = 8,
        nlist = 4, nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 4)
    Seq(0L, 1L).foreach { d =>
      assert(out(d).getAs[Boolean]("suspected_mislabel"),
        s"planted mislabel $d not flagged: ${out(d)}")
    }
    Seq(2L, 3L).foreach { d =>
      assert(!out(d).getAs[Boolean]("suspected_mislabel"),
        s"correct label $d falsely flagged: ${out(d)}")
    }
  }

  // ---- retrieval eval (MRR / nDCG / P@k / R@k) ----

  test("retrieval eval metrics on a corpus with known geometry") {
    // 1-D-ish embeddings on two well-separated directions: label 0 points
    // near (1, 0), label 1 points near (0, 1). Query 0 (label 0) has its
    // two same-label neighbors at ranks 1-2 of 4 → perfect front-loading.
    def v(x: Float, y: Float) = Array(x, y)
    val emb = Seq(
      (0L, v(1f, 0f), 0),       // query
      (1L, v(0.99f, 0.1f), 0),  // same-label, closest
      (2L, v(0.98f, 0.2f), 0),  // same-label, second
      (3L, v(0.1f, 0.99f), 1),
      (4L, v(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ml.RetrievalEval.evalBruteKnn(emb, numQueries = 1, k = 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("hits") == 2L)
    assert(math.abs(r.getAs[Double]("p_at_k") - 0.5) < 1e-12)      // 2/4
    assert(math.abs(r.getAs[Double]("r_at_k") - 1.0) < 1e-12)      // 2/2
    assert(math.abs(r.getAs[Double]("mrr") - 1.0) < 1e-12)         // rank 1
    // both relevant at ranks 1,2 and IDCG truncates at n_rel=2 → nDCG=1
    assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-12)
  }

  test("retrieval eval: late hit discounts nDCG and MRR exactly") {
    // query (label 0): same-label neighbor ranked LAST of 3
    def v(x: Float, y: Float) = Array(x, y)
    val emb = Seq(
      (0L, v(1f, 0f), 0),
      (1L, v(0.0f, 1.0f), 1),
      (2L, v(0.1f, 0.99f), 1),
      (3L, v(0.5f, 0.86f), 0)  // same-label; cos≈0.50 → ranks FIRST here
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ml.RetrievalEval.evalBruteKnn(emb, numQueries = 1, k = 3)
      .collect().head
    // ranking by cosine to (1,0): id3 (0.503), id2 (0.100), id1 (0.0)
    // → the single relevant doc is at rank 1
    assert(out.getAs[Long]("hits") == 1L)
    assert(math.abs(out.getAs[Double]("mrr") - 1.0) < 1e-12)
    assert(math.abs(out.getAs[Double]("ndcg") - 1.0) < 1e-12)
    // invert: make the relevant doc the farthest
    val emb2 = Seq(
      (0L, v(1f, 0f), 0),
      (1L, v(0.9f, 0.43f), 1),
      (2L, v(0.8f, 0.6f), 1),
      (3L, v(0.0f, 1.0f), 0)   // relevant, orthogonal → rank 3
    ).toDF("vec_id", "embedding", "label")
    val out2 = graft.ml.RetrievalEval.evalBruteKnn(emb2, numQueries = 1, k = 3)
      .collect().head
    assert(out2.getAs[Long]("hits") == 1L)
    assert(math.abs(out2.getAs[Double]("mrr") - 1.0 / 3.0) < 1e-12)
    // nDCG = disc(3)/disc(1) in micro-units: round(1e6/ln 4)/round(1e6/ln 2)
    val expected = math.round(1e6 / math.log(4)).toDouble /
      math.round(1e6 / math.log(2)).toDouble
    assert(math.abs(out2.getAs[Double]("ndcg") - expected) < 1e-12)
  }

  // ---- DeLong paired-AUC comparison ----

  test("delongCompare matches hand-computed DeLong statistics with ties") {
    // m = n = 2. Scorer A: pos {3, 1}, neg {2, 1} -> AUC_A = 2.5/4 = 0.625
    // Scorer B (same rows): pos {2, 2}, neg {1, 3} -> AUC_B = 2/4 = 0.5
    // Structural components (by psi definition):
    //   V10a = {1, 0.25}, V10b = {0.5, 0.5}; V01a = {0.5, 0.75}, V01b = {1, 0}
    //   S10aa = 0.28125, S10bb = 0, S10ab = 0
    //   S01aa = 0.03125, S01bb = 0.5, S01ab = -0.125
    //   var = 0.28125/2 + (0.03125 + 0.5 + 0.25)/2 = 0.53125
    val df = Seq(
      (3.0f, 2.0f, 1L), (1.0f, 2.0f, 1L), (2.0f, 1.0f, 0L), (1.0f, 3.0f, 0L)
    ).toDF("sa", "sb", "label")
    val r = Evaluation.delongCompare(df, "sa", "sb", "label").collect().head
    assert(r.getAs[Long]("pos_n") == 2L && r.getAs[Long]("neg_n") == 2L)
    assert(r.getAs[Double]("auc_a") == 0.625)
    assert(r.getAs[Double]("auc_b") == 0.5)
    assert(r.getAs[Double]("delta") == 0.125)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(0.53125)) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 0.125 / math.sqrt(0.53125)) < 1e-12)
  }

  test("delongCompare is rank-invariant: a monotone transform has delta 0, se 0") {
    val df = Seq(
      (0.9f, 1L), (0.7f, 1L), (0.7f, 0L), (0.3f, 0L), (0.1f, 0L)
    ).toDF("s", "label")
      .withColumn("s2", col("s") * 2.0f) // same ranks, different values
    val r = Evaluation.delongCompare(df, "s", "s2", "label").collect().head
    assert(r.getAs[Double]("auc_a") == r.getAs[Double]("auc_b"))
    assert(r.getAs[Double]("delta") == 0.0)
    assert(r.getAs[Double]("se") == 0.0, "identical-rank scorers have zero variance of the difference")
    assert(r.isNullAt(r.fieldIndex("z")), "z is undefined at zero variance")
  }

  test("aucBySegment: per-segment AUC matches rocAuc and degenerate segments go NULL") {
    // segment "x" reuses the rocAuc hand example (AUC = 8.5/9);
    // segment "y" has no negatives -> auc/se NULL
    val df = Seq(
      ("x", 0.9f, 1L), ("x", 0.8f, 1L), ("x", 0.5f, 1L),
      ("x", 0.5f, 0L), ("x", 0.3f, 0L), ("x", 0.1f, 0L),
      ("y", 0.7f, 1L), ("y", 0.2f, 1L)
    ).toDF("seg", "score", "label")
    val rows = Evaluation.aucBySegment(df, "seg", "score", "label")
      .orderBy("segment").collect()
    val x = rows(0)
    assert(x.getAs[String]("segment") == "x")
    assert(x.getAs[Long]("pos_n") == 3L && x.getAs[Long]("neg_n") == 3L)
    assert(math.abs(x.getAs[Double]("auc") - 8.5 / 9.0) < 1e-15)
    assert(x.getAs[Double]("se") > 0.0)
    assert(x.getAs[Double]("ci_lo") < x.getAs[Double]("auc") &&
      x.getAs[Double]("auc") < x.getAs[Double]("ci_hi"))
    val y = rows(1)
    assert(y.getAs[Long]("neg_n") == 0L)
    assert(y.isNullAt(y.fieldIndex("auc")) && y.isNullAt(y.fieldIndex("se")))
    // single-segment consistency with rocAuc on the same data
    val whole = Evaluation.rocAuc(
      df.filter(col("seg") === "x").withColumn("id", monotonically_increasing_id()),
      "score", "label", "id").collect().head.getAs[Double]("auc")
    assert(x.getAs[Double]("auc") == whole)
  }

  test("conformal thresholds select the exact calibration rank and guard overflow alphas") {
    // calibration negatives (ids 1..4): scores .1 .2 .3 .4 -> n_cal = 4
    // alpha = 0.5: k = ceil(5 * 0.5) = 3 -> threshold = 0.3
    // alpha = 0.01: k = ceil(5 * 0.99) = 5 > n_cal -> NULL threshold, no flags
    val df = Seq(
      (1L, 0.1f, 0L), (2L, 0.2f, 0L), (3L, 0.3f, 0L), (4L, 0.4f, 0L),
      (6L, 0.9f, 1L),                    // calibration positive: ignored
      (5L, 0.35f, 0L), (10L, 0.25f, 1L)  // test slice (id % 5 == 0)
    ).toDF("id", "score", "label")
    val rows = Evaluation.conformalThresholds(df, "score", "label", "id",
      alphas = Seq(0.5, 0.01)).orderBy("alpha").collect()
    val strict = rows(0) // alpha = 0.01
    assert(strict.getAs[Long]("n_cal") == 4L && strict.getAs[Long]("k") == 5L)
    assert(strict.isNullAt(strict.fieldIndex("threshold")))
    assert(strict.getAs[Long]("false_flags") == 0L &&
      strict.getAs[Long]("detected") == 0L)
    val loose = rows(1) // alpha = 0.5
    assert(loose.getAs[Long]("k") == 3L)
    assert(loose.getAs[Float]("threshold") == 0.3f)
    assert(loose.getAs[Long]("n_test_neg") == 1L &&
      loose.getAs[Long]("false_flags") == 1L) // 0.35 > 0.3
    assert(loose.getAs[Long]("n_test_pos") == 1L &&
      loose.getAs[Long]("detected") == 0L)    // 0.25 <= 0.3
    assert(loose.getAs[Double]("fp_rate") == 1.0 &&
      loose.getAs[Double]("recall") == 0.0)
  }

  test("CUPED recovers the exact theta on a planted linear relation and kills its variance") {
    import graft.gold.Experiment
    // two orders per customer: pre-period spend x = i, post-period y = 2i
    // -> theta == 2.0 exactly (all moment sums fit doubles exactly),
    // adjusted metric y' = 2*xbar is CONSTANT -> variance ~ 0
    val rows = (1 to 100).flatMap { i =>
      Seq((i.toLong, i.toDouble, java.sql.Date.valueOf("1996-06-01")),
        (i.toLong, 2.0 * i, java.sql.Date.valueOf("1997-06-01")))
    }.toDF("o_custkey", "o_totalprice", "order_date")
    val out = Experiment.cuped(rows).orderBy("arm").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Double]("theta") == 2.0, s"theta ${r.getAs[Double]("theta")}")
      assert(r.getAs[Double]("var_y_adj") < 1e-3,
        s"adjusted variance ${r.getAs[Double]("var_y_adj")}")
      assert(r.getAs[Double]("var_reduction") > 0.99)
    }
    // CUPED preserves the pooled mean (up to micro-quantization)
    val pooledRaw = out.map(r => r.getAs[Double]("mean_y") * r.getAs[Long]("n")).sum
    val pooledAdj = out.map(r => r.getAs[Double]("mean_y_adj") * r.getAs[Long]("n")).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-3,
      s"pooled mean moved: $pooledRaw vs $pooledAdj")
  }

  test("EWMA chart matches a hand walk and flags a planted sustained shift") {
    import graft.gold.Seasonal
    // burn-in: 14 days alternating 90/110 (mu=100, sigma^2=1400/13);
    // then 10 in-control days at 100, then a sustained shift to 130.
    val ys = (1 to 14).map(i => if (i % 2 == 1) 90.0 else 110.0) ++
      Seq.fill(10)(100.0) ++ Seq.fill(12)(130.0)
    val rows = ys.zipWithIndex.map { case (y, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), y)
    }.toDF("order_date", "o_totalprice")
    val out = Seasonal.ewmaChart(rows).collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.size == 36)
    // replicate the exact chain
    val mu = ys.take(14).foldLeft(0.0)(_ + _) / 14.0
    val sigma = math.sqrt(
      ys.take(14).foldLeft(0.0)((a, y) => a + (y - mu) * (y - mu)) / 13.0)
    assert(out(1L).getAs[Double]("center") == mu)
    assert(out(1L).getAs[Double]("sigma") == sigma)
    var z = mu
    for ((y, i) <- ys.zipWithIndex) {
      z = 0.2 * y + 0.8 * z
      val t = i + 1
      assert(out(t.toLong).getAs[Double]("ewma") == z, s"z mismatch at t=$t")
      val hw = 3.0 * sigma * math.sqrt((0.2 / 1.8) *
        (1.0 - math.pow(0.64, t.toDouble).toFloat.toDouble))
      assert(out(t.toLong).getAs[Double]("halfwidth") == hw, s"hw mismatch at t=$t")
    }
    // in-control region never flags; the sustained shift does
    assert((1 to 24).forall(t => !out(t.toLong).getAs[Boolean]("out_of_control")))
    assert((28 to 36).forall(t => out(t.toLong).getAs[Boolean]("out_of_control")),
      "sustained +3-sigma-scale shift must push the EWMA out of the band")
  }

  test("exact KS matches hand-computed sup gaps and handles degenerate segments") {
    import graft.gold.Drift
    // s1: A = {1,2,3}, B = {2,3,4} → inclusive gaps |ia·nB − ib·nA| over
    // pooled values (1,2,3,4) = (3,3,3,0) → d_num = 3, D = 3/9 = 1/3,
    // λ = sqrt(9/6)/3. s2: disjoint A = {1,2} < B = {10,20} → D = 1,
    // λ = sqrt(4/4)·1 = 1 (still under the 1.358 cut: tiny samples
    // cannot reject). s3: B empty → NULL stats, reject false.
    val rows = Seq(
      ("s1", 1L, true), ("s1", 2L, true), ("s1", 3L, true),
      ("s1", 2L, false), ("s1", 3L, false), ("s1", 4L, false),
      ("s2", 1L, true), ("s2", 2L, true), ("s2", 10L, false), ("s2", 20L, false),
      ("s3", 5L, true), ("s3", 6L, true)
    ).toDF("seg", "v", "a")
    val out = Drift.ksExact(rows, col("seg"), col("v"), col("a"))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(out("s1").getAs[Long]("d_num") === 3L)
    assert(out("s1").getAs[Double]("ks_stat") === 1.0 / 3.0)
    assert(out("s1").getAs[Double]("lam") === math.sqrt(9.0 / 6.0) * (1.0 / 3.0))
    assert(!out("s1").getAs[Boolean]("reject_05"))
    assert(out("s2").getAs[Double]("ks_stat") === 1.0)
    assert(out("s2").getAs[Double]("lam") === 1.0)
    // truncated Kolmogorov p at λ=1 with the float32-collapsed exps
    def c(x: Double) = x.toFloat.toDouble
    val p1 = 2.0 * (c(math.exp(-2.0)) - c(math.exp(-8.0)) + c(math.exp(-18.0)))
    assert(out("s2").getAs[Double]("p_approx") === p1)
    assert(out("s3").isNullAt(out("s3").fieldIndex("ks_stat")))
    assert(!out("s3").getAs[Boolean]("reject_05"))
  }

  test("exact KS fires on a planted variance change that leaves the median put") {
    import graft.gold.Drift
    // A: 400 points tightly packed around 0 (±1); B: 400 points at ±50.
    // Medians identical; the ECDF gap at v = −2 is |200·400 − 0·400|
    // = huge → D = 0.5, λ = sqrt(160000/800)·0.5 ≈ 7.07 → reject.
    val a = (1 to 200).flatMap(i => Seq(("g", -1L, true), ("g", 1L, true)))
    val b = (1 to 200).flatMap(i => Seq(("g", -50L, false), ("g", 50L, false)))
    val r = Drift.ksExact((a ++ b).toDF("seg", "v", "a"),
      col("seg"), col("v"), col("a")).collect().head
    assert(r.getAs[Double]("ks_stat") === 0.5)
    assert(r.getAs[Boolean]("reject_05"))
    assert(r.getAs[Double]("p_approx") < 1e-10)
  }

  test("Mann-Kendall matches the hand-computed S, tie-corrected variance, z") {
    import graft.gold.Seasonal
    // one series, 5 days, day totals 10, 20, 15, 20, 30 (cents ×100):
    // S = Σ sgn = +1+1+1+1 −1 +0 +1 +1 +1 +1 = 7; n=5 → n(n−1)(2n+5)=300;
    // the tied value 2000 (t=2) subtracts 2·1·9=18 → var_num18 = 282;
    // z = (7−1)/sqrt(282/18) = 6/sqrt(15.666…) ≈ 1.516 → no_trend.
    val rows = Seq(10.0, 20.0, 15.0, 20.0, 30.0).zipWithIndex.map { case (v, i) =>
      ("click", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("event_type", "ts", "value")
    val r = Seasonal.mannKendall(rows).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("s_stat") === 7L)
    assert(r.getAs[Long]("var_num18") === 282L)
    assert(r.getAs[Double]("z") === 6.0 / math.sqrt(282.0 / 18.0))
    assert(r.getAs[String]("trend") === "no_trend")
  }

  test("Mann-Kendall: strictly increasing series flags 'increasing'; " +
    "all-tied series reports NULL z / n/a") {
    import graft.gold.Seasonal
    val up = (1 to 10).map(i =>
      ("buy", java.sql.Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"), i * 10.0))
    val flat = (1 to 4).map(i =>
      ("flat", java.sql.Timestamp.valueOf(f"2024-02-$i%02d 12:00:00"), 50.0))
    val out = Seasonal.mannKendall((up ++ flat).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    // monotone n=10: S = 45, var_num18 = 10·9·25 = 2250,
    // z = 44/sqrt(125) ≈ 3.936 > 1.96
    assert(out("buy").getAs[Long]("s_stat") === 45L)
    assert(out("buy").getAs[String]("trend") === "increasing")
    // all-tied: every pairwise sgn = 0 and the tie term cancels the
    // variance numerator entirely (4·3·13 − 4·3·13 = 0) → NULL z
    assert(out("flat").getAs[Long]("s_stat") === 0L)
    assert(out("flat").getAs[Long]("var_num18") === 0L)
    assert(out("flat").isNullAt(out("flat").fieldIndex("z")))
    assert(out("flat").getAs[String]("trend") === "n/a")
  }

  test("Kendall tau-b matches the hand-computed concordance with ties") {
    import graft.gold.Seasonal
    // day totals y = (10, 20, 15, 20, 30), day volumes v = (1, 2, 2, 3, 4):
    // C = 8, D = 0; ties_y = 1 (y=2000 twice), ties_v = 1 (v=2 twice),
    // n0 = 10 → τ_b = 8/sqrt(9·9) = 8/9.
    val perDay = Seq(
      (1, Seq(10.0)), (2, Seq(12.0, 8.0)), (3, Seq(7.0, 8.0)),
      (4, Seq(5.0, 5.0, 10.0)), (5, Seq(5.0, 5.0, 10.0, 10.0)))
    val rows = perDay.flatMap { case (d, vs) =>
      vs.map(v => ("click", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), v))
    }.toDF("event_type", "ts", "value")
    val r = Seasonal.kendallTau(rows).collect().head
    assert(r.getAs[Long]("concordant") === 8L)
    assert(r.getAs[Long]("discordant") === 0L)
    assert(r.getAs[Long]("ties_y") === 1L)
    assert(r.getAs[Long]("ties_v") === 1L)
    assert(r.getAs[Double]("tau_b") === 8.0 / 9.0)
  }

  test("grouped Mann-Whitney matches the ungrouped test per segment") {
    import graft.gold.Drift
    // group g1 = the no-ties hand case (U = 0); g2 = a shifted copy
    val rows = Seq(
      ("g1", 1.0, true), ("g1", 2.0, true), ("g1", 3.0, false), ("g1", 4.0, false),
      ("g2", 10.0, false), ("g2", 20.0, false), ("g2", 30.0, true), ("g2", 40.0, true)
    ).toDF("grp", "v", "in_a")
    val grouped = Drift.mannWhitneyByGroup(rows, col("grp"), col("v"), col("in_a"))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    for (g <- Seq("g1", "g2")) {
      val single = Drift.mannWhitney(rows.filter(col("grp") === g),
        col("v"), col("in_a")).collect().head
      assert(grouped(g).getAs[Double]("u") == single.getAs[Double]("u"))
      assert(grouped(g).getAs[Double]("z") == single.getAs[Double]("z"))
      assert(grouped(g).getAs[Long]("m") == single.getAs[Long]("m"))
    }
    assert(grouped("g1").getAs[Double]("u") == 0.0)
    assert(grouped("g2").getAs[Double]("u") == 4.0) // A fully above B
  }

  test("BH step-up matches hand math: adjustment, monotonization, discoveries") {
    import graft.gold.Drift
    def f32exp(x: Double): Double = math.exp(x).toFloat.toDouble
    def pTwo(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      math.min(1.0, 2.0 * (0.3989422804014327 * f32exp(-(az * az) / 2.0)) *
        (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
          t * (-1.821255978 + t * 1.330274429))))))
    }
    val tests = Seq(("s1", Some(3.0)), ("s2", Some(2.0)), ("s3", Some(0.5)),
      ("s4", Option.empty[Double])).toDF("grp", "z")
    val out = Drift.bhAdjust(tests, "grp", "z").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    // A&S 26.2.17 accuracy sanity: p(2.0) ~ 0.0455, p(0.5) ~ 0.6171
    assert(math.abs(out("s2").getAs[Double]("p_two") - 0.04550026) < 1e-6)
    assert(math.abs(out("s3").getAs[Double]("p_two") - 0.61708) < 1e-4)
    // exact engine-replication of the polynomial
    for ((g, z) <- Seq(("s1", 3.0), ("s2", 2.0), ("s3", 0.5)))
      assert(out(g).getAs[Double]("p_two") == pTwo(z), s"p mismatch at $g")
    // hand BH at m=3: ranks (s1,s2,s3) = (1,2,3);
    // p_adj(s3) = p3, p_adj(s2) = min(3p2/2, p3), p_adj(s1) = min(3p1, ...)
    val (p1, p2, p3) = (pTwo(3.0), pTwo(2.0), pTwo(0.5))
    val a3 = math.min(1.0, p3)
    val a2 = math.min(math.min(1.0, p2 * 3.0 / 2.0), a3)
    val a1 = math.min(math.min(1.0, p1 * 3.0), a2)
    assert(out("s3").getAs[Double]("p_adj") == a3)
    assert(out("s2").getAs[Double]("p_adj") == a2)
    assert(out("s1").getAs[Double]("p_adj") == a1)
    assert(out("s1").getAs[Boolean]("discovery") && !out("s2").getAs[Boolean]("discovery"))
    // NULL z: no p, no rank, never a discovery; excluded from m_tests
    assert(out("s4").isNullAt(out("s4").fieldIndex("p_two")))
    assert(!out("s4").getAs[Boolean]("discovery"))
    assert(out("s1").getAs[Long]("m_tests") == 3L)
    // step-up monotonization: adjusted p is non-decreasing in rank
    assert(a1 <= a2 && a2 <= a3)
  }

  test("difference-in-differences matches hand math on a planted 2x2 panel") {
    import graft.gold.Experiment
    // arm A (even custkeys): cust 2 d=+50, cust 4 d=-20 -> mean 15, var 1225
    // arm B (odd):           cust 1 d=+10, cust 3 d=+30 -> mean 20, var 100
    val rows = Seq(
      (2L, 100.0, "1996-06-01"), (2L, 150.0, "1997-06-01"),
      (4L, 200.0, "1996-06-01"), (4L, 180.0, "1997-06-01"),
      (1L, 40.0, "1996-06-01"), (1L, 50.0, "1997-06-01"),
      (3L, 70.0, "1996-06-01"), (3L, 100.0, "1997-06-01")
    ).map { case (k, v, dt) => (k, v, java.sql.Date.valueOf(dt)) }
      .toDF("o_custkey", "o_totalprice", "order_date")
    val out = Experiment.diffInDiff(rows).orderBy("arm").collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(out("A").getAs[Long]("n") == 2L && out("B").getAs[Long]("n") == 2L)
    assert(out("A").getAs[Double]("mean_diff") == 15.0)
    assert(out("B").getAs[Double]("mean_diff") == 20.0)
    assert(out("A").getAs[Double]("var_diff") == 1225.0)
    assert(out("B").getAs[Double]("var_diff") == 100.0)
    out.values.foreach { r =>
      assert(r.getAs[Double]("did_estimate") == -5.0)
      assert(r.getAs[Double]("se_did") == math.sqrt(1225.0 / 2.0 + 100.0 / 2.0))
      assert(r.getAs[Double]("t_stat") ==
        -5.0 / math.sqrt(1225.0 / 2.0 + 100.0 / 2.0))
    }
    // differencing nets out a common additive time shock: shifting EVERY
    // post outcome by +1000 leaves the estimate unchanged
    val shifted = rows.withColumn("o_totalprice",
      when(col("order_date") >= to_date(lit("1997-01-01")),
        col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
    val did2 = Experiment.diffInDiff(shifted).collect()(0)
      .getAs[Double]("did_estimate")
    assert(did2 == -5.0, s"time shock leaked into the estimate: $did2")
  }

  test("Mann-Whitney matches hand math with and without ties; all-tied goes NULL") {
    import graft.gold.Drift
    // no ties: A = {1,2}, B = {3,4} -> U = 0, tie term 0
    val a = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "in_a")
    val r1 = Drift.mannWhitney(a, col("v"), col("in_a")).collect().head
    assert(r1.getAs[Long]("m") == 2L && r1.getAs[Long]("n") == 2L)
    assert(r1.getAs[Long]("u2") == 0L && r1.getAs[Double]("u") == 0.0)
    assert(r1.getAs[Double]("mu") == 2.0)
    val sig1 = math.sqrt(2.0 * 2.0 / 12.0 * ((4.0 + 1.0) - 0.0 / (4.0 * 3.0)))
    assert(r1.getAs[Double]("sigma") == sig1)
    assert(r1.getAs[Double]("z") == (0.0 - 2.0) / sig1)
    assert(r1.getAs[Double]("rank_biserial") == -1.0) // B stochastically larger
    // heavy tie: A = {1,1}, B = {1,2} -> U = 1 (two half-wins), sigma = 1
    val t = Seq((1.0, true), (1.0, true), (1.0, false), (2.0, false))
      .toDF("v", "in_a")
    val r2 = Drift.mannWhitney(t, col("v"), col("in_a")).collect().head
    assert(r2.getAs[Long]("u2") == 2L && r2.getAs[Double]("u") == 1.0)
    val sig2 = math.sqrt(2.0 * 2.0 / 12.0 * ((4.0 + 1.0) - 24.0 / (4.0 * 3.0)))
    assert(r2.getAs[Double]("sigma") == sig2) // ~1 up to the IEEE chain
    assert(math.abs(sig2 - 1.0) < 1e-12)
    assert(r2.getAs[Double]("z") == (1.0 - 2.0) / sig2)
    // degenerate: every value tied -> zero variance, NULL z
    val const = Seq((5.0, true), (5.0, false)).toDF("v", "in_a")
    val r3 = Drift.mannWhitney(const, col("v"), col("in_a")).collect().head
    assert(r3.getAs[Double]("sigma") == 0.0)
    assert(r3.isNullAt(r3.fieldIndex("z")))
  }

  test("Holt forecast is exact on a planted linear series") {
    import graft.gold.Seasonal
    // y_t = 10 + 5t: after init (L = y2, B = 5) every one-step forecast is
    // exact, so L tracks y, B stays 5, SSE stays 0 — all bit-exact
    val rows = (0 until 50).map { t =>
      (10.0 + 5.0 * t, java.sql.Date.valueOf(java.time.LocalDate.of(1996, 1, 1).plusDays(t)))
    }.toDF("o_totalprice", "order_date")
    val out = Seasonal.holtForecast(rows).orderBy("h").collect()
    assert(out.length == 7)
    val last = 10.0 + 5.0 * 49
    out.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(r.getAs[Long]("n_days") == 50L)
      assert(r.getAs[Double]("level") == last)
      assert(r.getAs[Double]("trend") == 5.0)
      assert(r.getAs[Double]("sse") == 0.0)
      assert(r.getAs[Double]("forecast") == last + 5.0 * h)
    }
  }

  test("Holt-Winters matches an in-Scala reference fold bit-for-bit") {
    import graft.gold.Seasonal
    // y_t = 100 + 5t + s[(t-1)%7], 21 days: reference fold re-runs the
    // SAME generated arithmetic (init at t=14, idx = t%7, a=.3 b=.1 g=.2)
    val sPat = Array(30.0, -10.0, 0.0, 20.0, -25.0, -5.0, -10.0)
    val ys = (1 to 21).map(t => 100.0 + 5.0 * t + sPat((t - 1) % 7)).toArray
    val rows = ys.zipWithIndex.map { case (y, i) =>
      (y, java.sql.Date.valueOf(java.time.LocalDate.of(1996, 3, 1).plusDays(i)))
    }.toSeq.toDF("o_totalprice", "order_date")
    // reference: two-week init, fold days 15..21
    def mean(from: Int) = (from until from + 7).map(i => ys(i - 1)).sum / 7.0
    var l = mean(1); var b = (mean(8) - mean(1)) / 7.0
    val s = Array.tabulate(7)(i => ys(i) - mean(1))
    var t = 14; var sse = 0.0
    while (t < ys.length) {
      val y = ys(t); val idx = t % 7
      val e = y - (l + b + s(idx))
      val lNew = 0.3 * (y - s(idx)) + (1.0 - 0.3) * (l + b)
      val bNew = 0.1 * (lNew - l) + (1.0 - 0.1) * b
      s(idx) = 0.2 * (y - lNew) + (1.0 - 0.2) * s(idx)
      sse = sse + e * e
      l = lNew; b = bNew; t += 1
    }
    val out = Seasonal.holtWintersForecast(rows).orderBy("h").collect()
    assert(out.length == 14)
    out.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(r.getAs[Long]("n_days") == 21L)
      assert(r.getAs[Double]("level") == l, s"level @h=$h")
      assert(r.getAs[Double]("trend") == b, s"trend @h=$h")
      assert(r.getAs[Double]("sse") == sse, s"sse @h=$h")
      val sea = s((21 + h - 1) % 7)
      assert(r.getAs[Double]("seasonal") == sea, s"seasonal @h=$h")
      assert(r.getAs[Double]("forecast") == l + h.toDouble * b + sea, s"forecast @h=$h")
    }
  }

  test("price elasticity recovers a planted power law") {
    import graft.gold.Elasticity
    // qty = price^-2 exactly: elasticity slope must be -2 (up to the
    // micro-nat log quantization)
    val lines = (0 until 8).map { k =>
      val price = math.pow(2.0, k)
      val qty = math.pow(price, -2.0) * 1000.0 // scale keeps qty > 0
      (k.toLong, price * qty, 0.0, qty)
    }.toDF("l_partkey", "l_extendedprice", "l_discount", "l_quantity")
    val parts = (0 until 8).map(k => (k.toLong, "WIDGET")).toDF("p_partkey", "p_type")
    val r = Elasticity.priceElasticity(lines, parts).collect().head
    assert(r.getAs[Long]("n_lines") == 8L)
    assert(math.abs(r.getAs[Double]("elasticity") - (-2.0)) < 1e-4,
      s"elasticity ${r.getAs[Double]("elasticity")}")
  }

  test("brier decomposition: calibrated scorer has zero reliability; " +
    "constant scorer has zero resolution") {
    import graft.ml.Evaluation
    val spark2 = spark
    import spark2.implicits._
    // perfectly calibrated: bin 0.25 has 1/4 positives, bin 0.75 has 3/4
    val calibrated = (Seq.fill(3)((0.25, 0L)) ++ Seq((0.25, 1L)) ++
      Seq.fill(3)((0.75, 1L)) ++ Seq((0.75, 0L))).toDF("score", "label")
    val r = Evaluation.brierDecomposition(calibrated, "score", "label")
      .collect().head
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("base_rate") == 0.5)
    // RES = (4*(0.25-0.5)^2 + 4*(0.75-0.5)^2)/8 = 0.0625 exactly (dyadic)
    assert(r.getAs[Double]("resolution") == 0.0625)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    assert(r.getAs[Double]("brier_binned") == 0.1875)
    // constant scorer: one bin at the base rate -> zero resolution
    val flat = (Seq.fill(4)((0.5, 1L)) ++ Seq.fill(4)((0.5, 0L)))
      .toDF("score", "label")
    val f = Evaluation.brierDecomposition(flat, "score", "label")
      .collect().head
    assert(f.getAs[Double]("resolution") == 0.0)
    assert(f.getAs[Double]("reliability") == 0.0) // 0.5 predicted, 0.5 observed
    assert(f.getAs[Double]("brier_binned") == 0.25)
  }

  test("gains table: perfect ranking captures everything in the top tiles; " +
    "identities hold") {
    import graft.ml.Evaluation
    val spark2 = spark
    import spark2.implicits._
    // 100 rows, scores = 100-i, positives = the 20 highest scores:
    // a perfect ranker. Deciles of 10 rows each.
    val df = (1 to 100).map(i =>
      (i.toLong, (101 - i).toDouble, if (i <= 20) 1L else 0L))
      .toDF("id", "score", "label")
    val out = Evaluation.gainsTable(df, "score", "label", "id")
      .orderBy("decile").collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("n")).forall(_ == 10L))
    // all 20 positives in deciles 1-2: capture 0.5 then 1.0, flat after
    assert(out(0).getAs[Double]("capture_rate") == 0.5)
    assert(out(1).getAs[Double]("capture_rate") == 1.0)
    assert(out(9).getAs[Double]("capture_rate") == 1.0)
    // decile-1 lift = (10/10)/(20/100) = 5x; cumulative lift decays to 1
    assert(out(0).getAs[Double]("lift") == 5.0)
    assert(out(9).getAs[Double]("cum_lift") == 1.0)
    // identities: cum columns are prefix sums, totals consistent
    val ns = out.map(_.getAs[Long]("n"))
    val cums = out.map(_.getAs[Long]("cum_n"))
    assert(cums.toSeq == ns.scanLeft(0L)(_ + _).tail.toSeq)
    assert(out.last.getAs[Long]("cum_pos") == 20L)
  }
}
