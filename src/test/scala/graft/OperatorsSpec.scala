package graft

import graft.operators.{AsOfJoin, Cleaning, MergeUpsert, Sessionize}
import graft.multimodal.Multimodal
import graft.text.{Dedup, MinHash}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("deterministicDedup keeps exactly one row per key, lowest tiebreak") {
    import spark.implicits._
    val df = Seq((1L, "b"), (1L, "a"), (2L, "z")).toDF("k", "v")
    val out = Cleaning.deterministicDedup(df, Seq("k"), Seq("v")).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "z")))
  }

  test("asOf picks the most recent right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq((10L, 1L, 100L, 5.0), (11L, 1L, 200L, 6.0), (12L, 2L, 50L, 7.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val right = Seq((20L, 1L, 100L, 1.5), (21L, 1L, 150L, 2.5), (22L, 3L, 10L, 9.9))
      .toDF("event_id", "user_id", "ts_us", "value")
    val out = AsOfJoin.asOf(left, right)
      .select("event_id", "asof_value", "asof_ts_us").orderBy("event_id")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq(
      (10L, Some(1.5), Some(100L)),   // equal ts matches
      (11L, Some(2.5), Some(150L)),   // most recent prior
      (12L, None, None)))             // no right rows for user 2
  }

  test("merge upsert: source wins, target survives, inserts appear") {
    import spark.implicits._
    val target = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val source = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    val out = MergeUpsert.merge(target, source, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "old", "kept"), (2L, "new", "updated"), (3L, "new", "inserted")))
  }

  test("merge upsert is idempotent: re-merging the same source is a fixpoint") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((2L, "x")).toDF("k", "v")
    val once = MergeUpsert.merge(target, source, Seq("k")).drop("_merge_action")
    val twice = MergeUpsert.merge(once, source, Seq("k")).drop("_merge_action")
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("exact dedup groups identical texts under the lowest doc_id") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDups(docs).orderBy("canonical_doc_id")
      .select("canonical_doc_id", "doc_count").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
    assert(Dedup.dedupedDocs(docs).count() == 2)
  }

  test("minhash LSH finds a near-duplicate pair") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, (100 to 140).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = MinHash.nearDupPairs(docs)
      .select("doc_a", "doc_b", "exact_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.8 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("minhash LSH bucket cap drops hot buckets but keeps normal pairs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"w$i").mkString(" ")
    // 20 identical boilerplate docs → one hot bucket per band
    val boiler = (10L to 29L).map(i => (i, (1 to 40).map(j => s"b$j").mkString(" ")))
    val docs = (Seq((1L, base), (2L, nearDup)) ++ boiler).toDF("doc_id", "text")
    val capped = MinHash.nearDupPairs(docs, maxBucket = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(capped.contains((1L, 2L)))                      // normal pair kept
    assert(!capped.exists { case (a, _) => a >= 10L })     // hot bucket dropped
    val uncapped = MinHash.nearDupPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(uncapped.count { case (a, b) => a >= 10L && b >= 10L } == 20 * 19 / 2)
  }

  test("candidatePairs applies the same hot-bucket governor as nearDupPairs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"w$i").mkString(" ")
    // 20 identical boilerplate docs → one hot bucket per band; at
    // maxBucket=5 the governor must BIND and drop all 190 boiler pairs.
    val boiler = (10L to 29L).map(i => (i, (1 to 40).map(j => s"b$j").mkString(" ")))
    val docs = (Seq((1L, base), (2L, nearDup)) ++ boiler).toDF("doc_id", "text")
    val capped = MinHash.candidatePairs(docs, maxBucket = 5)
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))                    // normal pair kept
    assert(!capped.exists { case (a, _) => a >= 10L })   // hot bucket dropped
    // Parity with the oracle-verified twin: the governed candidate set IS
    // nearDupPairs' pair set at the same cap (nearDupPairs only adds the
    // verification columns) — so candidatePairs inherits its oracle.
    val twin = MinHash.nearDupPairs(docs, maxBucket = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == twin)
    // Ungoverned default cap keeps the boiler family (bucket of 20 < 1000).
    val open = MinHash.candidatePairs(docs).as[(Long, Long)].collect().toSet
    assert(open.count { case (a, b) => a >= 10L && b >= 10L } == 20 * 19 / 2)
    // The governed-oracle CTE builder emits the SAME cap constant the
    // Spark path defaults to — the compare can't silently diverge.
    assert(MinHash.candidatePairsSqlCtes
      .contains(s"count(*) > ${MinHash.DefaultMaxBucket}"))
    assert(MinHash.candidatePairsSqlCtesAt(5).contains("count(*) > 5"))
  }

  test("connected components converge across a long chain") {
    import spark.implicits._
    // path graph 1-2-...-10 (diameter 9 forces multiple propagation rounds)
    // plus isolated node 11 and a separate pair 20-21
    val nodes = ((1L to 11L) ++ Seq(20L, 21L)).toDF("id")
    val edges = ((1L until 10L).map(i => (i, i + 1)) ++ Seq((20L, 21L)))
      .toDF("src", "dst")
    val cc = graft.text.Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert((1L to 10L).forall(cc(_) == 1L))
    assert(cc(11L) == 11L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("star-contraction components match label propagation and converge in O(log n) rounds") {
    import spark.implicits._
    // Path graph of 64 nodes: diameter 63. Label propagation needs ~63
    // rounds; star contraction must finish in O(log n) — the 100 TB
    // argument for chain-shaped duplicate families is this bound.
    val nodes = (1L to 64L).toDF("id")
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) =
      graft.text.Components.connectedComponentsStarWithRounds(nodes, edges)
    val cc = labels.as[(Long, Long)].collect().toMap
    assert((1L to 64L).forall(cc(_) == 1L))
    assert(rounds <= 10, s"star contraction took $rounds rounds on a 64-path")

    // Parity with label propagation on the real LSH candidate graph.
    val docs = Tables.documents(spark, TinySf)
    val prop = graft.text.Components.dedupClusters(docs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val star = graft.text.Components.dedupClustersStar(docs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(star == prop)

    // Isolated nodes + empty edge set: every node is its own component.
    val iso = graft.text.Components.connectedComponentsStar(
        Seq(7L, 9L).toDF("id"), Seq.empty[(Long, Long)].toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(iso == Map(7L -> 7L, 9L -> 9L))
  }

  test("hashSplit is disjoint-exhaustive, near the target ratios, and append-stable") {
    import spark.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "lang")
    val split = operators.Sampling.hashSplit(docs, col("doc_id"), 8000, 1000)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum
    assert(n == docs.count())                      // exhaustive, no row dropped
    assert(counts.keySet == Set("train", "validation", "test"))
    // 80/10/10 within 5 points on 500 docs (md5 is uniform; 3σ ≈ 5.4%).
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.05)
    // Append stability: assignment is a pure function of doc_id — the same
    // rows through a corpus twice the size keep their split.
    val bigger = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val again = operators.Sampling.hashSplit(bigger, col("doc_id"), 8000, 1000)
      .filter(col("doc_id") < 1000000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("sessionize splits on gap and aggregates within session") {
    import spark.implicits._
    val us = 1000000L
    val events = Seq(
      (1L, 1L, 0L * us, "view", 1.0), (2L, 1L, 60L * us, "purchase", 5.0),
      (3L, 1L, 4000L * us, "view", 2.0) // > 30min later → new session
    ).toDF("event_id", "user_id", "ts_ns_ignored", "event_type", "value")
      .withColumn("ts_ns", col("ts_ns_ignored") * 1000)
    val out = Sessionize.sessionStats(events, Sessionize.DefaultGapUs)
      .orderBy("session_idx")
      .select("session_idx", "event_count", "purchases")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }

  test("multimodal mapPartitions pipeline produces per-record features") {
    val docs = Tables.documents(spark, TinySf).limit(10)
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs)).collect()
    assert(feats.length == 10)
    assert(feats.forall(f => f.byte_count > 0 && f.checksum.length == 64))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 && f.frame_count >= 1))
  }

  test("multimodal frame sampler matches the SQL frame plan") {
    // deterministic slice (limit after fanOut repartition is arbitrary)
    val docs = Tables.documents(spark, TinySf).filter(col("doc_id") < 25)
    val ds = Multimodal.sampleFrames(Multimodal.asMediaTable(docs))
      .collect().map(f => (f.doc_id, f.frame_idx.toLong, f.out_w.toLong, f.out_h.toLong))
      .toSet
    val sql = Multimodal.frameSamplePlan(docs)
      .select("doc_id", "frame_idx", "out_w", "out_h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(ds == sql)
    assert(ds.nonEmpty)
    // per-frame checksums are distinct across frames of the same doc
    val sums = Multimodal.sampleFrames(Multimodal.asMediaTable(docs)).collect()
    assert(sums.map(f => (f.doc_id, f.frame_checksum)).distinct.length == sums.length)
  }

  test("interval overlap joins as a bin equi-join, never a nested-loop cross product") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    // hand-checkable intervals (µs): u1 s1 overlaps u2 s1 and u3 s1;
    // u1 s2 overlaps nothing; u2 s1 overlaps u3 s1 as well
    val sessions = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 5000L, 5100L),
      (2L, 1L, 50L, 200L), (3L, 1L, 90L, 95L))
      .toDF("user_id", "session_idx", "session_start_us", "session_end_us")
    val got = IntervalJoin.coActiveSessions(sessions, binUs = 64L)
      .orderBy("user_a", "user_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))

    // plan shape: equi-join on the bin key (sort-merge or hash), and NO
    // BroadcastNestedLoopJoin anywhere — the cross-product shape the
    // naive overlap predicate would plan as
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = IntervalJoin.coActiveSessions(sessions, binUs = 64L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"), plan.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("audio segmentation: typed stub-decoder path matches the SQL window plan") {
    val docs = Tables.documents(spark, TinySf).filter(col("doc_id") < 25)
    // 500ms window / 200ms hop: stub durations are >=1001ms, so every doc
    // explodes into 3+ overlapping windows
    val typed = Multimodal.segmentAudio(Multimodal.asMediaTable(docs), 500L, 200L)
      .collect().map(s => (s.doc_id, s.seg_idx, s.start_ms, s.end_ms)).toSet
    val sql = Multimodal.audioSegmentPlan(docs, 500L, 200L)
      .select("doc_id", "seg_idx", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(typed == sql && typed.nonEmpty)
    // windows cover the duration with hop overlap; last window clips
    val segs = Multimodal.segmentAudio(Multimodal.asMediaTable(docs), 500L, 200L).collect()
    segs.groupBy(_.doc_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.seg_idx)
      assert(sorted.length >= 3)
      assert(sorted.head.start_ms == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.start_ms - a.start_ms == 200L && a.end_ms > b.start_ms)
        case _ =>
      }
      assert(sorted.last.end_ms <= sorted.last.start_ms + 500L)
    }
    // per-segment checksums distinct within a doc
    assert(segs.map(s => (s.doc_id, s.seg_checksum)).distinct.length == segs.length)
  }

  test("bronze quarantine classifies null, invalid-JSON, and bad-key payloads") {
    import spark.implicits._
    import graft.operators.Bronze
    val raw = Seq(
      (1L, """{"k": 7}"""), (2L, null), (3L, "not json at all"),
      (4L, """{"j": 1}"""), (5L, """{"k": "oops"}"""), (6L, """{"k": 9}"""))
      .toDF("event_id", "props")
    val got = Bronze.withQuarantineReason(raw)
      .select("event_id", "quarantine_reason").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "ok"), (2L, "null_props"), (3L, "invalid_json"),
      (4L, "bad_k"), (5L, "bad_k"), (6L, "ok")))
    assert(Bronze.quarantined(raw).count() == 4L)
  }

  test("OHLC bars: open/close/high/low semantics and one shared exchange") {
    import spark.implicits._
    import graft.operators.Resample
    // ns timestamps: bucket size 10µs → user 1 has buckets 1 (3 events)
    // and 2 (1 event); open/close tie-break on event_id at equal ts
    val ev = Seq(
      (1L, 1L, "purchase", 5.0, 12000L), (2L, 1L, "purchase", 9.0, 15000L),
      (3L, 1L, "purchase", 7.0, 15000L), (4L, 1L, "purchase", 2.0, 25000L),
      (5L, 2L, "purchase", 4.0, 11000L), (6L, 1L, "error", 99.0, 13000L))
      .toDF("event_id", "user_id", "event_type", "value", "ts_ns")
    val bars = Resample.ohlcBars(ev, 10L)
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    // bucket 1 of user 1: rows (ts 12, 5.0), (ts 15, id2, 9.0),
    // (ts 15, id3, 7.0) → open 5.0; close tie-breaks on event_id → 7.0
    assert(bars.toSeq == Seq(
      (1L, 1L, 5.0, 7.0, 9.0, 5.0, 3L),
      (1L, 2L, 2.0, 2.0, 2.0, 2.0, 1L),
      (2L, 1L, 4.0, 4.0, 4.0, 4.0, 1L)))
    // the error event never enters the bars; the window sort and the
    // bucket aggregation share one (user, bucket) exchange
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Resample.ohlcBars(ev, 10L).queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("gapFill densifies the bucket spine and forward-fills close") {
    import spark.implicits._
    import graft.operators.Resample
    val bars = Seq((1L, 1L, 10.0, 2L), (1L, 4L, 20.0, 1L), (2L, 7L, 5.0, 1L))
      .toDF("user_id", "bucket", "close", "n_events")
    val got = Resample.gapFill(bars).orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, false, Some(10.0), 2L),
      (1L, 2L, true, Some(10.0), 0L),
      (1L, 3L, true, Some(10.0), 0L),
      (1L, 4L, false, Some(20.0), 1L),
      (2L, 7L, false, Some(5.0), 1L)))
  }

  test("spearman: monotone pairs hit +/-1, ties match scipy-style hand math, constants NULL") {
    import graft.operators.Profiling
    val spark2 = spark
    import spark2.implicits._
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 35.0)).toDF("x", "y")
    val up = Profiling.spearman(mono, "x", "y").collect().head
    assert(up.getAs[Long]("n") == 4L && math.abs(up.getAs[Double]("rho") - 1.0) < 1e-12)
    val anti = Profiling.spearman(mono.withColumn("y", -col("y")), "x", "y")
      .collect().head
    assert(math.abs(anti.getAs[Double]("rho") + 1.0) < 1e-12)
    // tied case, hand-computed: x = [1,2,2,3], y = [10,30,30,20]
    // midranks: Rx = [1, 2.5, 2.5, 4], Ry = [1, 3.5, 3.5, 2]
    // Pearson over ranks = 6/18 = 1/3
    val tied = Seq((1.0, 10.0), (2.0, 30.0), (2.0, 30.0), (3.0, 20.0)).toDF("x", "y")
    val t = Profiling.spearman(tied, "x", "y").collect().head
    assert(math.abs(t.getAs[Double]("rho") - 1.0 / 3.0) < 1e-12,
      s"tied rho ${t.getAs[Double]("rho")}")
    // constant variable: no rank variance -> NULL
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    val c = Profiling.spearman(const, "x", "y").collect().head
    assert(c.isNullAt(c.fieldIndex("rho")))
  }
}
