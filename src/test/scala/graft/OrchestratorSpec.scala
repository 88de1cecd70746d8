package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.{Medallion, Orchestrator}
import graft.pipeline.Orchestrator.Stage
import org.apache.spark.sql.functions._

class OrchestratorSpec extends SparkSpec {

  private def statusOf(rs: Seq[Orchestrator.StageResult]): Map[String, String] =
    rs.map(r => r.stage -> r.status).toMap

  test("stages run in dependency order; a diamond runs each stage once") {
    val order = new ConcurrentLinkedQueue[String]()
    def st(name: String, deps: String*) =
      Stage(name, deps, () => { order.add(name); () })
    //   a -> b, a -> c, (b,c) -> d
    val rs = Orchestrator.run(Seq(
      st("d", "b", "c"), st("b", "a"), st("c", "a"), st("a")), parallelism = 4)
    assert(rs.forall(_.status == "success"))
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.size == 4, s"each stage exactly once, got $seq")
    assert(seq.indexOf("a") < seq.indexOf("b"))
    assert(seq.indexOf("a") < seq.indexOf("c"))
    assert(seq.indexOf("b") < seq.indexOf("d"))
    assert(seq.indexOf("c") < seq.indexOf("d"))
  }

  test("a failed stage blocks its downstream cone but not independent branches") {
    val ran = new ConcurrentLinkedQueue[String]()
    def ok(name: String, deps: String*) =
      Stage(name, deps, () => { ran.add(name); () })
    val rs = Orchestrator.run(Seq(
      ok("a"),
      Stage("boom", Seq("a"), () => sys.error("stage exploded")),
      ok("after_boom", "boom"),
      ok("after_after", "after_boom"),
      ok("side", "a"),
      ok("side2", "side")))
    val st = statusOf(rs)
    assert(st("a") == "success")
    assert(st("boom") == "failed")
    assert(st("after_boom") == "blocked")
    assert(st("after_after") == "blocked")
    // the independent branch is unaffected — Airflow semantics, not fail-fast
    assert(st("side") == "success" && st("side2") == "success")
    assert(!ran.contains("after_boom") && !ran.contains("after_after"))
    val boom = rs.find(_.stage == "boom").get
    assert(boom.error.contains("stage exploded"))
    assert(rs.find(_.stage == "after_boom").get.error.contains("boom"))
  }

  test("transient failures retry up to maxRetries; attempts are reported") {
    val calls = new AtomicInteger(0)
    val rs = Orchestrator.run(Seq(
      Stage("flaky", Nil,
        () => if (calls.incrementAndGet() < 3) sys.error(s"transient ${calls.get}"),
        maxRetries = 2)))
    assert(rs.head.status == "success")
    assert(rs.head.attempts == 3 && calls.get == 3)

    // retries exhausted -> failed with the LAST error
    val calls2 = new AtomicInteger(0)
    val rs2 = Orchestrator.run(Seq(
      Stage("hopeless", Nil,
        () => sys.error(s"always ${calls2.incrementAndGet()}"), maxRetries = 1)))
    assert(rs2.head.status == "failed" && rs2.head.attempts == 2)
    assert(rs2.head.error.contains("always 2"))
  }

  test("a FATAL stage error produces a terminal failed result instead of hanging the run") {
    val rs = Orchestrator.run(Seq(
      Stage("fatal", Nil, () => throw new NoClassDefFoundError("graft/Gone")),
      Stage("dep", Seq("fatal"), () => ()),
      Stage("side", Nil, () => ())))
    val st = statusOf(rs)
    // fatal errors skip retries (the inner catch is NonFatal-only) but
    // must still count the latch down — no wedged pipeline
    assert(st("fatal") == "failed" && st("dep") == "blocked" && st("side") == "success")
    assert(rs.find(_.stage == "fatal").get.error.contains("graft/Gone"))
  }

  test("idempotency probe skips a done stage; dependents still run") {
    val ran = new ConcurrentLinkedQueue[String]()
    val rs = Orchestrator.run(Seq(
      Stage("already", Nil, () => { ran.add("already"); () }, done = () => true),
      Stage("next", Seq("already"), () => { ran.add("next"); () })))
    val st = statusOf(rs)
    assert(st("already") == "skipped_done")
    assert(st("next") == "success")
    assert(!ran.contains("already") && ran.contains("next"))
  }

  test("malformed DAGs are wiring errors: cycle, unknown dep, duplicate name") {
    def noop(name: String, deps: String*) = Stage(name, deps, () => ())
    val cyc = intercept[IllegalArgumentException](
      Orchestrator.run(Seq(noop("a", "b"), noop("b", "a"))))
    assert(cyc.getMessage.contains("cycle"))
    val unk = intercept[IllegalArgumentException](
      Orchestrator.run(Seq(noop("a", "ghost"))))
    assert(unk.getMessage.contains("ghost"))
    val dup = intercept[IllegalArgumentException](
      Orchestrator.run(Seq(noop("a"), noop("a"))))
    assert(dup.getMessage.contains("duplicate"))
  }

  test("SLA breaches are flagged in the report without failing the stage") {
    val rs = Orchestrator.run(Seq(
      Stage("slow", Nil, () => Thread.sleep(80), slaMs = 1L),
      Stage("fast", Nil, () => (), slaMs = 60000L),
      Stage("slow_dep", Seq("slow"), () => ())))
    val by = rs.map(r => r.stage -> r).toMap
    // Airflow SLA semantics: alert, don't kill — downstream still runs
    assert(by("slow").status == "success" && by("slow").sla_breached)
    assert(by("fast").status == "success" && !by("fast").sla_breached)
    assert(by("slow_dep").status == "success")
  }

  test("independent stages overlap in time under parallelism > 1") {
    // two stages that each wait for the OTHER to start: completes quickly
    // iff they run concurrently (deadlocks past the deadline if serialized)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def meet(name: String) = Stage(name, Nil, () => {
      gate.await(20, java.util.concurrent.TimeUnit.SECONDS); ()
    })
    val rs = Orchestrator.run(Seq(meet("x"), meet("y")), parallelism = 2)
    assert(rs.forall(_.status == "success"),
      s"independent stages did not run concurrently: $rs")
  }

  test("medallion DAG: orchestrated run materializes the layers; re-run skips bronze") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_dag").toString
    val m = new Medallion(spark, TinySf, wh)
    val rs = m.runAllOrchestrated()
    assert(rs.forall(_.status == "success"), rs.mkString("\n"))
    // the DAG-terminal DQ gate validated the materialized warehouse
    assert(rs.map(_.stage).contains("dq_gate"))

    // same layer contents the linear runAll produces
    val silver = m.readSilver("orders_enriched")
    assert(silver.count() == Tables.orders(spark, TinySf).count())
    assert(m.readGold("revenue_daily").count() > 0)
    assert(m.readGold("fraud_scores").count() > 0)
    assert(m.readGold("user_risk_scores").count() > 0)
    assert(m.readGold("fraud_summary").count() > 0)

    // re-run: bronze stages short-circuit on their _SUCCESS probe, silver
    // MERGE stays idempotent (same row count, new version), gold rebuilds
    val v1 = m.latestVersion("orders_enriched").get
    val rs2 = m.runAllOrchestrated()
    val st2 = statusOf(rs2)
    assert(st2("bronze_events") == "skipped_done")
    assert(st2("bronze_orders") == "skipped_done")
    assert(rs2.forall(r => r.status == "success" || r.status == "skipped_done"))
    assert(m.latestVersion("orders_enriched").get == v1 + 1)
    assert(m.readSilver("orders_enriched").count() == silver.count())

    // the run report is a queryable frame (Airflow task-instance shape)
    val rep = Orchestrator.report(spark, rs2)
    assert(rep.filter(col("status") === "skipped_done").count() == 2)
    assert(rep.columns.toSet ==
      Set("stage", "status", "attempts", "duration_ms", "sla_breached", "error"))
  }

  test("ML retrain DAG: passing gates publish + hot-reload; failing gates keep the previous model") {
    import graft.pipeline.MlTrainingDag
    import graft.pipeline.MlTrainingDag.QualityGates
    import graft.ml.ModelRegistry
    import graft.operators.Cleaning
    import graft.streaming.StreamScoring

    val clean = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
    val feats = graft.ml.FraudScore.fullFeatureVector(
        graft.operators.Enrichment.enrichOrders(clean,
          Tables.customer(spark, TinySf), Tables.nation(spark, TinySf),
          Tables.region(spark, TinySf)),
        clean, Cleaning.cleanLineitem(Tables.lineitem(spark, TinySf)))
      .persist()
    val root = java.nio.file.Files.createTempDirectory("graft_retrain_dag").toString
    val scorer = new StreamScoring.HotModelScorer(root, "fraud_gbt")

    // run 1: gates wide open → train, promote v1, serving picks it up
    val r1 = MlTrainingDag.run(feats, root, scorer,
      gates = QualityGates(0.0, 0.0, 0.0), maxIter = 2)
    val st1 = statusOf(r1.report)
    assert(st1("validate_features") == "success" && st1("train_model") == "success")
    assert(st1("evaluate_model") == "success" && st1("quality_gate") == "success")
    assert(st1("promote_model") == "success", r1.report.mkString("\n"))
    assert(st1("notify_rejection") == "skipped_done") // the un-taken branch
    assert(st1("reload_serving") == "success")
    assert(r1.promoted && r1.publishedVersion.contains(1L))
    assert(r1.servingVersion.contains(1L) && scorer.loadedVersion.contains(1L))
    assert(Set("roc_auc", "precision", "recall").subsetOf(r1.metrics.keySet))
    assert(r1.metrics("roc_auc") >= 0.0 && r1.metrics("roc_auc") <= 1.0)

    // run 2: impossible gates → candidate REJECTED, v1 keeps serving —
    // rejection is an outcome, not a failure (ref notify_rejection)
    val r2 = MlTrainingDag.run(feats, root, scorer,
      gates = QualityGates(1.01, 1.01, 1.01), maxIter = 2)
    val st2 = statusOf(r2.report)
    assert(st2("promote_model") == "skipped_done" && st2("reload_serving") == "skipped_done")
    assert(st2("notify_rejection") == "success")
    assert(!r2.promoted && r2.publishedVersion.isEmpty)
    assert(ModelRegistry.latestVersion(spark, root, "fraud_gbt").contains(1L))
    assert(r2.servingVersion.contains(1L) && scorer.loadedVersion.contains(1L))

    // run 3: gates open again → v2 published and served
    val r3 = MlTrainingDag.run(feats, root, scorer,
      gates = QualityGates(0.0, 0.0, 0.0), maxIter = 2)
    assert(r3.promoted && r3.publishedVersion.contains(2L))
    assert(r3.servingVersion.contains(2L) && scorer.loadedVersion.contains(2L))
    feats.unpersist()
  }

  test("curation DAG: clean corpus releases a version; junk corpus is rejected and the prior release keeps serving") {
    import spark.implicits._
    import graft.pipeline.CurationDag
    val root = java.nio.file.Files.createTempDirectory("graft-dag-rel").toString
    // quality-passing corpus: distinct long stopword-bearing docs + an
    // eval doc (src0) nothing leaks from
    val good = (1L to 12L).map { i =>
      (i, (s"the data and that value have with be to of row$i " +
        (0 until 50).map(j => s"tok${i}x$j").mkString(" ")), "src1", "en")
    }
    val evalDoc = (0L, (0 until 60).map(i => s"eval$i").mkString(" "), "src0", "en")
    val docs = (good :+ evalDoc).toDF("doc_id", "text", "source", "lang")

    val r1 = CurationDag.run(spark, docs, s"$root/run1", s"$root/registry",
      CurationDag.ReleaseGates(minKeptFrac = 0.5, minDocs = 5L))
    assert(r1.released, s"clean corpus rejected: $r1")
    assert(r1.publishedVersion.contains(1L) && r1.servingVersion.contains(1L))
    assert(r1.crossSplitPairs == 0L, "cluster-keyed split must not leak")
    val st1 = r1.report.map(r => r.stage -> r.status).toMap
    assert(st1("publish_release") == "success")
    assert(st1("reject_release") == "skipped_done")
    // the published artifact is readable and carries split labels
    val rel = spark.read.parquet(
      graft.ml.ModelRegistry.versionPath(spark, s"$root/registry",
        CurationDag.ArtifactName) + "/documents")
    assert(rel.count() == r1.keptDocs)
    assert(rel.columns.contains("split"))

    // junk corpus: every doc fails the quality gate → kept_frac 0
    val junk = ((1L to 8L).map(i => (i, "the and of", "src1", "en")) :+ evalDoc)
      .toDF("doc_id", "text", "source", "lang")
    val r2 = CurationDag.run(spark, junk, s"$root/run2", s"$root/registry",
      CurationDag.ReleaseGates(minKeptFrac = 0.5, minDocs = 5L))
    assert(!r2.released && r2.publishedVersion.isEmpty)
    assert(r2.servingVersion.contains(1L), "prior release must keep serving")
    val st2 = r2.report.map(r => r.stage -> r.status).toMap
    assert(st2("publish_release") == "skipped_done")
    assert(st2("reject_release") == "success")
    assert(st2("gate") == "success", "rejection is an outcome, not a failure")

    // a second clean release (doc 2 rewritten, doc 3 dropped, doc 13 new)
    // then the release diff classifies exactly those doc_ids
    val goodText = good.map(g => g._1 -> g._2).toMap
    val v2docs = (good.filterNot(g => g._1 == 2L || g._1 == 3L) ++ Seq(
      (2L, goodText(2L) + " rewritten tail words appended here", "src1", "en"),
      (13L, (s"the data and that value have with be to of row13 " +
        (0 until 50).map(j => s"tok13x$j").mkString(" ")), "src1", "en"),
      evalDoc)).toDF("doc_id", "text", "source", "lang")
    val r3 = CurationDag.run(spark, v2docs, s"$root/run3", s"$root/registry",
      CurationDag.ReleaseGates(minKeptFrac = 0.5, minDocs = 5L))
    assert(r3.released && r3.publishedVersion.contains(2L))
    val diff = CurationDag.releaseDiff(spark, s"$root/registry").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("_change_type")).toMap
    assert(diff.get(3L).contains("delete"), s"diff=$diff")
    assert(diff.get(13L).contains("insert"), s"diff=$diff")
    assert(diff.get(2L).contains("update"), s"diff=$diff")
    // unchanged docs produce no diff rows
    assert(!diff.contains(1L) && !diff.contains(4L), s"diff=$diff")

    // crashed half-publish: an uncommitted v=3 dir (no _COMMITTED marker)
    // makes the version sequence non-contiguous; the next release lands at
    // v=4 and the DEFAULT diff must skip the hole (v2 → v4), not read the
    // missing v=3 path
    val hole = new java.io.File(
      s"$root/registry/models/${CurationDag.ArtifactName}/v=3")
    assert(hole.mkdirs(), "could not simulate the crashed publish")
    val v3docs = (good.filterNot(g => g._1 == 4L) :+ evalDoc)
      .toDF("doc_id", "text", "source", "lang")
    val r4 = CurationDag.run(spark, v3docs, s"$root/run4", s"$root/registry",
      CurationDag.ReleaseGates(minKeptFrac = 0.5, minDocs = 5L))
    assert(r4.released && r4.publishedVersion.contains(4L), s"$r4")
    val diff2 = CurationDag.releaseDiff(spark, s"$root/registry").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("_change_type")).toMap
    // classified against v2 (the greatest committed version below 4):
    // doc 4 was in v2 but not v3's corpus; doc 3 returns after v2 dropped it
    assert(diff2.get(4L).contains("delete"), s"diff2=$diff2")
    assert(diff2.get(3L).contains("insert"), s"diff2=$diff2")
  }
}
