package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.ModelRegistry
import graft.operators.Sampling
import graft.text.{Components, Curation, MinHash}

/** Dataset-release DAG — the curation twin of [[MlTrainingDag]]: a
  * training CORPUS is an artifact with the same lifecycle as a model
  * (candidate → quality gates → versioned publish | reject), because a
  * bad data release poisons every model trained on it.
  *
  * Stage graph (each body = Spark jobs; the gate reads 1-row stats):
  *
  *   validate_input → curate (quality ∧ dedup-canonical ∧ decontaminated,
  *   [[Curation.curatePipeline]]) → split (cluster-keyed train/val/test —
  *   near-dup clusters never straddle a split) → leakage_audit (governed
  *   LSH pairs joined against the release split; crossing pairs = leakage)
  *   → gate → publish_release | reject_release.
  *
  * Gates: kept fraction ≥ minKeptFrac (a curation run that drops almost
  * everything signals an upstream ingestion bug, not a clean corpus),
  * kept count ≥ minDocs, and cross-split near-dup pairs ≤
  * maxCrossSplitPairs (0 by default — the cluster-keyed split makes that
  * achievable by construction). A candidate that misses any gate is
  * REJECTED: nothing publishes, the previous release keeps serving, and
  * the run SUCCEEDS — rejection is an outcome, not a failure (the
  * MlTrainingDag branch contract). The un-taken branch reports
  * `skipped_done` via its done-probe.
  *
  * Publishing rides [[ModelRegistry.saveArtifact]] — the same
  * temp-write → rename → commit-marker protocol as models, so consumers
  * (training jobs reading `versionPath`) never see a torn release.
  */
object CurationDag {

  final case class ReleaseGates(
      minKeptFrac: Double = 0.5,
      minDocs: Long = 10L,
      maxCrossSplitPairs: Long = 0L)

  /** Terminal state of one release run. `servingVersion` is what corpus
    * consumers read AFTER the run: the new version when released, the
    * prior release (or None on first-run rejection) otherwise. */
  final case class ReleaseRun(
      report: Seq[Orchestrator.StageResult],
      released: Boolean,
      publishedVersion: Option[Long],
      servingVersion: Option[Long],
      keptFrac: Double,
      keptDocs: Long,
      crossSplitPairs: Long)

  val ArtifactName = "corpus_release"

  /** Diff two committed corpus releases (default: latest vs previous) —
    * the dataset-versioning "what changed between v_n and v_{n+1}" view:
    * per doc_id insert/update/delete classification with old/new split
    * assignments, riding [[graft.operators.ChangeFeed.changes]] (the
    * same machinery the table-grain change feed gates). A training run
    * reads this to know whether a release bump requires re-tokenizing
    * everything or only the delta. */
  def releaseDiff(spark: SparkSession, registryRoot: String,
                  from: Option[Long] = None,
                  to: Option[Long] = None): DataFrame = {
    val committed = ModelRegistry.committedVersions(spark, registryRoot, ArtifactName)
    val latest = committed.lastOption
      .getOrElse(throw new IllegalStateException("no committed releases"))
    val vTo = to.getOrElse(latest)
    // default vFrom = the greatest COMMITTED version below vTo, not vTo-1:
    // a crash between temp-write and commit marker can leave version
    // sequences non-contiguous, and vTo-1 would then read a missing or
    // uncommitted path and fail with an opaque parquet error
    val vFrom = from.getOrElse(
      committed.filter(_ < vTo).lastOption.getOrElse(
        throw new IllegalStateException("need two releases to diff")))
    def docsOf(v: Long) = spark.read.parquet(
      ModelRegistry.versionPath(spark, registryRoot, ArtifactName,
        Some(v)) + "/documents")
    graft.operators.ChangeFeed.changes(
      docsOf(vFrom), docsOf(vTo),
      keys = Seq("doc_id"), attrs = Seq("text", "split"))
  }

  def run(spark: SparkSession, documents: DataFrame, workDir: String,
          registryRoot: String,
          gates: ReleaseGates = ReleaseGates()): ReleaseRun = {
    val audit = s"$workDir/audit"
    val split = s"$workDir/split"
    val leak = s"$workDir/leakage"

    // driver-visible gate inputs — each a 1-row read of a tiny artifact
    @volatile var decided = false
    @volatile var pass = false
    @volatile var gateStats: (Double, Long, Long) = (0.0, 0L, 0L)

    def stats(): (Double, Long, Long) = {
      val a = spark.read.parquet(audit)
        .agg(count(lit(1)).as("n"),
          sum(col("kept").cast("long")).as("k")).collect()(0)
      val (n, k) = (a.getLong(0), a.getLong(1))
      val cross = spark.read.parquet(leak)
        .agg(coalesce(sum(col("crosses_split").cast("long")), lit(0L)))
        .collect()(0).getLong(0)
      (if (n == 0) 0.0 else k.toDouble / n, k, cross)
    }

    val stages = Seq(
      Orchestrator.Stage("validate_input", Nil, () => {
        require(!documents.isEmpty, "empty input corpus")
        require(documents.columns.contains("text"), "corpus must carry text")
      }),
      Orchestrator.Stage("curate", Seq("validate_input"), () =>
        Curation.curatePipeline(documents)
          .write.mode("overwrite").parquet(audit)),
      Orchestrator.Stage("split", Seq("curate"), () => {
        val kept = spark.read.parquet(audit).filter(col("kept"))
          .select(col("doc_id"))
        val keptDocs = documents.join(kept, "doc_id")
        Sampling.hashSplit(
            Components.dedupClusters(keptDocs).select(col("doc_id"), col("cluster_id")),
            col("cluster_id"), trainBp = 8000, valBp = 1000)
          .write.mode("overwrite").parquet(split)
      }),
      Orchestrator.Stage("leakage_audit", Seq("split"), () => {
        val kept = spark.read.parquet(audit).filter(col("kept"))
          .select(col("doc_id"))
        val sp = spark.read.parquet(split).select(col("doc_id"), col("split"))
        val pairs = MinHash.nearDupPairs(documents.join(kept, "doc_id"))
          .select(col("doc_a"), col("doc_b"))
        pairs
          .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
          .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            (col("split_a") =!= col("split_b")).as("crosses_split"))
          .write.mode("overwrite").parquet(leak)
      }),
      Orchestrator.Stage("gate", Seq("leakage_audit"), () => {
        val s = stats()
        gateStats = s // stashed so run() need not re-read the artifacts
        val (frac, k, cross) = s
        pass = frac >= gates.minKeptFrac && k >= gates.minDocs &&
          cross <= gates.maxCrossSplitPairs
        decided = true
      }),
      Orchestrator.Stage("publish_release", Seq("gate"),
        run = () => {
          ModelRegistry.saveArtifact(spark, registryRoot, ArtifactName) { tmp =>
            val kept = spark.read.parquet(audit).filter(col("kept"))
              .select(col("doc_id"))
            documents.join(kept, "doc_id")
              .join(spark.read.parquet(split).select(col("doc_id"), col("split")),
                "doc_id")
              .write.parquet(s"$tmp/documents")
            spark.read.parquet(audit).write.parquet(s"$tmp/audit")
          }
          ()
        },
        done = () => decided && !pass), // branch not taken on reject
      Orchestrator.Stage("reject_release", Seq("gate"),
        run = () => (), // previous release keeps serving; outcome recorded below
        done = () => decided && pass)
    )

    val before = ModelRegistry.latestVersion(spark, registryRoot, ArtifactName)
    val report = Orchestrator.run(stages, parallelism = 2)
    val ok = report.forall(r => r.status == "success" || r.status == "skipped_done")
    val (frac, k, cross) = gateStats
    val after = ModelRegistry.latestVersion(spark, registryRoot, ArtifactName)
    val released = ok && decided && pass
    ReleaseRun(
      report = report,
      released = released,
      publishedVersion = if (released) after else None,
      servingVersion = if (released) after else before,
      keptFrac = frac, keptDocs = k, crossSplitPairs = cross)
  }
}
