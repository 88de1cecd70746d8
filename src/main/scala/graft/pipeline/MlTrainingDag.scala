package graft.pipeline

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.{Evaluation, GbtModel, ModelRegistry, TrainedModel}
import graft.streaming.StreamScoring

/** Daily model-retrain DAG — the engine-side analog of the reference's
  * `ml_fraud_training` Airflow DAG (airflow/dags/ml_training_dag.py:
  * validate data → train → evaluate → quality-gate branch →
  * promote | reject → hot-reload serving). Composes pieces the engine
  * already ships — [[graft.ml.GbtModel]] (train/eval),
  * [[graft.ml.ModelRegistry]] (versioned publish),
  * [[graft.streaming.StreamScoring.HotModelScorer]] (serving pickup) —
  * as an [[Orchestrator]] stage graph, with the reference's BRANCH
  * semantics preserved: a candidate that misses the gates is REJECTED
  * (never published), the previous production version keeps serving, and
  * the run itself still SUCCEEDS — rejection is an outcome, not a
  * failure (ref notify_rejection: "Keeping previous model in
  * production").
  *
  * Branching on the Orchestrator: Airflow's BranchPythonOperator skips
  * the un-taken branch; here each branch stage carries a `done` probe
  * that reads the gate decision, so the un-taken branch reports
  * `skipped_done` — same task-instance shape, no new operator kind.
  *
  * Scale shape: every stage body is Spark jobs over the cluster (one
  * validation aggregate, the GBT fit passes, two 1-row metric reduces);
  * the gate decision itself is a driver-side 1-row read — exactly the
  * reference's metrics.json gate, and the only driver-visible data.
  */
object MlTrainingDag {

  /** Promotion thresholds — defaults are the reference's
    * (ml_training_dag.py MIN_ROC_AUC / MIN_PRECISION / MIN_RECALL). */
  final case class QualityGates(
      minRocAuc: Double = 0.85,
      minPrecision: Double = 0.70,
      minRecall: Double = 0.60)

  /** Terminal state of one retrain run.
    *
    * @param report           per-stage Airflow-task-instance rows
    * @param promoted         did the candidate pass the gates
    * @param publishedVersion registry version the candidate was published
    *                         as (None when rejected)
    * @param servingVersion   version the hot scorer serves AFTER the run —
    *                         the new version when promoted, the prior
    *                         production version (or None on a first-run
    *                         rejection) otherwise
    * @param metrics          candidate's held-out roc_auc / precision /
    *                         recall, as the gate saw them
    */
  final case class TrainingRun(
      report: Seq[Orchestrator.StageResult],
      promoted: Boolean,
      publishedVersion: Option[Long],
      servingVersion: Option[Long],
      metrics: Map[String, Double])

  /** Run one retrain cycle: `fullFeatures` is the (o_orderkey, label,
    * 25 features) frame from the batch pipeline
    * (FraudScore.fullFeatureVector shape); `scorer` is the LIVE serving
    * scorer whose hot-reload pickup the final stage verifies. */
  def run(fullFeatures: DataFrame, registryRoot: String,
          scorer: StreamScoring.HotModelScorer,
          gates: QualityGates = QualityGates(),
          maxIter: Int = 5,
          modelName: String = "fraud_gbt"): TrainingRun = {
    val spark = fullFeatures.sparkSession

    // cross-stage state (the XCom analog): written by exactly one stage,
    // read only by stages downstream of that writer
    @volatile var candidate: Option[(GBTClassificationModel, DataFrame)] = None
    @volatile var metrics: Map[String, Double] = Map.empty
    @volatile var promote = false
    @volatile var published: Option[Long] = None
    @volatile var serving: Option[Long] = None

    val stages = Seq(
      Orchestrator.Stage("validate_features", run = () => {
        // the DAG's data-quality gate: rows exist, both classes present,
        // no null labels — one aggregate, fail-fast before paying a fit
        val r = fullFeatures.agg(
            count(lit(1)).as("n"),
            sum(when(col("label").isNull, 1L).otherwise(0L)).as("null_labels"),
            sum(when(col("label") === 1, 1L).otherwise(0L)).as("pos"),
            sum(when(col("label") === 0, 1L).otherwise(0L)).as("neg"))
          .collect()(0)
        require(r.getLong(0) > 0, "no training rows")
        require(r.getLong(1) == 0, s"${r.getLong(1)} null labels")
        require(r.getLong(2) > 0 && r.getLong(3) > 0,
          s"degenerate label distribution pos=${r.getLong(2)} neg=${r.getLong(3)}")
      }),
      Orchestrator.Stage("train_model", deps = Seq("validate_features"),
        run = () => candidate = Some(GbtModel.trainCandidate(fullFeatures, maxIter))),
      Orchestrator.Stage("evaluate_model", deps = Seq("train_model"), run = () => {
        val (model, assembled) = candidate.get
        val scored = model.transform(assembled.filter(col("is_test")))
          .withColumn("predicted_fraud", col("prediction").cast("long"))
          .withColumn("p_fraud", vector_to_array(col("probability")).getItem(1))
          .select("o_orderkey", "label", "predicted_fraud", "p_fraud")
        val m = TrainedModel.metrics(scored)
          .select("precision", "recall").collect()(0)
        val auc = Evaluation.rocAuc(scored, "p_fraud", "label", "o_orderkey")
          .select("auc").collect()(0).getDouble(0)
        metrics = Map(
          "roc_auc" -> auc,
          "precision" -> (if (m.isNullAt(0)) 0.0 else m.getDouble(0)),
          "recall" -> (if (m.isNullAt(1)) 0.0 else m.getDouble(1)))
      }),
      Orchestrator.Stage("quality_gate", deps = Seq("evaluate_model"),
        run = () => promote =
          metrics("roc_auc") >= gates.minRocAuc &&
          metrics("precision") >= gates.minPrecision &&
          metrics("recall") >= gates.minRecall),
      // the branch: exactly one of promote_model / notify_rejection runs
      Orchestrator.Stage("promote_model", deps = Seq("quality_gate"),
        done = () => !promote,
        run = () => published = Some(
          ModelRegistry.save(spark, candidate.get._1, registryRoot, modelName))),
      Orchestrator.Stage("notify_rejection", deps = Seq("quality_gate"),
        done = () => promote,
        run = () => ()), // the alert hook: previous model keeps serving
      // serving pickup: only meaningful after a promote (ref wires
      // promote_model >> reload_serving; the reject branch ends the DAG)
      Orchestrator.Stage("reload_serving", deps = Seq("promote_model"),
        done = () => !promote,
        run = () => {
          val batch = candidate.get._2.filter(col("is_test")).limit(32)
          scorer.scoreBatch(batch).count() // forces the version resolve
          serving = scorer.loadedVersion
          require(serving == published,
            s"scorer serves $serving after publishing $published")
        }))

    val report = Orchestrator.run(stages)
    if (!promote) serving = scorer.loadedVersion
    TrainingRun(report, promote, published, serving, metrics)
  }
}
