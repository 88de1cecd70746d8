package graft

import graft.ml.{FraudScore, GbtModel, TrainedModel}
import graft.operators.{Cleaning, Enrichment}
import org.apache.spark.sql.functions._

/** Trained-model contract: a LogisticRegression fit on the full 25-feature
  * vector must beat the shipped literal-weight scorer on the identical
  * held-out split (the literal scorer only sees 6 of the features). */
class MlSpec extends SparkSpec {

  private def fullFeatures = {
    val clean = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
    FraudScore.fullFeatureVector(
      Enrichment.enrichOrders(clean, Tables.customer(spark, TinySf),
        Tables.nation(spark, TinySf), Tables.region(spark, TinySf)),
      clean,
      Cleaning.cleanLineitem(Tables.lineitem(spark, TinySf)))
  }

  test("trained LR beats the literal-weight scorer on the held-out split") {
    val feats = fullFeatures.cache()
    try {
      val trained = TrainedModel.trainEval(feats)
        .select("n_test", "accuracy", "f1").collect()(0)
      val literalPred = FraudScore.withSplit(FraudScore.score(feats))
        .filter(col("is_test"))
        .select(col("o_orderkey"), col("label"), col("predicted_fraud"))
      val literal = TrainedModel.metrics(literalPred)
        .select("n_test", "accuracy", "f1").collect()(0)
      assert(trained.getLong(0) == literal.getLong(0)) // same split
      assert(trained.getDouble(1) >= literal.getDouble(1),
        s"trained accuracy ${trained.getDouble(1)} < literal ${literal.getDouble(1)}")
      assert(trained.getDouble(2) >= literal.getDouble(2),
        s"trained F1 ${trained.getDouble(2)} < literal ${literal.getDouble(2)}")
    } finally feats.unpersist()
  }

  test("GBT (XGBoost analog) beats the literal-weight scorer on the held-out split") {
    val feats = fullFeatures.cache()
    try {
      val gbt = GbtModel.trainEval(feats)
        .select("n_test", "accuracy", "f1").collect()(0)
      val literalPred = FraudScore.withSplit(FraudScore.score(feats))
        .filter(col("is_test"))
        .select(col("o_orderkey"), col("label"), col("predicted_fraud"))
      val literal = TrainedModel.metrics(literalPred)
        .select("n_test", "accuracy", "f1").collect()(0)
      assert(gbt.getLong(0) == literal.getLong(0)) // same split
      assert(gbt.getDouble(1) >= literal.getDouble(1),
        s"GBT accuracy ${gbt.getDouble(1)} < literal ${literal.getDouble(1)}")
      assert(gbt.getDouble(2) >= literal.getDouble(2),
        s"GBT F1 ${gbt.getDouble(2)} < literal ${literal.getDouble(2)}")
    } finally feats.unpersist()
  }

  test("GBT training is seeded-deterministic: two fits give identical held-out metrics") {
    val feats = fullFeatures.cache()
    try {
      val a = GbtModel.trainEval(feats, maxIter = 5).collect()(0)
      val b = GbtModel.trainEval(feats, maxIter = 5).collect()(0)
      assert(a == b, s"non-deterministic GBT fit: $a vs $b")
    } finally feats.unpersist()
  }

  test("seeded CV grid search selects a grid point and reports its CV AUC") {
    val feats = fullFeatures.cache()
    try {
      val row = GbtModel.tunedEval(feats, maxIter = 5).collect()(0)
      val depth = row.getAs[Long]("best_max_depth")
      val step = row.getAs[Double]("best_step_size")
      assert(Set(3L, 6L).contains(depth), s"depth $depth not in grid")
      assert(Set(0.05, 0.1).contains(step), s"stepSize $step not in grid")
      val auc = row.getAs[Double]("cv_auc")
      assert(auc > 0.5 && auc <= 1.0, s"CV AUC $auc not better than chance")
      // tuned model's held-out accuracy is sane (label is a feature rule,
      // so any competent tree ensemble scores far above the ~0.5 floor)
      assert(row.getAs[Double]("accuracy") > 0.9)
      // the seeded search is reproducible
      val again = GbtModel.tunedEval(feats, maxIter = 5).collect()(0)
      assert(row == again, s"non-deterministic CV selection: $row vs $again")
    } finally feats.unpersist()
  }
}
