package graft

import graft.ml.{FraudScore, TrainedModel}
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
}
