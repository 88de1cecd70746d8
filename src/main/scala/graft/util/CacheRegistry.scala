package graft.util

/** Central sweep of every operator-local persist registry.
  *
  * Several operators cache an intermediate frame for the duration of one
  * query (banded MinHash signatures, pair-grain attribution masks, graph
  * edge lists, …) and expose an idempotent `releaseCache()`. Inside one
  * query those lifecycles are correct, but a long same-session run over
  * the whole registry (Bench, Verify) accumulates whichever persists the
  * most-recent query left live, and the resulting executor-memory / GC
  * pressure inflates late queries 5-6× (the r11 phantom-regression class:
  * 13.2s in-run vs 2.6s isolated for the same plan). Sweeping between
  * queries restores inter-query independence without touching any
  * operator's intra-query contract.
  */
object CacheRegistry {

  private val sweeps: Seq[() => Unit] = Seq(
    () => graft.text.BloomDedup.releaseCache(),
    () => graft.text.Dsir.releaseCache(),
    () => graft.text.MinHash.releaseCache(),
    () => graft.text.SetSimJoin.releaseCache(),
    () => graft.text.Winnow.releaseCache(),
    () => graft.gold.Rings.releaseCache(),
    () => graft.gold.Rfm.releaseCache(),
    () => graft.gold.Attribution.releaseCache(),
    () => graft.gold.Graph.releaseCache(),
    () => graft.gold.Basket.releaseCache(),
    () => graft.gold.Seasonal.releaseCache(),
    () => graft.operators.Robust.releaseCache(),
    () => graft.operators.ScalableRank.releaseCache(),
    () => graft.ml.Encodings.releaseCache(),
    () => graft.ml.TrainedModel.releaseCache(),
    () => graft.ml.Uplift.releaseCache(),
    () => graft.ml.QualityClassifier.releaseCache(),
  )

  /** Release every operator-local persist, then drop whatever is left in
    * the session cache catalog. Safe to call between queries: every
    * registered release is idempotent and no operator holds state across
    * query boundaries by contract. */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    sweeps.foreach { s =>
      try s() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
  }
}
