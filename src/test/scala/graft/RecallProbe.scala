package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: print per-method ANN recall at a given SF (default
  * sf0.01, the driver's verify scale) — used to tune nprobe/refine. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]").appName("recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sf)
    graft.sim.Similarity.knnRecallSummary(e).show(false)
    spark.stop()
  }
}
