package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: all-pairs cosine distribution + same-cell recall of
  * semanticDedup at candidate thresholds (used to pick the spec's tau). */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]").appName("semdedup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    println(s"corpus rows: ${e.count()}")
    val base = e.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val pairs = base.alias("a").join(
        base.select(col("vec_id").as("u_id"), col("embedding").as("uv"),
          col("nrm").as("u_nrm")),
        col("u_id") < col("vec_id"))
      .withColumn("cos", expr("vec_dot(uv, embedding)") / (col("u_nrm") * col("nrm")))
    pairs.select(
      sum(when(col("cos") > 0.3, 1)).as("gt30"),
      sum(when(col("cos") > 0.4, 1)).as("gt40"),
      sum(when(col("cos") > 0.5, 1)).as("gt50"),
      sum(when(col("cos") > 0.6, 1)).as("gt60"),
      sum(when(col("cos") > 0.7, 1)).as("gt70"),
      sum(when(col("cos") > 0.8, 1)).as("gt80"),
      sum(when(col("cos") > 0.9, 1)).as("gt90"),
      max(col("cos")).as("max_cos")).show(false)
    for (tau <- Seq(0.35, 0.5, 0.6, 0.7, 0.8)) {
      val exact = pairs.filter(col("cos") > tau)
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      val got = graft.sim.Similarity.semanticDedup(e, 16, tau)
        .filter(!col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
      val rec = if (exact.isEmpty) Double.NaN else got.size.toDouble / exact.size
      println(f"tau=$tau%.2f exactDropped=${exact.size} gotDropped=${got.size} recall=$rec%.3f")
    }
    spark.stop()
  }
}
