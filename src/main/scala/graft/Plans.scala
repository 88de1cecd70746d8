package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for plan-audit (not part of the driver contract). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_pricing_summary", "q_enrich_orders", "q_velocity", "q_ship_priority",
      "q_local_volume", "q_neardup_pairs", "q_knn_bucketed", "q_asof_join")
    for (n <- names) {
      println(s"\n======== $n ========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
