package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// temporary r13 measurement scratch — NOT part of the driver contract; deleted before round end
object Scratch13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    def time(label: String)(f: => Unit): Unit = {
      util.CacheRegistry.releaseAll(spark)
      val t0 = System.nanoTime(); f
      println(f"SCRATCH $label%-32s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // ---- tail fixed-cost probe (VERDICT r12 #8) ----
    for (r <- 1 to 3) {
      time("tail_asof_join") { noop(SparkEntry.queries("q_asof_join")(spark, sfDir)) }
      time("tail_benford") { noop(SparkEntry.queries("q_benford")(spark, sfDir)) }
      time("tail_cohort_ltv") { noop(SparkEntry.queries("q_cohort_ltv")(spark, sfDir)) }
      time("tail_cusum") { noop(SparkEntry.queries("q_cusum")(spark, sfDir)) }
      time("tail_dashboard_kpis") { noop(SparkEntry.queries("q_dashboard_kpis")(spark, sfDir)) }
    }
    // footer/listing slice: re-load + count every table with swept caches
    for (r <- 1 to 3) {
      time("tables_reload_count") {
        util.CacheRegistry.releaseAll(spark)
        Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
      }
    }
    spark.stop()
  }
}
