package graft.pipeline

import graft.gold.{FraudSummary, Revenue}
import graft.ml.FraudScore
import graft.operators.{Bronze, Cleaning, Enrichment, MergeUpsert}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze → Silver → Gold medallion materialization: the reference's
  * layered lakehouse (Kafka→Delta on MinIO, Airflow-scheduled) re-expressed
  * as partitioned parquet layers with idempotent silver merges.
  * Ref: /root/reference/spark_jobs/ (bronze, silver, gold jobs) and
  * /root/reference/airflow/dags/ (layer scheduling).
  *
  * Layout and scale choices:
  *  - every layer partitioned by its date column (`partitionBy`) — the
  *    100 TB pruning axis; daily re-processing rewrites only its partition;
  *  - silver is MERGE-upserted on the business key, so any slice can be
  *    re-processed any number of times without duplicates (the reference's
  *    core idempotency contract);
  *  - gold tables are sorted within partitions on their dominant filter
  *    column (the reference Z-orders on (shipping_country, event_date) —
  *    same locality goal, parquet-native mechanism: row-group min/max
  *    pruning on the sorted column).
  */
class Medallion(spark: SparkSession, sfDir: String, warehouseDir: String) {

  private def path(layer: String, table: String) = s"$warehouseDir/$layer/$table"

  // ---- bronze: raw + lineage, append-shaped, partitioned by event_date ----

  def runBronze(): Unit = {
    Bronze.bronzeEvents(graft.Tables.events(spark, sfDir))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path("bronze", "events"))

    graft.Tables.orders(spark, sfDir)
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("order_date")
      .parquet(path("bronze", "orders"))
  }

  // ---- silver: cleaned + enriched, MERGE-idempotent ----

  /** Cleans/enriches bronze orders and MERGE-upserts into silver (source
    * wins on o_orderkey) — running this any number of times yields the
    * same table. */
  def runSilver(): Unit = {
    val bronzeOrders = spark.read.parquet(path("bronze", "orders"))
      .drop("order_date") // re-derived by cleaning
    val enriched = Enrichment.enrichOrders(
      Cleaning.cleanOrders(bronzeOrders),
      graft.Tables.customer(spark, sfDir),
      graft.Tables.nation(spark, sfDir),
      graft.Tables.region(spark, sfDir))

    val target = path("silver", "orders_enriched")
    val merged =
      if (fileExists(target)) {
        MergeUpsert.merge(
          spark.read.parquet(target).drop("_merge_action"),
          enriched, Seq("o_orderkey"))
      } else enriched.withColumn("_merge_action", lit("inserted"))
    // write via temp dir: the merge reads the target it overwrites
    val tmp = target + "_tmp"
    merged.write.mode(SaveMode.Overwrite).partitionBy("order_date").parquet(tmp)
    replaceDir(target, tmp)
  }

  // ---- gold: aggregates, sorted-within-partition on the filter axis ----

  def runGold(): Unit = {
    val silver = spark.read.parquet(path("silver", "orders_enriched"))
    Revenue.revenueDaily(silver)
      .sortWithinPartitions("order_date", "status_normalized")
      .write.mode(SaveMode.Overwrite).parquet(path("gold", "revenue_daily"))

    FraudScore.score(FraudScore.featureVector(silver))
      .sortWithinPartitions("risk_label")
      .write.mode(SaveMode.Overwrite).parquet(path("gold", "fraud_scores"))

    FraudSummary.userRiskScores(graft.Tables.events(spark, sfDir))
      .write.mode(SaveMode.Overwrite).parquet(path("gold", "user_risk_scores"))
  }

  def runAll(): Unit = { runBronze(); runSilver(); runGold() }

  def readGold(table: String): DataFrame = spark.read.parquet(path("gold", table))
  def readSilver(table: String): DataFrame = spark.read.parquet(path("silver", table))

  private def fileExists(p: String): Boolean =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(p))

  private def replaceDir(target: String, tmp: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t = new org.apache.hadoop.fs.Path(target)
    if (fs.exists(t)) fs.delete(t, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), t)
  }
}
