package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka → bronze source wiring, re-expressing the reference's streaming
  * ingestion (ref: /root/reference/spark_jobs/bronze/ingest_stream.py,
  * create_kafka_stream + parse_and_enrich).
  *
  * The sandbox classpath has no kafka connector jars, so `readStream` is
  * code-complete but unexercised here; the parse/enrich transform is a
  * plain DataFrame function over the connector's fixed output schema
  * (key/value/topic/partition/offset/timestamp — a public, stable
  * contract), so StreamingSpec drives it with a mocked frame of that
  * schema and the production path differs only in `.format("kafka")`.
  */
object KafkaSource {

  /** JSON payload schema for the events topic (same fields the parquet
    * events table carries; ts as epoch micros in the payload). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts_us", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming source (reference: create_kafka_stream). */
  def readStream(spark: SparkSession, brokers: String, topic: String,
                 maxOffsetsPerTrigger: Long = 50000L): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("failOnDataLoss", "false")
      .load()
      .transform(parseAndEnrich)

  /** Kafka record → parsed payload + lineage + partition date (reference:
    * parse_and_enrich — same column contract: _kafka_* lineage, raw payload
    * preserved for auditability, event_date partition column). Works
    * identically on the real connector output and on any batch frame with
    * the connector's schema. */
  def parseAndEnrich(raw: DataFrame): DataFrame =
    raw
      .select(
        col("key").cast("string").as("_kafka_key"),
        col("topic").as("_kafka_topic"),
        col("partition").as("_kafka_partition"),
        col("offset").as("_kafka_offset"),
        col("timestamp").as("_kafka_timestamp"),
        col("value").cast("string").as("_raw_payload"),
        from_json(col("value").cast("string"), EventSchema).as("data"))
      .select(col("_kafka_key"), col("_kafka_topic"), col("_kafka_partition"),
        col("_kafka_offset"), col("_kafka_timestamp"), col("_raw_payload"),
        col("data.*"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("event_date", col("ts").cast("date"))
      .withColumn("_source_system", lit("kafka"))
      .withColumn("_pipeline_version", lit("1.0.0"))
}
