package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze-layer ingestion shaping: parse semi-structured payloads, attach
  * lineage metadata, derive the partition date — the batch-shaped core of
  * the reference's Kafka→bronze streaming job (the streaming wrapper lives
  * in graft.streaming.StreamOps and reuses this transform).
  * Ref: /root/reference/spark_jobs/bronze/ingest_stream.py
  * (parse_and_enrich: _kafka_* metadata, _source_system, event_date).
  */
object Bronze {

  /** Events with parsed JSON props + lineage columns + partition date.
    * `props` is a JSON string like {"k": 87}; extraction stays inside
    * codegen (get_json_object), no UDF. */
  def bronzeEvents(events: DataFrame): DataFrame =
    events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("event_date", col("ts").cast("date"))
      .withColumn("ts_second", unix_timestamp(date_trunc("second", col("ts"))))
      .withColumn("_source_system", lit("file-stream"))
      .withColumn("_pipeline_version", lit("1.0.0"))
      .drop("ts")

  /** Bad-record classification for the quarantine split — the explicit
    * form of what the reference's `from_json(value, schema)` does
    * silently (malformed payloads null out; ingest_stream.py:73). A real
    * bronze keeps the rejects: quarantined rows carry WHY they failed so
    * re-ingestion after a producer fix can target a reason. Codegen-only
    * column logic (get_json_object + cast), no UDF; linear. */
  def withQuarantineReason(events: DataFrame): DataFrame =
    events.withColumn("quarantine_reason",
      when(col("props").isNull, "null_props")
        .when(get_json_object(col("props"), "$").isNull, "invalid_json")
        .when(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").isNull, "bad_k")
        .otherwise("ok"))

  /** The rows a bronze run would divert (reason != ok). */
  def quarantined(events: DataFrame): DataFrame =
    withQuarantineReason(events).filter(col("quarantine_reason") =!= "ok")
}
