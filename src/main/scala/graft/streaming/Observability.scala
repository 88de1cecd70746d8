package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: the reference exports rows/sec, batch duration
  * and lag to Prometheus/Grafana (ref: /root/reference/monitoring/
  * prometheus, monitoring/grafana/dashboards/fraud_platform.json — message
  * throughput rates and latency quantiles). The Spark-native signal source
  * for all of those is `StreamingQueryProgress`; this listener captures
  * every micro-batch's progress into a bounded in-memory ring exposed as a
  * DataFrame, so backpressure questions ("is processedRowsPerSecond
  * keeping up with inputRowsPerSecond?", "is state growing without
  * bound?", "is the watermark advancing?") are one query away. At scale
  * the same rows would be appended to a metrics table or scraped — the
  * capture path is identical.
  */
object Observability {

  /** One micro-batch's health row. */
  case class BatchMetric(
      query_name: String,
      query_id: String,
      batch_id: Long,
      batch_ts: String,
      num_input_rows: Long,
      input_rows_per_sec: Double,
      processed_rows_per_sec: Double,
      batch_duration_ms: Long,
      watermark: String,
      state_rows: Long,
      state_memory_bytes: Long)

  /** One stateful operator's health row within a micro-batch — the
    * component-level gauges the reference's Grafana "System Health" row
    * tracks per service (monitoring/grafana/dashboards/
    * fraud_platform.json): which OPERATOR's state is growing, which one's
    * commit is slow, not just the query total. */
  case class OperatorMetric(
      query_name: String,
      batch_id: Long,
      operator_name: String,
      num_rows_total: Long,
      num_rows_updated: Long,
      num_rows_removed: Long,
      memory_used_bytes: Long,
      commit_time_ms: Long,
      all_updates_time_ms: Long,
      num_state_store_instances: Long)

  /** Captures per-batch metrics; bounded so a long-running query can't
    * grow driver memory without limit (Prometheus scrape semantics: recent
    * window matters, history lives downstream). */
  /** Monotonic per-query lifetime totals — survive ring eviction, so
    * scrape counters never decrease (Prometheus counter semantics). */
  case class QueryTotals(input_rows: Long, batches: Long, duration_ms_sum: Long)

  class MetricsListener(maxRows: Int = 10000) extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedDeque[BatchMetric]()
    private val opBuf = new java.util.concurrent.ConcurrentLinkedDeque[OperatorMetric]()
    private val cum = new java.util.concurrent.ConcurrentHashMap[String, QueryTotals]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val states = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
      def noNaN(d: Double) = if (d.isNaN || d.isInfinite) 0.0 else d
      buf.addLast(BatchMetric(
        query_name = Option(p.name).getOrElse(""),
        query_id = p.id.toString,
        batch_id = p.batchId,
        batch_ts = p.timestamp,
        num_input_rows = p.numInputRows,
        input_rows_per_sec = noNaN(p.inputRowsPerSecond),
        processed_rows_per_sec = noNaN(p.processedRowsPerSecond),
        batch_duration_ms = p.batchDuration,
        watermark = Option(p.eventTime.get("watermark")).getOrElse(""),
        state_rows = states.map(_.numRowsTotal).sum,
        state_memory_bytes = states.map(_.memoryUsedBytes).sum))
      cum.merge(Option(p.name).getOrElse(""),
        QueryTotals(p.numInputRows, 1L, p.batchDuration),
        (a, b) => QueryTotals(a.input_rows + b.input_rows,
          a.batches + b.batches, a.duration_ms_sum + b.duration_ms_sum))
      while (buf.size() > maxRows) buf.pollFirst()
      states.foreach { s =>
        opBuf.addLast(OperatorMetric(
          query_name = Option(p.name).getOrElse(""),
          batch_id = p.batchId,
          operator_name = Option(s.operatorName).getOrElse(""),
          num_rows_total = s.numRowsTotal,
          num_rows_updated = s.numRowsUpdated,
          num_rows_removed = s.numRowsRemoved,
          memory_used_bytes = s.memoryUsedBytes,
          commit_time_ms = s.commitTimeMs,
          all_updates_time_ms = s.allUpdatesTimeMs,
          num_state_store_instances = s.numStateStoreInstances))
      }
      while (opBuf.size() > maxRows) opBuf.pollFirst()
    }

    /** Driver-side snapshot of captured batches (the scrape surface —
      * the exposition formatter reads this, no Spark job). */
    def snapshot: Seq[BatchMetric] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }

    /** Driver-side snapshot of per-operator rows. */
    def operatorSnapshot: Seq[OperatorMetric] = {
      import scala.jdk.CollectionConverters._
      opBuf.iterator().asScala.toSeq
    }

    /** Lifetime per-query totals (never evicted — the counter source). */
    def totalsSnapshot: Map[String, QueryTotals] = {
      import scala.jdk.CollectionConverters._
      cum.asScala.toMap
    }

    /** Snapshot of captured batches as a queryable frame. */
    def metrics(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.toDF()
    }

    /** Per-operator state-store rows as a queryable frame (one row per
      * stateful operator per micro-batch). */
    def operatorMetrics(spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      opBuf.iterator().asScala.toSeq.toDF()
    }

    /** Component-level health rollup: per (query, operator) state growth,
      * memory, and commit latency — the gauge set a "System Health"
      * dashboard row needs to localize WHICH stateful operator is the
      * problem. */
    def operatorSummary(spark: SparkSession): DataFrame =
      operatorMetrics(spark)
        .groupBy("query_name", "operator_name")
        .agg(
          count(lit(1)).as("batches"),
          max(col("num_rows_total")).as("max_state_rows"),
          sum(col("num_rows_updated")).as("total_rows_updated"),
          max(col("memory_used_bytes")).as("max_state_memory_bytes"),
          avg(col("commit_time_ms")).as("avg_commit_ms"),
          expr("percentile(commit_time_ms, 0.95)").as("p95_commit_ms"))

    /** Per-query health rollup — the Grafana-panel shapes (throughput,
      * duration percentiles, state growth, watermark advance) as one
      * aggregation over the captured batches. */
    def summary(spark: SparkSession): DataFrame =
      metrics(spark)
        .groupBy("query_name", "query_id")
        .agg(
          count(lit(1)).as("batches"),
          sum(col("num_input_rows")).as("total_rows"),
          avg(col("processed_rows_per_sec")).as("avg_rows_per_sec"),
          avg(col("batch_duration_ms")).as("avg_batch_ms"),
          expr("percentile(batch_duration_ms, 0.95)").as("p95_batch_ms"),
          max(col("state_rows")).as("max_state_rows"),
          max(col("watermark")).as("max_watermark"))

    def clear(): Unit = { buf.clear(); opBuf.clear(); cum.clear() }
  }

  /** Attach a fresh listener to the session; caller owns removal. */
  def attach(spark: SparkSession, maxRows: Int = 10000): MetricsListener = {
    val l = new MetricsListener(maxRows)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.streams.removeListener(l)
}
