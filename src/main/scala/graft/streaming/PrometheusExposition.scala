package graft.streaming

import java.util.Locale

/** Prometheus text-exposition formatter over the streaming health frames —
  * the last unexpressed reference surface: the serving API exposes a
  * `/metrics` scrape endpoint (ref ml/serving/api.py:274 `generate_latest`,
  * with the counter/histogram family at api.py:37-40), and the Grafana
  * "System Health" row scrapes it. The Spark-native signal source is
  * [[Observability.MetricsListener]]'s captured `StreamingQueryProgress`
  * rows; this object renders a snapshot of them in the Prometheus text
  * exposition format version 0.0.4 (`# HELP` / `# TYPE` headers, escaped
  * labels, one sample per line) so any scraper can ingest the engine's
  * streaming health without a new dependency.
  *
  * Scale shape: pure driver-side string building over the listener's
  * bounded in-memory ring (≤ maxRows rows) — a scrape never launches a
  * Spark job, exactly like the reference endpoint never queries the
  * warehouse.
  */
object PrometheusExposition {

  /** Render one scrape of the listener's current snapshots. */
  def render(l: Observability.MetricsListener): String =
    render(l.snapshot, l.operatorSnapshot, l.totalsSnapshot)

  /** Render a scrape from explicit snapshots (test seam; the listener
    * overload is the production path).
    *
    * Family design mirrors the reference's metric set: monotonic totals
    * (`ml_predictions_total` analog), a latency summary with quantile
    * labels (`ml_prediction_latency_ms` Histogram analog), and current
    * gauges for throughput, state size and watermark age — the panels the
    * Grafana dashboard reads.
    *
    * Counters and the summary's `_sum`/`_count` come from `totals` — the
    * listener's LIFETIME per-query accumulators, which survive ring
    * eviction — never from sums over the bounded window: a windowed
    * "counter" DECREASES once eviction starts, and Prometheus reads any
    * decrease as a process restart (rate()/increase() then book phantom
    * spikes). Quantiles stay window-scoped — sliding-window quantiles
    * with cumulative _sum/_count is exactly the client-library summary
    * contract. */
  def render(batches: Seq[Observability.BatchMetric],
             operators: Seq[Observability.OperatorMetric],
             totals: Map[String, Observability.QueryTotals]): String = {
    val sb = new StringBuilder
    val byQuery = batches.groupBy(_.query_name).toSeq.sortBy(_._1)
    val byTotals = totals.toSeq.sortBy(_._1)

    // counters: lifetime monotonic totals
    family(sb, "graft_stream_input_rows_total",
      "Total input rows over the query lifetime", "counter",
      byTotals.map { case (q, t) => (Seq("query" -> q), num(t.input_rows)) })
    family(sb, "graft_stream_batches_total",
      "Micro-batches over the query lifetime", "counter",
      byTotals.map { case (q, t) => (Seq("query" -> q), num(t.batches)) })

    // gauges: most-recent batch per query
    def latest[A](f: Observability.BatchMetric => A) =
      byQuery.map { case (q, ms) => (q, f(ms.maxBy(_.batch_id))) }
    family(sb, "graft_stream_input_rows_per_second",
      "Input rate of the latest micro-batch", "gauge",
      latest(_.input_rows_per_sec).map { case (q, v) => (Seq("query" -> q), num(v)) })
    family(sb, "graft_stream_processed_rows_per_second",
      "Processing rate of the latest micro-batch", "gauge",
      latest(_.processed_rows_per_sec).map { case (q, v) => (Seq("query" -> q), num(v)) })
    family(sb, "graft_stream_state_rows",
      "State-store rows after the latest micro-batch", "gauge",
      latest(_.state_rows).map { case (q, v) => (Seq("query" -> q), num(v)) })
    family(sb, "graft_stream_state_memory_bytes",
      "State-store memory after the latest micro-batch", "gauge",
      latest(_.state_memory_bytes).map { case (q, v) => (Seq("query" -> q), num(v)) })

    // batch duration as a summary (quantile-labeled, like the reference's
    // latency Histogram): quantiles over the retained window, _sum/_count
    // from the lifetime totals (the client-library summary contract)
    val durSamples = byQuery.flatMap { case (q, ms) =>
      val ds = ms.map(_.batch_duration_ms.toDouble).sorted
      val t = totals.getOrElse(q, Observability.QueryTotals(0L, 0L, 0L))
      Seq("0.5", "0.95", "0.99").map(p =>
        (Seq("query" -> q, "quantile" -> p), num(quantile(ds, p.toDouble)))) :+
        (Seq("query" -> q, "__suffix" -> "_sum"), num(t.duration_ms_sum.toDouble)) :+
        (Seq("query" -> q, "__suffix" -> "_count"), num(t.batches))
    }
    family(sb, "graft_stream_batch_duration_ms",
      "Micro-batch duration summary", "summary", durSamples)

    // per-operator gauges: the component-level System Health row
    val byOp = operators.groupBy(o => (o.query_name, o.operator_name))
      .toSeq.sortBy(_._1)
    def latestOp[A](f: Observability.OperatorMetric => A) =
      byOp.map { case ((q, op), ms) => (q, op, f(ms.maxBy(_.batch_id))) }
    family(sb, "graft_stream_operator_state_rows",
      "Stateful-operator rows after its latest micro-batch", "gauge",
      latestOp(_.num_rows_total).map { case (q, op, v) =>
        (Seq("query" -> q, "operator" -> op), num(v)) })
    family(sb, "graft_stream_operator_memory_bytes",
      "Stateful-operator memory after its latest micro-batch", "gauge",
      latestOp(_.memory_used_bytes).map { case (q, op, v) =>
        (Seq("query" -> q, "operator" -> op), num(v)) })
    family(sb, "graft_stream_operator_commit_ms",
      "State commit time of the operator's latest micro-batch", "gauge",
      latestOp(_.commit_time_ms).map { case (q, op, v) =>
        (Seq("query" -> q, "operator" -> op), num(v)) })

    sb.toString
  }

  // ---- exposition-format mechanics ----------------------------------------

  /** Emit one metric family: HELP + TYPE once, then its samples. The
    * pseudo-label `__suffix` appends to the metric name instead of
    * rendering as a label (summary `_sum`/`_count` lines). Families with
    * no samples are omitted entirely (a HELP header with no samples is
    * legal but noise). */
  private def family(sb: StringBuilder, name: String, help: String,
                     kind: String,
                     samples: Seq[(Seq[(String, String)], String)]): Unit = {
    if (samples.isEmpty) return
    sb.append("# HELP ").append(name).append(' ').append(escapeHelp(help)).append('\n')
    sb.append("# TYPE ").append(name).append(' ').append(kind).append('\n')
    samples.foreach { case (labels, value) =>
      val suffix = labels.collectFirst { case ("__suffix", s) => s }.getOrElse("")
      val real = labels.filter(_._1 != "__suffix")
      sb.append(name).append(suffix)
      if (real.nonEmpty)
        sb.append(real.map { case (k, v) => s"""$k="${escapeLabel(v)}"""" }
          .mkString("{", ",", "}"))
      sb.append(' ').append(value).append('\n')
    }
  }

  /** Label-value escaping per the exposition spec: backslash, double
    * quote, and newline. */
  private def escapeLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** HELP text escaping: backslash and newline (quotes are legal there). */
  private def escapeHelp(v: String): String =
    v.replace("\\", "\\\\").replace("\n", "\\n")

  private def num(v: Long): String = v.toString
  private def num(v: Double): String = fmt(v)

  /** Locale-stable number rendering (the Bench locale lesson): integral
    * doubles render without an exponent, others with enough digits. */
  private def fmt(v: Double): String =
    if (v == Math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
      String.format(Locale.ROOT, "%.1f", Double.box(v))
    else String.format(Locale.ROOT, "%.6g", Double.box(v))

  /** Nearest-rank quantile over a pre-sorted window (driver-side, bounded
    * by the listener ring). */
  private def quantile(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1,
      math.max(0, math.ceil(p * sorted.size).toInt - 1)))
}
