package graft.streaming

import java.util.Locale
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLongArray, DoubleAdder, LongAdder}

/** The serving-side metric families of the reference's prediction API
  * (ref ml/serving/api.py:37-40): `ml_predictions_total{outcome}` (counter),
  * `ml_prediction_latency_ms` (histogram with the reference's bucket
  * boundaries), and `ml_fraud_detected_total` (counter). Incremented by the
  * `/predict` routes and rendered into the same `/metrics` scrape as the
  * streaming families, so one Prometheus target covers both the pipeline
  * health row and the model-serving row of the Grafana dashboard.
  *
  * Concurrency: routes run on the HttpServer's dispatch threads, so every
  * cell is a striped adder (LongAdder/DoubleAdder) or CAS array — an
  * increment never takes a lock, and a concurrent scrape sees a consistent-
  * enough snapshot (per-cell atomicity, the same guarantee client
  * libraries give). Purely driver-side: no Spark job records or reads a
  * serving metric.
  */
final class ServingMetrics {

  /** Histogram boundaries, ms — verbatim from api.py:39. */
  val LatencyBucketsMs: Vector[Double] =
    Vector(1, 5, 10, 25, 50, 100, 250, 500, 1000)

  private val predictionsByOutcome = new ConcurrentHashMap[String, LongAdder]()
  private val latencyBuckets = new AtomicLongArray(LatencyBucketsMs.size + 1) // +Inf last
  private val latencySum = new DoubleAdder
  private val latencyCount = new LongAdder
  private val fraudDetected = new LongAdder

  /** `ml_predictions_total{outcome=...}` — outcomes in practice: "fraud",
    * "legit" (single predict) and "batch" (one inc per batch row, the
    * reference's `inc(len(predictions))`). */
  def incPredictions(outcome: String, n: Long = 1L): Unit =
    predictionsByOutcome.computeIfAbsent(outcome, _ => new LongAdder).add(n)

  /** `ml_prediction_latency_ms.observe(...)` — single-predict latency. */
  def observeLatencyMs(ms: Double): Unit = {
    val i = LatencyBucketsMs.indexWhere(ms <= _)
    latencyBuckets.incrementAndGet(if (i < 0) LatencyBucketsMs.size else i)
    latencySum.add(ms)
    latencyCount.increment()
  }

  /** `ml_fraud_detected_total.inc()` — single predict crossing threshold. */
  def incFraudDetected(): Unit = fraudDetected.increment()

  /** Exposition-format render, appended to the streaming scrape. Family
    * presence mirrors the Python client: unlabeled families (the latency
    * histogram, the fraud counter) exist from process start at zero;
    * labeled children of `ml_predictions_total` appear on first use. */
  def render: String = {
    val sb = new StringBuilder

    sb.append("# HELP ml_predictions_total Total predictions\n")
    sb.append("# TYPE ml_predictions_total counter\n")
    val outcomes = {
      import scala.jdk.CollectionConverters._
      predictionsByOutcome.asScala.toSeq.sortBy(_._1)
    }
    outcomes.foreach { case (o, v) =>
      sb.append(s"""ml_predictions_total{outcome="$o"} ${v.sum}""").append('\n')
    }

    sb.append("# HELP ml_prediction_latency_ms Prediction latency\n")
    sb.append("# TYPE ml_prediction_latency_ms histogram\n")
    var cum = 0L
    LatencyBucketsMs.zipWithIndex.foreach { case (le, i) =>
      cum += latencyBuckets.get(i)
      sb.append(s"""ml_prediction_latency_ms_bucket{le="${fmt(le)}"} $cum""").append('\n')
    }
    cum += latencyBuckets.get(LatencyBucketsMs.size)
    sb.append(s"""ml_prediction_latency_ms_bucket{le="+Inf"} $cum""").append('\n')
    sb.append(s"ml_prediction_latency_ms_sum ${fmt(latencySum.sum)}\n")
    sb.append(s"ml_prediction_latency_ms_count ${latencyCount.sum}\n")

    sb.append("# HELP ml_fraud_detected_total Total fraud predictions\n")
    sb.append("# TYPE ml_fraud_detected_total counter\n")
    sb.append(s"ml_fraud_detected_total ${fraudDetected.sum}\n")
    sb.toString
  }

  /** Locale-stable rendering; integral values without exponent. */
  private def fmt(v: Double): String =
    if (v == Math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
      String.format(Locale.ROOT, "%.1f", Double.box(v))
    else String.format(Locale.ROOT, "%.6g", Double.box(v))
}
