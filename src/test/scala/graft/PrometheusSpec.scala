package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Observability.{BatchMetric, OperatorMetric, QueryTotals}
import graft.streaming.PrometheusExposition

/** The exposition formatter is pure driver-side string building, so it
  * tests without a SparkSession: feed synthetic snapshots, assert the
  * 0.0.4 text format line by line. */
class PrometheusSpec extends AnyFunSuite {

  private def bm(q: String, batch: Long, rows: Long, durMs: Long,
                 stateRows: Long = 0L): BatchMetric =
    BatchMetric(q, s"id-$q", batch, s"2026-01-01T00:00:0$batch.000Z", rows,
      rows / 2.0, rows / 3.0, durMs, "", stateRows, stateRows * 100L)

  private val batches = Seq(
    bm("orders", 0, 10, 100, stateRows = 5),
    bm("orders", 1, 20, 300, stateRows = 7),
    bm("orders", 2, 30, 200, stateRows = 6),
    bm("sess", 0, 4, 50))

  /** Lifetime totals as the listener would have accumulated them. */
  private def totalsOf(ms: Seq[BatchMetric]): Map[String, QueryTotals] =
    ms.groupBy(_.query_name).map { case (q, b) =>
      q -> QueryTotals(b.map(_.num_input_rows).sum, b.size.toLong,
        b.map(_.batch_duration_ms).sum)
    }

  private val totals = totalsOf(batches)

  private val operators = Seq(
    OperatorMetric("sess", 0, "sessionWindow", 12, 4, 1, 2048, 9, 3, 32),
    OperatorMetric("sess", 1, "sessionWindow", 15, 3, 0, 4096, 7, 2, 32))

  test("families carry HELP/TYPE once, samples parse, counters report lifetime totals") {
    val text = PrometheusExposition.render(batches, operators, totals)
    val lines = text.split("\n").toSeq
    // every non-comment line matches the exposition sample grammar
    val sample =
      """^[a-zA-Z_:][a-zA-Z0-9_:]*(\{[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*"(,[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*")*\})? -?[0-9.eE+-]+$""".r
    lines.filterNot(_.startsWith("#")).foreach { l =>
      assert(sample.findFirstIn(l).isDefined, s"unparseable sample line: $l")
    }
    // one HELP and one TYPE per family, HELP before TYPE before samples
    val helps = lines.filter(_.startsWith("# HELP ")).map(_.split(" ")(2))
    assert(helps.distinct == helps)
    val types = lines.filter(_.startsWith("# TYPE ")).map(_.split(" ")(2))
    assert(types.toSet == helps.toSet)
    // counters carry the lifetime totals
    assert(lines.contains("""graft_stream_input_rows_total{query="orders"} 60"""))
    assert(lines.contains("""graft_stream_batches_total{query="orders"} 3"""))
    assert(lines.contains("""graft_stream_input_rows_total{query="sess"} 4"""))
  }

  test("counters stay monotonic across ring eviction: totals, not window sums") {
    // the ring evicted the two oldest orders batches; lifetime totals
    // are unchanged, so the scrape MUST NOT report a smaller counter
    val evicted = batches.filter(b => b.query_name != "orders" || b.batch_id == 2)
    val text = PrometheusExposition.render(evicted, Nil, totals)
    val lines = text.split("\n").toSeq
    assert(lines.contains("""graft_stream_input_rows_total{query="orders"} 60"""))
    assert(lines.contains("""graft_stream_batches_total{query="orders"} 3"""))
    // summary _sum/_count are cumulative too; quantiles are window-scoped
    assert(lines.contains("""graft_stream_batch_duration_ms_sum{query="orders"} 600.0"""))
    assert(lines.contains("""graft_stream_batch_duration_ms_count{query="orders"} 3"""))
    assert(lines.contains(
      """graft_stream_batch_duration_ms{query="orders",quantile="0.5"} 200.0"""))
  }

  test("gauges report the LATEST batch per query (by batch_id, not arrival order)") {
    val text = PrometheusExposition.render(batches.reverse, operators, totals)
    val lines = text.split("\n").toSeq
    // orders' latest batch is id=2: 6 state rows, 600 bytes
    assert(lines.contains("""graft_stream_state_rows{query="orders"} 6"""))
    assert(lines.contains("""graft_stream_state_memory_bytes{query="orders"} 600"""))
    // operator gauges pick batch_id=1
    assert(lines.contains(
      """graft_stream_operator_state_rows{query="sess",operator="sessionWindow"} 15"""))
    assert(lines.contains(
      """graft_stream_operator_memory_bytes{query="sess",operator="sessionWindow"} 4096"""))
  }

  test("batch duration renders as a summary with quantile labels and _sum/_count") {
    val text = PrometheusExposition.render(batches, Nil, totals)
    val lines = text.split("\n").toSeq
    assert(lines.contains("# TYPE graft_stream_batch_duration_ms summary"))
    // nearest-rank over sorted [100,200,300]: p50=200, p95=p99=300
    assert(lines.contains(
      """graft_stream_batch_duration_ms{query="orders",quantile="0.5"} 200.0"""))
    assert(lines.contains(
      """graft_stream_batch_duration_ms{query="orders",quantile="0.95"} 300.0"""))
    assert(lines.contains("""graft_stream_batch_duration_ms_sum{query="orders"} 600.0"""))
    assert(lines.contains("""graft_stream_batch_duration_ms_count{query="orders"} 3"""))
  }

  test("label values escape backslash, quote and newline; empty snapshot renders empty") {
    val weird = Seq(bm("q\"uo\\te\nnl", 0, 1, 10))
    val text = PrometheusExposition.render(weird, Nil, totalsOf(weird))
    assert(text.contains("""query="q\"uo\\te\nnl""""))
    assert(!text.contains("\nnl\"")) // the raw newline never reaches output
    assert(PrometheusExposition.render(Nil, Nil, Map.empty) == "")
  }
}
