package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user EWMA baseline + spike flagging through the transformWithState
  * arbitrary-state API (Spark 4 StatefulProcessor, explicit ValueState on
  * the RocksDB state store) — the streaming form of the reference's
  * per-user running fraud baseline (velocity/amount history feeding the
  * real-time detector).
  * Ref: /root/reference/spark_jobs/silver/build_fraud_features.py
  * (per-user aggregates), /root/reference/ml/models/fraud_detector.py
  * (amount-vs-history signal).
  *
  * Semantics: per user, in (ts_us, event_id) order,
  *   ewma_0 = x_0;  ewma_t = α·x_t + (1−α)·ewma_{t−1}
  * An event is a spike when its value exceeds SpikeFactor × the
  * pre-event EWMA after a WarmupN-event warm-up. Purchase events only.
  *
  * Why transformWithState (vs flatMapGroupsWithState, already used for
  * sessionization): typed named state cells with per-cell TTL, timers,
  * and evolution-friendly state schema — this is the API the
  * dashboards-at-100TB state path should target going forward. State here
  * is ONE small fixed-size record per user — O(users), the same bound as
  * any per-key aggregation.
  *
  * Batch/stream parity: `driftBatch` runs the identical fold over each
  * user's history (same arithmetic, same order) — StreamingSpec asserts
  * bit-equality; `q_ewma_drift` registers the batch form (rows-only gate:
  * the EWMA recursion has no closed SQL form that is numerically stable).
  */
object StatefulDrift {

  val Alpha = 0.2
  val SpikeFactor = 3.0
  val WarmupN = 5L

  case class DriftState(ewma: Double, n: Long, lastTs: Long)
  case class DriftOut(user_id: Long, event_id: Long, ts_us: Long, value: Double,
                      ewma_before: Double, ewma_after: Double, n_before: Long,
                      is_spike: Boolean)

  /** The per-event fold shared verbatim by the processor and the batch
    * mirror — parity is structural, not coincidental. */
  private[streaming] def fold(key: Long, sorted: Seq[StreamOps.Ev],
                              init: DriftState): (Vector[DriftOut], DriftState) = {
    var st = init
    val out = Vector.newBuilder[DriftOut]
    for (e <- sorted) {
      val first = st.n == 0L
      val before = if (first) e.value else st.ewma
      val spike = !first && st.n >= WarmupN && e.value > SpikeFactor * st.ewma
      val after = if (first) e.value else Alpha * e.value + (1 - Alpha) * st.ewma
      out += DriftOut(key, e.event_id, e.ts_us, e.value, before, after, st.n, spike)
      st = DriftState(after, st.n + 1, e.ts_us)
    }
    (out.result(), st)
  }

  class Processor extends StatefulProcessor[Long, StreamOps.Ev, DriftOut] {
    @transient private var state: ValueState[DriftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DriftState](
        "ewma", Encoders.product[DriftState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[StreamOps.Ev],
                                 timerValues: TimerValues): Iterator[DriftOut] = {
      // micro-batch iterators are unordered; sort the batch's slice
      val sorted = rows.toVector.sortBy(e => (e.ts_us, e.event_id))
      val init = if (state.exists()) state.get() else DriftState(0.0, 0L, Long.MinValue)
      val (out, st) = fold(key, sorted, init)
      state.update(st)
      out.iterator
    }
  }

  /** Streaming wiring: requires the RocksDB state store provider
    * (transformWithState's backing store). */
  def driftStream(events: Dataset[StreamOps.Ev]): Dataset[DriftOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[DriftOut]])
  }

  /** Batch mirror: the same fold over each user's complete sorted history.
    * Per-user rows sort in memory — bounded by events/user, the same
    * contract as the sessionizer. */
  def driftBatch(events: Dataset[StreamOps.Ev]): Dataset[DriftOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroups { (key: Long, it: Iterator[StreamOps.Ev]) =>
        val sorted = it.toVector.sortBy(e => (e.ts_us, e.event_id))
        fold(key, sorted, DriftState(0.0, 0L, Long.MinValue))._1.iterator
      }
  }
}
