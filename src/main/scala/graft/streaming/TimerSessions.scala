package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timeout sessionization with EVENT-TIME TIMERS — the production way to
  * close idle sessions. The flatMapGroupsWithState sessionizer
  * (StreamOps.sessionize) only closes a session when a LATER event for
  * the SAME key arrives (tests must flush every key); here each open
  * session registers a timer at lastTs + gap, and when the GLOBAL
  * watermark passes it the session emits — one watermark advance, from
  * any key's data, closes every idle session in the store. That is the
  * semantics a fraud dashboard needs: "session ended" fires because time
  * passed, not because the user came back.
  *
  * State: one small SessState + at most one live timer per open session
  * (timers re-register as the session extends) — O(open sessions), the
  * same bound as the session_window operator's state store.
  *
  * Parity contract (StreamingSpec): once the watermark passes every
  * event, emitted sessions equal operators.Sessionize batch output.
  */
object TimerSessions {

  import StreamOps.{Ev, SessionOut}

  class Processor(gapUs: Long)
    extends StatefulProcessor[Long, Ev, SessionOut] {

    @transient private var state: ValueState[StreamOps.SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[StreamOps.SessState](
        "open_session", Encoders.product[StreamOps.SessState], TTLConfig.NONE)

    // ceiling to the ms grid: a floor here could fire the timer up to
    // ~2 ms BEFORE lastTs+gap, closing a session while a within-gap event
    // is still admissible (breaking batch/stream parity for sub-ms data)
    private def timerMsOf(lastTsUs: Long): Long = (lastTsUs + gapUs + 999L) / 1000L

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toVector.sortBy(e => (e.ts_us, e.event_id))
      val out = Vector.newBuilder[SessionOut]
      var st = if (state.exists()) Option(state.get()) else None
      val prevTimer = st.map(s => timerMsOf(s.lastTs))
      for (e <- sorted) {
        val p = if (e.event_type == "purchase") 1L else 0L
        val er = if (e.event_type == "error") 1L else 0L
        st match {
          case Some(open) if e.ts_us - open.lastTs <= gapUs =>
            st = Some(open.copy(lastTs = e.ts_us, count = open.count + 1,
              purchases = open.purchases + p, errors = open.errors + er))
          case Some(open) =>
            // gap exceeded by in-stream data: close immediately
            out += SessionOut(key, open.openIdx, open.count, open.startTs,
              open.lastTs, open.purchases, open.errors)
            st = Some(StreamOps.SessState(open.openIdx + 1, e.ts_us, e.ts_us, 1L, p, er))
          case None =>
            st = Some(StreamOps.SessState(1L, e.ts_us, e.ts_us, 1L, p, er))
        }
      }
      st.foreach { s =>
        state.update(s)
        // slide the timeout forward: drop the stale timer, arm the new one
        val next = timerMsOf(s.lastTs)
        if (!prevTimer.contains(next)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(next)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      // watermark passed lastTs + gap: the open session timed out
      val out =
        if (state.exists()) {
          val open = state.get()
          if (timerMsOf(open.lastTs) == expired.getExpiryTimeInMs) {
            state.clear()
            Iterator.single(SessionOut(key, open.openIdx, open.count,
              open.startTs, open.lastTs, open.purchases, open.errors))
          } else Iterator.empty // stale timer for an already-extended session
        } else Iterator.empty
      out
    }
  }

  /** Streaming wiring: `events` must carry a `ts` timestamp column (the
    * watermark axis) alongside the Ev fields; `gapUs` (µs) and
    * `lateness` (duration string) are the caller's consistent pair. */
  def sessionize(events: DataFrame, gapUs: Long,
                 lateness: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .as[EvWithTs]
      .map(e => Ev(e.user_id, e.event_id, e.ts_us, e.event_type, e.value))
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapUs), TimeMode.EventTime(),
        OutputMode.Append(), implicitly[org.apache.spark.sql.Encoder[SessionOut]])
  }

  case class EvWithTs(user_id: Long, event_id: Long, ts_us: Long,
                      event_type: String, value: Double, ts: java.sql.Timestamp)
}
