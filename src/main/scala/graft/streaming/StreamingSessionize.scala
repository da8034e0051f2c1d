package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One sessionized event — the per-event assignment is FINAL at emission
  * (Append mode): a later event can only start a later session, never
  * rewrite an earlier event's `session_seq`. */
case class SessionizedEvent(event_id: Long, user_id: Long, us: Long,
    session_seq: Long)

/**
 * Continuous gap-based sessionization — the streaming twin of batch
 * [[graft.operators.Relational.q89Sessionize]] (A39): every arriving
 * event is stamped with its user's 1-based session counter, a new
 * session opening when the inter-event gap exceeds `gapUs`. Emitted
 * rows are bit-equal to batch q89 over any prefix of the stream,
 * however micro-batches slice it, because the assignment depends only
 * on (previous event time, running counter) — exactly the two words of
 * state kept.
 *
 * Ordering contract (the changefeed property, as StreamingRapidFire):
 * each user's events arrive in non-decreasing event-time order ACROSS
 * micro-batches; within a batch rows are sorted by (us, event_id)
 * before folding. EQUAL timestamps need no cross-batch tiebreak: a
 * zero gap can never open a session, so any arrival order of ties
 * yields the batch assignment. A regression in event time throws
 * loudly — the event's true predecessor gap (and thus every later
 * session number) is unknowable without unbounded history.
 *
 * State per user: TWO longs (last event time, session counter)
 * regardless of history length — checkpointed, exactly-once;
 * idle-user growth is bounded via the `ttl` parameter in production
 * (default NONE so replays of old feeds stay exact — an expired user
 * restarts at session 1).
 */
object StreamingSessionize {

  /** Batch q89's default 30-minute gap, in micros. */
  val DefaultGapUs: Long = 30L * 60L * 1000000L

  private type S = (Long, Long) // (lastUs, seq)

  private class Proc(gapUs: Long, ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Long, Long), SessionizedEvent] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("sess", Encoders.kryo[S], ttl)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[SessionizedEvent] = {
      var (last, seq): S =
        if (st.exists()) st.get() else (Long.MinValue, 0L)
      val out = Vector.newBuilder[SessionizedEvent]
      // batch q89 orders by (us, event_id) within the user — replay that
      // order inside the batch; across batches it is the feed's contract
      rows.toArray.sortBy(r => (r._3, r._1)).foreach { case (eid, _, us) =>
        if (seq > 0L && us < last) throw new IllegalStateException(
          s"out-of-order event for user $key: $us after $last — " +
            "per-key event-time order is the processor's contract")
        if (seq == 0L || us - last > gapUs) seq += 1L
        last = us
        out += SessionizedEvent(eid, key, us, seq)
      }
      st.update((last, seq))
      out.result().iterator
    }
  }

  /** Stamp a `(event_id, user_id, us)` stream with session numbers; run
    * with `outputMode("append")` — assignments are final. */
  def assign(events: Dataset[(Long, Long, Long)],
      gapUs: Long = DefaultGapUs,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SessionizedEvent] = {
    import events.sparkSession.implicits._
    // state TTL needs a clock: NONE keeps TimeMode.None (replay-exact),
    // a real TTL rides processing time — Spark rejects TTL without it
    val tm = if (ttl == TTLConfig.NONE) TimeMode.None()
    else TimeMode.ProcessingTime()
    events.groupByKey(_._2)
      .transformWithState(new Proc(gapUs, ttl), tm, OutputMode.Append())
  }
}
