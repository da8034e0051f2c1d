package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One attributed purchase: `channel` is the touch event type or
  * `"direct"`; `cents` carries the purchase value exactly. */
case class AttributedPurchase(user_id: Long, event_id: Long, channel: String,
    cents: Long)

/**
 * Continuous last-touch attribution — the streaming twin of
 * [[graft.operators.Relational.q169Attribution]] (A85): every purchase is
 * credited AT ARRIVAL to the user's most recent in-window click/view, so
 * the channel report is live instead of end-of-day. The batch operator's
 * window pass becomes one tiny value state per user: the latest touch's
 * (timestamp, type) — two fields regardless of history length, the same
 * "remember only what the future needs" contract as the reference's
 * changefeed consumer state (FlinkTikvConsumer.java:222-242).
 *
 * In-order contract (shared with StreamingAnomaly): events are processed
 * in (us, event_id) order WITHIN each micro-batch, and a user's events
 * must not arrive out of order ACROSS batches — the feed's job, as with
 * any changelog. Under that contract the emitted attributions are
 * bit-identical to batch q169 over the same events (the spec asserts it:
 * same channels, same counts, same cents).
 *
 * Scale: state is |users|·~24 B, checkpointed/exactly-once under
 * `transformWithState`; processing is a per-row compare + one state
 * write per touch. Append mode — an attribution is final when it fires.
 */
object StreamingAttribution {

  /** Input event: `cents` is the PLAN-side decimal cast of value (exact,
    * the q129/StreamingAnomaly convention). */
  case class Ev(user_id: Long, event_id: Long, event_type: String, us: Long,
      cents: Long)

  private class AttrProcessor(windowUs: Long)
      extends StatefulProcessor[Long, Ev, AttributedPurchase] {
    @transient private var st: ValueState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, String)]("touch",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[AttributedPurchase] = {
      var touch: Option[(Long, String)] = if (st.exists()) Some(st.get()) else None
      val out = rows.toArray.sortBy(e => (e.us, e.event_id)).iterator.flatMap {
        e =>
          if (e.event_type == "purchase") {
            val channel = touch match {
              case Some((tus, ttyp)) if e.us - tus <= windowUs => ttyp
              case _ => "direct"
            }
            Iterator(AttributedPurchase(key, e.event_id, channel, e.cents))
          } else {
            if (e.event_type == "click" || e.event_type == "view")
              touch = Some((e.us, e.event_type))
            Iterator.empty
          }
      }.toVector
      touch.foreach(st.update)
      out.iterator
    }
  }

  /** Attribute purchases in `events` live; see object doc for the
    * contract. Run the result with `outputMode("append")`. */
  def attribute(events: Dataset[Ev],
      windowUs: Long = 7L * 86400000000L): Dataset[AttributedPurchase] = {
    require(windowUs > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AttrProcessor(windowUs), TimeMode.None(),
        OutputMode.Append())
  }
}
