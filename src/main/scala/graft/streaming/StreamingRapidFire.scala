package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One maintained per-user screen row; `n_events` is monotone per key, so
  * a consumer keeps each user's row at max `n_events`. `min_gap_us` is
  * None until the user has a second event (batch q257 emits NULL there). */
case class RapidFireStats(user_id: Long, n_events: Long,
    min_gap_us: Option[Long], n_zero_gaps: Long, max_in_60s: Long)

/**
 * Continuous rapid-fire/bot screen — the streaming twin of batch
 * [[graft.operators.Relational.q257RapidFire]] (A128): per user, the live
 * event count, minimum inter-event gap, duplicate-timestamp count, and the
 * maximum number of events in any 60-second window `[t, t+60s)` anchored
 * at an event. The forward-looking window is the interesting part: an
 * event's window stays OPEN until an arrival 60 s past it, so the
 * processor keeps the open 60-second neighborhood as state, folds each
 * window's exact count into a running maximum the moment it closes, and
 * scores still-open windows against the neighborhood at emission time —
 * over any stream prefix the emitted row is bit-equal to batch q257 on
 * the same events.
 *
 * Ordering contract (the changefeed property, as StreamingScd2): each
 * user's events arrive in non-decreasing event-time order ACROSS
 * micro-batches — one producer per key emits in order; cross-key
 * interleaving and within-batch order are arbitrary (rows are sorted
 * per key per batch before folding). A violation throws loudly rather
 * than silently corrupting gap stats: a late event's true predecessor
 * gap is unknowable without unbounded history.
 *
 * State per active user: four longs + the timestamps of the open
 * 60-second neighborhood — bounded by the user's peak 60 s event rate
 * (the very thing the screen flags; a TTL on the state store bounds idle
 * keys in production). Per-event work is O(open-window) — the quadratic
 * is confined to a single hot key's 60-second neighborhood.
 */
object StreamingRapidFire {

  /** `[t, t + SPAN]` inclusive ≡ `[t, t+60s)` on integral micros — the
    * exact batch `rangeBetween(0, 59999999)` frame. */
  private val SPAN = 59999999L

  // (n, minGap, nZero, lastUs, closedMax, openWindow) — tuple because the
  // kryo encoder only takes public classes
  private type S = (Long, Long, Long, Long, Long, Array[Long])

  /** First index in `buf` with value >= x (buf sorted ascending). */
  private def lowerBound(buf: ArrayBuffer[Long], x: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** First index in `buf` with value > x (buf sorted ascending). */
  private def upperBound(buf: ArrayBuffer[Long], x: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  private class Proc
      extends StatefulProcessor[Long, (Long, Long), RapidFireStats] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("rf", Encoders.kryo[S], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[RapidFireStats] = {
      val s: S =
        if (st.exists()) st.get()
        else (0L, Long.MaxValue, 0L, Long.MinValue, 0L, Array.empty[Long])
      var n = s._1; var minGap = s._2; var nZero = s._3
      var last = s._4; var closedMax = s._5
      val buf = ArrayBuffer.empty[Long] ++ s._6

      rows.map(_._2).toArray.sorted.foreach { us =>
        if (n > 0L) {
          if (us < last) throw new IllegalStateException(
            s"out-of-order event for user $key: $us after $last — " +
              "per-key event-time order is the processor's contract")
          val g = us - last
          if (g == 0L) nZero += 1L
          if (g < minGap) minGap = g
        }
        last = us
        // close every window whose span ended before this arrival; count
        // against the FULL neighborhood first, remove together (an equal
        // head's duplicate must count its sibling)
        var evict = 0
        while (evict < buf.length && buf(evict) + SPAN < us) evict += 1
        if (evict > 0) {
          var i = 0
          while (i < evict) {
            val h = buf(i)
            val cnt = (upperBound(buf, h + SPAN) - lowerBound(buf, h)).toLong
            if (cnt > closedMax) closedMax = cnt
            i += 1
          }
          buf.remove(0, evict)
        }
        buf += us
        n += 1L
      }

      var openMax = 0L
      var i = 0
      while (i < buf.length) {
        val h = buf(i)
        val cnt = (upperBound(buf, h + SPAN) - lowerBound(buf, h)).toLong
        if (cnt > openMax) openMax = cnt
        i += 1
      }

      st.update((n, minGap, nZero, last, closedMax, buf.toArray))
      Iterator(RapidFireStats(key, n,
        if (minGap != Long.MaxValue) Some(minGap) else None, nZero,
        math.max(closedMax, openMax)))
    }
  }

  /** Maintain per-user screen rows over a `(user_id, us)` event stream;
    * run with `outputMode("update")`. */
  def track(events: Dataset[(Long, Long)]): Dataset[RapidFireStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Update())
  }
}
