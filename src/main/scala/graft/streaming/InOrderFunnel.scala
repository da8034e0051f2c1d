package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One user's live funnel position. `stage` is MONOTONE per user (each
  * first-touch field is set at most once and each set advances the
  * stage), so a consumer keeps each user's row at max `stage`. Unset
  * stages are None — batch q82's NULLs. */
case class FunnelPosition(user_id: Long, first_view_us: Option[Long],
    first_click_us: Option[Long], first_purchase_us: Option[Long],
    stage: Long)

/**
 * Continuous ordered-funnel tracking with O(1) per-user state — the
 * CHANGEFEED-CONTRACT variant of [[StreamingFunnel]] (B38), which
 * tolerates arbitrary out-of-order arrival by retaining bounded
 * candidate lists. When the feed IS per-key ordered (every graft
 * changefeed's contract), candidates are dead weight: each first-touch
 * decision is final on arrival and state collapses to four longs. Twin of
 * batch
 * [[graft.operators.Relational.q82Funnel]] (A36): per user, the first
 * `view`, the first `click` STRICTLY AFTER that view, and the first
 * `purchase` strictly after that click, maintained live so conversion
 * dashboards read current positions instead of end-of-day joins.
 * Emitted rows are bit-equal to batch q82 over any stream prefix.
 *
 * Why in-order arrival (the changefeed contract, loud on violation) is
 * REQUIRED here and not just convenient: batch q82's staged mins are
 * retrospective — an earlier-timestamped click arriving late could
 * lower `first_click` and retroactively invalidate a purchase already
 * counted against the old one. Under per-user event-time order each
 * first-touch decision is final the moment it's made, which is what
 * lets state be four longs instead of the event history. Within a
 * batch rows are folded in (us, type) order; EQUAL-timestamp ties
 * cannot flip any decision (stage boundaries are strict >, so a tie
 * never qualifies regardless of fold order).
 *
 * Emission: Update mode, a row per user per batch in which anything
 * changed (including the stage-0 row on first sight — batch q82 lists
 * every user with any event). State: four longs per user; idle keys
 * are bounded via the `ttl` parameter in production (default NONE —
 * replays stay exact).
 */
object InOrderFunnel {

  private val Unset = -1L
  private type S = (Long, Long, Long, Long) // (lastUs, fv, fc, fp)

  private class Proc(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Long, String), FunnelPosition] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("fun", Encoders.kryo[S], ttl)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, String)],
        timerValues: TimerValues): Iterator[FunnelPosition] = {
      val existed = st.exists()
      var (last, fv, fc, fp): S =
        if (existed) st.get() else (Long.MinValue, Unset, Unset, Unset)
      var changed = !existed
      rows.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, us, typ) =>
        if (last != Long.MinValue && us < last)
          throw new IllegalStateException(
            s"out-of-order event for user $key: $us after $last — " +
              "per-key event-time order is the processor's contract")
        last = us
        typ match {
          case "view" if fv == Unset =>
            fv = us; changed = true
          case "click" if fc == Unset && fv != Unset && us > fv =>
            fc = us; changed = true
          case "purchase" if fp == Unset && fc != Unset && us > fc =>
            fp = us; changed = true
          case _ => ()
        }
      }
      st.update((last, fv, fc, fp))
      if (changed) {
        val stage =
          if (fp != Unset) 3L else if (fc != Unset) 2L
          else if (fv != Unset) 1L else 0L
        Iterator(FunnelPosition(key,
          Option(fv).filter(_ != Unset), Option(fc).filter(_ != Unset),
          Option(fp).filter(_ != Unset), stage))
      } else Iterator.empty
    }
  }

  /** Track funnel positions over a `(user_id, us, event_type)` stream;
    * run with `outputMode("update")` — keep each user's max-stage row.
    * WITH a `ttl`, switch the consumer rule to LATEST-WINS: an expired
    * user restarts at stage 0/1 (post-expiry history only — the price of
    * bounding state) and a max-stage consumer would pin the stale row. */
  def track(events: Dataset[(Long, Long, String)],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[FunnelPosition] = {
    import events.sparkSession.implicits._
    // state TTL needs a clock: NONE keeps TimeMode.None (replay-exact)
    val tm = if (ttl == TTLConfig.NONE) TimeMode.None()
    else TimeMode.ProcessingTime()
    events.groupByKey(_._1)
      .transformWithState(new Proc(ttl), tm, OutputMode.Update())
  }
}
