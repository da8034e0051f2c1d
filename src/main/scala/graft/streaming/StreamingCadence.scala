package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One customer's live cadence row; `n_orders` is monotone per key, so a
  * consumer keeps each customer's row at max `n_orders`. Values are the
  * batch q291 expressions exactly (same IEEE op sequence). */
case class CadenceStats(o_custkey: Long, n_orders: Long,
    mean_gap_days: Double, gap_cv: Option[Double])

/**
 * Continuous order-cadence regularity — the streaming twin of batch
 * [[graft.operators.Relational.q291GapRegularity]] (A155): per customer,
 * the live coefficient of variation over consecutive inter-order day
 * gaps, emitted from the third order on. Over any stream prefix the
 * emitted rows are bit-equal to batch q291 on the same orders: the three
 * gap sums (m, Σg, Σg²) are order-independent given the per-key
 * event-time contract, Σg² rides as BigInt (the batch side's
 * DECIMAL(38,0) — a running i64 would wrap where the batch errs exact),
 * and the final expression replays batch's exact IEEE op sequence.
 *
 * Ordering contract (the changefeed property, as StreamingSessionize):
 * per-customer order dates arrive non-decreasing across micro-batches
 * (within a batch rows sort by (day, orderkey); same-day ties are free —
 * the gap MULTISET is invariant to their order). A date regression
 * throws loudly: the true predecessor gap is unknowable.
 *
 * State per customer: three longs + one BigInt regardless of history;
 * idle keys are bounded via the `ttl` parameter in production (default
 * NONE — replays stay exact).
 */
object StreamingCadence {

  private type S = (Long, Long, Long, BigInt) // (lastDay, m, sg, sg2)

  private class Proc(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Long, Long), CadenceStats] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("cad", Encoders.kryo[S], ttl)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[CadenceStats] = {
      var (last, m, sg, sg2): S =
        if (st.exists()) st.get() else (Long.MinValue, -1L, 0L, BigInt(0))
      rows.toArray.sortBy(r => (r._3, r._2)).foreach { case (_, _, day) =>
        if (m >= 0L) { // not the first order ever
          if (day < last) throw new IllegalStateException(
            s"out-of-order order date for customer $key: $day after $last" +
              " — per-key date order is the processor's contract")
          val g = day - last
          m += 1L; sg += g; sg2 += BigInt(g) * BigInt(g)
        } else m = 0L
        last = day
      }
      st.update((last, m, sg, sg2))
      if (m >= 2L) {
        // batch q291's exact expressions: mean = Σg/m; cv =
        // sqrt((m·Σg² − Σg·Σg) as double) / Σg, NULL at zero mean gap
        val mean = sg.toDouble / m.toDouble
        val cv =
          if (sg > 0L)
            Some(math.sqrt((BigInt(m) * sg2 - BigInt(sg) * BigInt(sg))
              .toDouble) / sg.toDouble)
          else None
        Iterator(CadenceStats(key, m + 1L, mean, cv))
      } else Iterator.empty
    }
  }

  /** Track cadence over a `(custkey, orderkey, epochDay)` order stream;
    * run with `outputMode("update")` — keep each key's max-n row.
    * WITH a `ttl`, that consumer rule must switch to LATEST-WINS: a
    * returning customer restarts below its previous max (its stats then
    * cover only post-expiry history — the documented price of bounding
    * state), and a max-n consumer would pin the stale pre-expiry row. */
  def track(orders: Dataset[(Long, Long, Long)],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CadenceStats] = {
    import orders.sparkSession.implicits._
    // state TTL needs a clock: NONE keeps TimeMode.None (replay-exact)
    val tm = if (ttl == TTLConfig.NONE) TimeMode.None()
    else TimeMode.ProcessingTime()
    orders.groupByKey(_._1)
      .transformWithState(new Proc(ttl), tm, OutputMode.Update())
  }
}
