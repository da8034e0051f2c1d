package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One maintained suspect group; `n_orders` is monotone per key, so a
  * consumer keeps each (cust, date)'s row at max `n_orders`. */
case class DupOrderGroup(o_custkey: Long, date_us: Long, n_orders: Long,
    min_cents: Long, max_cents: Long)

/**
 * Continuous duplicate-order screen — the streaming twin of batch
 * [[graft.operators.Relational.q252DupOrders]] (A125): per (customer,
 * order-date), the live order count and integer-cent amount range,
 * emitted the moment a key becomes suspect (second order of the day
 * lands). Count, min, and max are ORDER-INDEPENDENT, so the maintained
 * groups are bit-equal to the batch query over any prefix of the stream
 * however micro-batches slice or reorder it (the q132/StreamingSample
 * discipline). Amounts ride as exact integer cents — never fp in state.
 *
 * Emission contract: a key emits only while `n_orders >= 2` (the batch
 * query's HAVING), and `n_orders` is monotone per key — current state =
 * keep each key's row at max count. State is three longs per active
 * (customer, day); production deployments bound growth with a TTL once
 * the day is out of the fraud-review window (knob here, default NONE so
 * replays of old feeds stay exact).
 */
object StreamingDupOrders {

  private type S = (Long, Long, Long) // (n, minCents, maxCents)

  private class DupProcessor
      extends StatefulProcessor[(Long, Long), (Long, Long, Long), DupOrderGroup] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("grp", Encoders.kryo[S], TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long),
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[DupOrderGroup] = {
      var s: S = if (st.exists()) st.get() else (0L, Long.MaxValue, Long.MinValue)
      rows.foreach { case (_, _, cents) =>
        s = (s._1 + 1L, math.min(s._2, cents), math.max(s._3, cents))
      }
      st.update(s)
      if (s._1 >= 2L)
        Iterator(DupOrderGroup(key._1, key._2, s._1, s._2, s._3))
      else Iterator.empty
    }
  }

  /** Maintain suspect groups over a `(custkey, dateUs, cents)` order
    * stream; run with `outputMode("update")`. */
  def track(orders: Dataset[(Long, Long, Long)]): Dataset[DupOrderGroup] = {
    import orders.sparkSession.implicits._
    orders.groupByKey { case (cust, dateUs, _) => (cust, dateUs) }
      .transformWithState(new DupProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
