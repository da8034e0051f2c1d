package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One flagged (order, part) group; `n_supp` is monotone per key, so a
  * consumer keeps each group's row at max `n_supp`. */
case class SplitSourcingFlag(l_orderkey: Long, l_partkey: Long,
    n_supp: Long)

/**
 * Continuous split-sourcing detector — the streaming twin of the
 * GROUP-DETECTION core of batch
 * [[graft.operators.Relational.q286SplitSourcing]] (A151): an (order,
 * part) group is flagged the moment a SECOND distinct supplier ships
 * against it (double allocation / split shipment), live on the lineitem
 * feed instead of in the nightly rollup. The stateful part is the
 * distinct-supplier count, and that is what this processor maintains.
 * A consumer rolling the flags per brand recovers batch q286's split
 * NUMERATORS (`split_groups`) exactly; the share DENOMINATOR
 * (`order_part_groups`, which counts sub-threshold groups too) is NOT
 * derivable from this stream — by design, since emitting a first-sight
 * row per group would turn the overwhelmingly-common single-supplier
 * case into state-store and sink traffic. Take denominators from the
 * batch rollup (or a plain streaming count over the same feed).
 *
 * The distinct count is ORDER-INDEPENDENT (a set cares nothing for
 * arrival order), so unlike the event-time twins no ordering contract
 * is needed: maintained flags are bit-equal to the batch distinct
 * counts over any prefix under ANY slicing or reordering (the
 * StreamingDupOrders discipline, with set semantics). State per active
 * group is the distinct supplier-key set — bounded by the handful of
 * suppliers an order line can realistically split across; closed-order
 * state is bounded via the `ttl` parameter in production (default NONE
 * so replays stay exact).
 *
 * Emission: Update mode, a row whenever the group's distinct count
 * GROWS past 1 — sub-threshold groups (the overwhelming majority) never
 * emit and never leave the state store.
 */
object StreamingSplitSourcing {

  private type S = Array[Long] // distinct suppkeys seen (tiny)

  private class Proc(ttl: TTLConfig)
      extends StatefulProcessor[(Long, Long), (Long, Long, Long), SplitSourcingFlag] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("sup", Encoders.kryo[S], ttl)

    override def handleInputRows(key: (Long, Long),
        rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[SplitSourcingFlag] = {
      val seen = scala.collection.mutable.SortedSet.empty[Long] ++
        (if (st.exists()) st.get() else Array.empty[Long])
      val before = seen.size
      rows.foreach { case (_, _, supp) => seen += supp }
      st.update(seen.toArray)
      if (seen.size > before && seen.size >= 2)
        Iterator(SplitSourcingFlag(key._1, key._2, seen.size.toLong))
      else Iterator.empty
    }
  }

  /** Flag split-sourced groups over a `(orderkey, partkey, suppkey)`
    * line stream; run with `outputMode("update")` — keep each group's
    * max-count row. WITH a `ttl`, switch the consumer rule to
    * LATEST-WINS: an expired group re-flags from a fresh supplier set
    * (post-expiry counts only — the price of bounding state) and a
    * max-count consumer would pin the stale row. */
  def track(lines: Dataset[(Long, Long, Long)],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SplitSourcingFlag] = {
    import lines.sparkSession.implicits._
    // state TTL needs a clock: NONE keeps TimeMode.None (replay-exact)
    val tm = if (ttl == TTLConfig.NONE) TimeMode.None()
    else TimeMode.ProcessingTime()
    lines.groupByKey(r => (r._1, r._2))
      .transformWithState(new Proc(ttl), tm, OutputMode.Update())
  }
}
