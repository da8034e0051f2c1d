package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One maintained bar; `n` is the bar's monotone event count, so a
  * consumer keeps each (user, bucket)'s row at max `n` for current state. */
case class OhlcBar(user_id: Long, bucket: Long, open: Double, high: Double,
    low: Double, close: Double, n: Long, vsum: Double)

/**
 * Continuous OHLC bars — the streaming twin of batch
 * [[graft.operators.Relational.q137OhlcBars]] (A66): per (user, 5-minute
 * bucket), open/high/low/close/count/sum maintained live. Because the
 * state carries the open's and close's (us, event_id) ORDER KEY rather
 * than relying on arrival order, every update is ORDER-INDEPENDENT — the
 * maintained bars are bit-equal to the batch query over any prefix of the
 * stream, however micro-batches slice or reorder it (the q132/StreamingSample
 * discipline, here for a composite aggregate).
 *
 * Money rides as exact integer CENTS in state (a running double sum would
 * be arrival-order fp); emitted doubles divide once by 100, landing on
 * the same IEEE values as the batch DECIMAL(14,2)→DOUBLE casts. State is
 * O(1) per open bar; production deployments bound bucket-key growth with
 * a TTL on closed bars (the knob is here, default NONE so replays of old
 * data stay exact).
 */
object StreamingOhlc {

  private type S = (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)
  // (openUs, openId, openCents, hiCents, loCents,
  //  closeUs, closeId, closeCents, n, sumCents)

  private class OhlcProcessor
      extends StatefulProcessor[(Long, Long), (Long, Long, Long, Long), OhlcBar] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[S]("bar", Encoders.kryo[S], TTLConfig.NONE)

    override def handleInputRows(key: (Long, Long),
        rows: Iterator[(Long, Long, Long, Long)],
        timerValues: TimerValues): Iterator[OhlcBar] = {
      var s: S = if (st.exists()) st.get()
        else (Long.MaxValue, Long.MaxValue, 0L, Long.MinValue, Long.MaxValue,
          Long.MinValue, Long.MinValue, 0L, 0L, 0L)
      rows.foreach { case (_, eventId, us, cents) =>
        val (oUs, oId, oC, hi, lo, cUs, cId, cC, n, sum) = s
        val openWins = us < oUs || (us == oUs && eventId < oId)
        val closeWins = us > cUs || (us == cUs && eventId > cId)
        s = (
          if (openWins) us else oUs,
          if (openWins) eventId else oId,
          if (openWins) cents else oC,
          math.max(hi, cents), math.min(lo, cents),
          if (closeWins) us else cUs,
          if (closeWins) eventId else cId,
          if (closeWins) cents else cC,
          n + 1L, sum + cents)
      }
      st.update(s)
      val (_, _, oC, hi, lo, _, _, cC, n, sum) = s
      Iterator(OhlcBar(key._1, key._2, oC / 100.0, hi / 100.0, lo / 100.0,
        cC / 100.0, n, sum / 100.0))
    }
  }

  /** Maintain bars over a `(user_id, event_id, us, cents)` tick stream;
    * run with `outputMode("update")`. `bucketUs` defaults to the batch
    * query's 5-minute bars. */
  def track(ticks: Dataset[(Long, Long, Long, Long)],
      bucketUs: Long = 300000000L): Dataset[OhlcBar] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey { case (u, _, us, _) => (u, us / bucketUs) }
      .transformWithState(new OhlcProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
