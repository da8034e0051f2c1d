package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/**
 * Streaming sequential-pattern (funnel) detection — the continuous twin of
 * the batch funnel ([[graft.operators.Relational.q82Funnel]], A36): per
 * user, the first `view`, the first `click` STRICTLY AFTER that view, and
 * the first `purchase` strictly after that click. Flink serves this shape
 * with CEP / MATCH_RECOGNIZE; here it is a `transformWithState` processor
 * whose emissions CONVERGE TO THE BATCH ANSWER under arbitrary batch
 * splits and out-of-order arrival (spec-asserted replay parity).
 *
 * Out-of-order is the crux: a late-arriving earlier `view` lowers
 * first_view, which can re-qualify clicks that were previously too early —
 * so the processor must retain candidate clicks/purchases, not just the
 * current minima. The retention is BOUNDED by monotonicity: first_view,
 * first_click, first_purchase only ever DECREASE as data arrives, so any
 * candidate above the current stage answer can never become an answer —
 * each list is pruned to timestamps ≤ the stage's current value (plus all
 * candidates while the stage is still open). At 100 TB add watermark-TTL
 * eviction of closed users; per-user state stays O(candidates below the
 * answer), typically a handful.
 */
object StreamingFunnel {

  /** (user_id, event_type, epoch_µs). */
  type In = (Long, String, Long)
  /** Funnel row: µs timestamps, -1 = stage not reached (keeps encoders
    * simple and total orders exact). */
  case class FunnelRow(user_id: Long, first_view_us: Long,
      first_click_us: Long, first_purchase_us: Long, stage: Long)

  private val None_ = -1L

  class FunnelProcessor extends StatefulProcessor[Long, In, FunnelRow] {
    import org.apache.spark.sql.streaming.{ListState, ValueState}

    @transient private var vMin: ValueState[Long] = _
    @transient private var clicks: ListState[Long] = _
    @transient private var purchases: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      vMin = getHandle.getValueState[Long]("vmin", Encoders.scalaLong, TTLConfig.NONE)
      clicks = getHandle.getListState[Long]("clicks", Encoders.scalaLong, TTLConfig.NONE)
      purchases = getHandle.getListState[Long]("purchases", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      var v = if (vMin.exists()) vMin.get() else None_
      var cs = clicks.get().toList
      var ps = purchases.get().toList
      rows.foreach { case (_, tpe, us) =>
        tpe match {
          case "view" => if (v == None_ || us < v) v = us
          case "click" => cs ::= us
          case "purchase" => ps ::= us
          case _ => ()
        }
      }
      val c = if (v == None_) None_
        else cs.filter(_ > v) match { case Nil => None_; case e => e.min }
      val p = if (c == None_) None_
        else ps.filter(_ > c) match { case Nil => None_; case e => e.min }
      // monotone prune: candidates above the current stage answer can never
      // win (the answers only decrease); while a stage is open keep all
      if (v != None_) vMin.update(v)
      def store(st: org.apache.spark.sql.streaming.ListState[Long],
          vs: List[Long]): Unit = {
        val a = vs.distinct.toArray
        if (a.isEmpty) st.clear() else st.put(a) // RocksDB rejects empty puts
      }
      store(clicks, if (c == None_) cs else cs.filter(_ <= c))
      store(purchases, if (p == None_) ps else ps.filter(_ <= p))
      val stage = if (p != None_) 3L else if (c != None_) 2L else if (v != None_) 1L else 0L
      Iterator(FunnelRow(key, v, c, p, stage))
    }
  }

  /** Update-mode continuous funnel over a stream of (user, type, µs). */
  def funnelTws(ds: Dataset[In]): Dataset[FunnelRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())
  }
}
