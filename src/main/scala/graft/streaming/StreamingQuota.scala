package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One admitted document: `admitted_rank` is its 1-based admission order
  * within its source (never exceeds the quota). */
case class QuotaAdmit(source: String, doc_id: Long, admitted_rank: Long)

/**
 * Continuous per-source admission quota — the streaming twin of
 * [[graft.operators.Corpus.q61SourceQuota]] (C15): admit the first `quota`
 * documents per source in arrival order, drop the rest, forever. The batch
 * operator balances a training mix AFTER the corpus lands; this enforces
 * the same cap AT INGEST, so an over-crawled source never bloats storage in
 * the first place (the reference's continuous pipelines gate ingest the
 * same way — FlinkTikvConsumer.java:161-191 orders and filters the
 * changefeed before it reaches state).
 *
 * State: ONE long per source (the admitted count) — bounded by |sources|
 * regardless of stream length, checkpointed/exactly-once under
 * `transformWithState`, restart-safe. Admission order is (micro-batch,
 * doc_id) — arrival order across batches, deterministic doc_id order
 * within a batch (a batch is an unordered set, so the tie MUST be broken
 * by data, not iterator order, for replay determinism). Append mode: an
 * admission decision is final when emitted.
 *
 * Scale: each source's counter lives on one state partition; admission is
 * a per-row compare-and-increment. Hot sources don't skew — the per-batch
 * work per source is O(rows in batch), the state read/write is one long.
 */
object StreamingQuota {

  private class QuotaProcessor(quota: Int)
      extends StatefulProcessor[String, (String, Long), QuotaAdmit] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("admitted", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[QuotaAdmit] = {
      var n = if (st.exists()) st.get() else 0L
      if (n >= quota) { Iterator.empty } // saturated: nothing to admit
      else {
        val admitted = rows.map(_._2).toArray.sorted.iterator
          .takeWhile(_ => n < quota)
          .map { id => n += 1L; QuotaAdmit(key, id, n) }
          .toVector
        st.update(n)
        admitted.iterator
      }
    }
  }

  /** Admit the first `quota` docs per source from a `(source, doc_id)`
    * stream; see object doc for the contract. Run the result with
    * `outputMode("append")`. */
  def admit(docs: Dataset[(String, Long)], quota: Int): Dataset[QuotaAdmit] = {
    require(quota > 0, "quota must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new QuotaProcessor(quota), TimeMode.None(),
        OutputMode.Append())
  }
}
