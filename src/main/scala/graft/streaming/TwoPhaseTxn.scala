package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/**
 * Streaming two-phase transaction application — the Structured-Streaming
 * re-expression of TiFlink's CDC consumer state machine (reference:
 * connectors/FlinkTikvConsumer.java:108-131 `handleRow`: PREWRITE rows are
 * buffered per transaction, COMMIT releases them stamped with the commit
 * timestamp, ROLLBACK discards them; :181-191 `flushRows` pairs each commit
 * with its buffered prewrite; :204-242 checkpoints the resolved position so a
 * restart resumes without re-emitting).
 *
 * Spark-first translation: instead of hand-managed TreeMaps keyed by
 * (startTs, key), the log is grouped by `txn_id` and a
 * [[StatefulProcessor]] holds per-transaction state in the engine's state
 * store — MapState (keyed by event_id) for the buffered prewrites, ValueState
 * for the resolved outcome, an event-time timer for eviction. Restart
 * resume is the engine's checkpoint, playing the role of
 * FlinkTikvConsumer's `resolvedTsState` ListState.
 *
 * Out-of-order tolerance: within a micro-batch the iterator is unordered, so
 * prewrites are buffered before the batch's outcome (if any) is applied.
 * Across batches, the outcome is *retained* after it resolves (TiFlink's
 * `commits` map keeps the commit row until flush) so a prewrite that arrives
 * after its COMMIT still emits — stamped with the stored commit_ts — and one
 * arriving after ROLLBACK is dropped. The eviction timer bounds both the
 * buffered-prewrite state of an abandoned transaction and the retained
 * outcome of a resolved one.
 *
 * Duplicate tolerance (at-least-once upstream sources): state is keyed by
 * event_id, mirroring the reference's prewrite TreeMap keyed by
 * (startTs, key) (FlinkTikvConsumer.java:66,118 — a re-delivered prewrite
 * overwrites its slot). A duplicate PREWRITE before the outcome overwrites
 * the buffered entry; one after the COMMIT finds its event_id in the
 * released set and is dropped — each prewrite surfaces at most once per
 * transaction lifetime (until the eviction timer retires the state).
 *
 * Scale: state is O(open transactions × rows-per-txn), the same bound as
 * the reference's prewrite buffer, PLUS the retained outcome + released
 * event-ids of recently-resolved transactions. The two horizons differ:
 * an open transaction's buffer lives `ttl` (it may legitimately stay open
 * long), but a RESOLVED transaction's state only needs to outlive event-
 * time disorder — the engine's watermark already drops rows later than
 * `watermarkDelay`, so no prewrite can arrive after watermark passes the
 * transaction's last activity. Resolved state therefore evicts on the
 * shorter `resolvedRetention` clock, keeping long ttls from accumulating
 * history-sized released sets. State is partitioned by txn_id across
 * executors either way.
 */
object TwoPhaseTxn {

  /** One record of the transaction log.
    * op = PREWRITE: (event_id, user_id, value) is a tentative write at ts.
    * op = COMMIT:   ts is the commit timestamp; payload columns unused.
    * op = ROLLBACK: the transaction's prewrites must never surface. */
  case class TxnLogRecord(
      txn_id: Long, op: String, event_id: Long, user_id: Long,
      value: Double, ts: Timestamp)

  /** A prewrite released by its COMMIT, stamped with the commit timestamp. */
  case class CommittedWrite(
      txn_id: Long, event_id: Long, user_id: Long, value: Double,
      commit_ts: Timestamp)

  private case class Pending(event_id: Long, user_id: Long, value: Double)

  /** Outcome marker: non-null commit_ts → COMMIT at that ts (full µs
    * precision preserved through the state encoder); null → ROLLBACK. */
  private case class Outcome(commit_ts: Timestamp) {
    def committed: Boolean = commit_ts != null
  }

  val PREWRITE = "PREWRITE"
  val COMMIT = "COMMIT"
  val ROLLBACK = "ROLLBACK"

  /** Keyed by txn_id. Buffers prewrites until the transaction resolves;
    * emits on COMMIT, discards on ROLLBACK, evicts state when the
    * event-time timer fires — `ttlMs` past last activity while the txn is
    * open, `resolvedMs` once it resolved (see the retention note above). */
  class TwoPhaseProcessor(ttlMs: Long, resolvedMs: Long)
    extends StatefulProcessor[Long, TxnLogRecord, CommittedWrite] {

    @transient private var pending: MapState[Long, Pending] = _
    @transient private var released: MapState[Long, Boolean] = _
    @transient private var outcome: ValueState[Outcome] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getMapState[Long, Pending](
        "pending", Encoders.scalaLong, Encoders.product[Pending], TTLConfig.NONE)
      released = getHandle.getMapState[Long, Boolean](
        "released", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      outcome = getHandle.getValueState[Outcome](
        "outcome", Encoders.product[Outcome], TTLConfig.NONE)
    }

    private def release(p: Pending, commitTs: Timestamp): CommittedWrite =
      CommittedWrite(-1L, p.event_id, p.user_id, p.value, commitTs)

    override def handleInputRows(
        txnId: Long, rows: Iterator[TxnLogRecord],
        timerValues: TimerValues): Iterator[CommittedWrite] = {
      // Canonical in-batch order: buffer every prewrite first, then apply the
      // batch's outcome row (the iterator itself is unordered).
      var batchOutcome: Option[Outcome] = None
      var maxTsMs = 0L
      val out = Seq.newBuilder[CommittedWrite]
      rows.foreach { r =>
        if (r.ts != null) maxTsMs = math.max(maxTsMs, r.ts.getTime)
        r.op match {
          case PREWRITE =>
            if (outcome.exists()) {
              val o = outcome.get()
              if (o.committed) {
                // Late prewrite after COMMIT: emit stamped with the retained
                // commit_ts — unless this event_id was already released (an
                // at-least-once redelivery), which surfaces nothing.
                if (!released.containsKey(r.event_id)) {
                  out += release(Pending(r.event_id, r.user_id, r.value), o.commit_ts)
                  released.updateValue(r.event_id, true)
                }
              }
              // else: resolved ROLLBACK — the prewrite must never surface.
            } else
              // Unresolved txn: buffer, keyed by event_id so a re-delivered
              // prewrite overwrites its slot instead of duplicating it.
              pending.updateValue(r.event_id, Pending(r.event_id, r.user_id, r.value))
          case COMMIT   => batchOutcome = Some(Outcome(r.ts))
          case ROLLBACK => batchOutcome = Some(Outcome(null))
          case other => throw new IllegalArgumentException(
            s"unknown txn-log op '$other' for txn $txnId")
        }
      }
      batchOutcome.foreach { o =>
        if (o.committed) pending.values().foreach { p =>
          out += release(p, o.commit_ts)
          released.updateValue(p.event_id, true)
        }
        pending.clear()
        outcome.update(o)
      }
      // Refresh the eviction timer: one per key, past the latest activity
      // (falls back to the watermark when the batch carried no ts). Open
      // txns wait out the full ttl; resolved ones only the disorder window.
      val base = math.max(maxTsMs, timerValues.getCurrentWatermarkInMs())
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(base + (if (outcome.exists()) resolvedMs else ttlMs))
      out.result().iterator.map(_.copy(txn_id = txnId))
    }

    /** Abandoned (never-resolved) or fully-drained transaction: drop all
      * state. Prewrites of an unresolved txn are discarded silently — the
      * reference behaves the same way (an unresolved lock past the resolved
      * ts horizon never flushes). */
    override def handleExpiredTimer(
        txnId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CommittedWrite] = {
      pending.clear()
      released.clear()
      outcome.clear()
      Iterator.empty
    }
  }

  /** Apply a two-phase transaction log: emit each PREWRITE once its COMMIT
    * arrives (stamped with commit_ts), never emit rolled-back or abandoned
    * writes. `watermarkDelay` bounds disorder; `ttl` bounds how long an
    * unresolved transaction may stay open before its state is evicted;
    * `resolvedRetention` bounds how long a RESOLVED transaction's dedup
    * state is kept, and must exceed `watermarkDelay` (rows later than the
    * watermark never reach the processor, so anything beyond the disorder
    * window is wasted state).
    *
    * The batch ground truth for the COMMIT/ROLLBACK semantics is
    * [[graft.operators.Changelog.q63TxnApply]] (oracle-checked). */
  def applyLog(
      log: Dataset[TxnLogRecord],
      watermarkDelay: String = "10 minutes",
      ttl: java.time.Duration = java.time.Duration.ofHours(24),
      resolvedRetention: java.time.Duration = java.time.Duration.ofMinutes(30)): Dataset[CommittedWrite] = {
    val spark = log.sparkSession
    import spark.implicits._
    val delayMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(delayMs.months == 0,
      s"watermarkDelay '$watermarkDelay' must not use month/year units")
    val delayTotalMs = delayMs.days * 86400000L + delayMs.microseconds / 1000L
    require(resolvedRetention.toMillis >= delayTotalMs,
      s"resolvedRetention (${resolvedRetention.toMillis}ms) must cover watermarkDelay " +
        s"('$watermarkDelay' = ${delayTotalMs}ms): evicting resolved-txn dedup state " +
        "inside the disorder window re-emits duplicates on late prewrites")
    log
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.txn_id)
      .transformWithState(
        new TwoPhaseProcessor(ttl.toMillis, resolvedRetention.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
