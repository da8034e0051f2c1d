package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One closed week's control-chart reading for a key: `cusum` is the
  * accumulated excess over the reference rate AFTER this week, in events
  * (scaled by nothing — the reference is supplied, so no mean estimation
  * is needed); `flagged` when the excess passes `threshold`. */
case class CusumReading(key: String, week: Long, x: Long, cusum: Long,
    flagged: Boolean)

/**
 * Continuous CUSUM control chart — the PROSPECTIVE complement of batch
 * A95/q196: the batch detector estimates the mean retrospectively over
 * all observed weeks, which a live monitor cannot do, so the streaming
 * form runs the textbook SPC chart against a SUPPLIED reference rate
 * (events/week expected under control): C ← max(0, C + (x_week − ref)),
 * alarm when C > threshold. Detects small SUSTAINED drifts that
 * per-window tests (B46's z-score, q163's chi²) never accumulate.
 *
 * State per key: the running cusum, the currently-open week id, and its
 * count — three longs, regardless of stream length; checkpointed and
 * exactly-once under `transformWithState`. A week EMITS when a later
 * week's first event arrives for that key (the in-order contract shared
 * with B46/B49: a key's events do not go backwards in time across
 * batches; within a batch, rows sort by week). Append mode — a closed
 * week's reading is final. The recurrence here is the SEQUENTIAL
 * definition; Round11EvalSpec asserts batch q196's max-plus identity
 * against the same recurrence, so the two formulations are mutually
 * witnessed.
 */
object StreamingCusum {

  /** Input observation: one event at epoch-week `week`. */
  case class Obs(key: String, week: Long)

  private class CusumProcessor(ref: Long, threshold: Long)
      extends StatefulProcessor[String, Obs, CusumReading] {
    // (open week, open count, cusum after all CLOSED weeks)
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("cusum",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[CusumReading] = {
      var (openWeek, openN, cusum) =
        if (st.exists()) st.get() else (Long.MinValue, 0L, 0L)
      val out = collection.mutable.ArrayBuffer[CusumReading]()
      rows.toArray.sortBy(_.week).foreach { o =>
        if (openWeek == Long.MinValue) { openWeek = o.week; openN = 0L }
        if (o.week < openWeek)
          throw new IllegalStateException(
            s"out-of-order week ${o.week} for key $key (open: $openWeek) — " +
              "the feed must deliver a key's events in week order")
        while (o.week > openWeek) {
          // close the open week (quiet gap weeks close with x = 0)
          cusum = math.max(0L, cusum + (openN - ref))
          out += CusumReading(key, openWeek, openN, cusum,
            cusum > threshold)
          openWeek += 1L
          openN = 0L
        }
        openN += 1L
      }
      st.update((openWeek, openN, cusum))
      out.iterator
    }
  }

  /** Run the control chart over `obs`; see object doc for the contract.
    * Run the result with `outputMode("append")`. */
  def monitor(obs: Dataset[Obs], ref: Long,
      threshold: Long): Dataset[CusumReading] = {
    require(ref >= 0 && threshold >= 0, "ref and threshold must be >= 0")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new CusumProcessor(ref, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
