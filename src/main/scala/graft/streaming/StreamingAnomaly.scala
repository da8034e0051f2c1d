package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One flagged event; `mu`/`sd`/`z` are bit-identical to the batch
  * detector's ([[graft.operators.Relational.q129ZscoreAnomaly]]) for the
  * same in-order event stream. */
case class AnomalyAlert(user_id: Long, event_id: Long, us: Long,
    value: Double, mu: Double, sd: Double, z: Double)

/**
 * Continuous per-entity z-score anomaly detection — the streaming twin of
 * batch q129 (A62): each event is scored against the user's trailing
 * `lookback` values (current excluded, ≥ `minPrior` priors required), and
 * |z| > `zThresh` emits an alert. The drift/fraud alerting loop a batch
 * detector can only run after the fact; the reference's continuous
 * pipelines keep exactly this bounded per-key state under engine
 * checkpointing (FlinkTikvConsumer.java:222-242 resolvedTs analog).
 *
 * Exact batch agreement, not approximate: the ring stores CENTS (the
 * `decimal(14,2)·100` longs Spark's own cast produced — the processor
 * never re-rounds a double), and the mean/variance arithmetic replays the
 * batch plan's exact operation sequence — Σcents and Σcents² are exact
 * longs whose double casts equal the batch plan's decimal-sum→double
 * casts (one correctly-rounded conversion each), then mu/sd/z follow the
 * identical IEEE op order. StreamingAnomalySpec asserts bit-equality of
 * every emitted (mu, sd, z) against q129 over the same feed.
 *
 * Scale/state: per-user state is ONE fixed ring of ≤ `lookback` longs —
 * total state is `users · lookback · 8` bytes regardless of stream
 * length, sharded by Spark's groupByKey partitioning across executors;
 * checkpointed, exactly-once, restart-safe. Within a micro-batch rows
 * sort by (us, event_id) — cross-batch order is the caller's contract
 * (feed from an ordered changelog; the batch twin exists for replays).
 */
object StreamingAnomaly {

  /** (user_id, event_id, us, value, cents) — `cents` MUST come from the
    * plan-side cast `(value :: decimal(14,2)) * 100 :: long` so stream and
    * batch round identically. */
  type Obs = (Long, Long, Long, Double, Long)

  private class ZProcessor(lookback: Int, minPrior: Int, zThresh: Double)
      extends StatefulProcessor[Long, Obs, AnomalyAlert] {
    @transient private var ring: ValueState[Vector[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Vector[Long]](
        "ring", Encoders.kryo[Vector[Long]], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[AnomalyAlert] = {
      var r = if (ring.exists()) ring.get() else Vector.empty[Long]
      val out = rows.toSeq.sortBy(o => (o._3, o._2)).flatMap {
        case (u, eid, us, value, cents) =>
          val n = r.length
          val alert = if (n >= minPrior) {
            // the batch plan's exact op sequence over the exact sums: the
            // decimal sums are EXACT rationals (Σc/100, Σc²/10⁴) and the
            // double casts are ONE correctly-rounded conversion each —
            // accumulate in BigInt (c·c overflows Long past ~$30M values,
            // and a Long.toDouble/1e4 two-step double-rounds past 2^53)
            // and convert through scaled BigDecimal exactly like the plan
            val s1 = new java.math.BigDecimal(
              r.foldLeft(BigInt(0))(_ + _).bigInteger, 2).doubleValue
            val s2 = new java.math.BigDecimal(
              r.foldLeft(BigInt(0))((a, c) => a + BigInt(c) * BigInt(c))
                .bigInteger, 4).doubleValue
            val nd = n.toDouble
            val mu = s1 / nd
            val sd = math.sqrt(math.max((s2 - s1 * s1 / nd) / (nd - 1d), 0d))
            if (sd > 0d) {
              val z = (value - mu) / sd
              if (math.abs(z) > zThresh) Some(AnomalyAlert(u, eid, us, value, mu, sd, z))
              else None
            } else None
          } else None
          r = (r :+ cents).takeRight(lookback)
          alert
      }
      ring.update(r)
      out.iterator
    }
  }

  /** Score an in-order observation stream; Append-mode emission (an alert
    * is final the moment it fires — nothing refines it). */
  def detect(obs: Dataset[Obs], lookback: Int = 20, minPrior: Int = 10,
      zThresh: Double = 2.5): Dataset[AnomalyAlert] = {
    require(lookback >= minPrior && minPrior >= 2,
      s"need lookback >= minPrior >= 2, got $lookback/$minPrior")
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_._1)
      .transformWithState(new ZProcessor(lookback, minPrior, zThresh),
        TimeMode.None(), OutputMode.Append())
  }
}
