package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One emitted sample row; `n_seen` is the source's monotone high-water
  * mark (rows processed so far), so a consumer reconstructs the CURRENT
  * sample by keeping each source's rows at max `n_seen`. */
case class SampleDraw(source: String, doc_id: Long, pri: String,
    rk: Long, n_seen: Long)

/**
 * Continuous per-source uniform sample — the streaming twin of
 * [[graft.operators.Corpus.q132UniformSample]] (C52), sharing the SAME
 * md5 hash-priority draw so batch and stream agree BIT-FOR-BIT: hash-
 * priority top-k is uniform sampling without replacement AND order-
 * independent, so the maintained sample after any prefix of the stream
 * equals the batch query over exactly those rows — however the stream is
 * sliced or reordered across micro-batches and restarts (the q73
 * incremental-equals-batch discipline, here for sampling).
 *
 * State per source is the k smallest (pri, doc_id) pairs — bounded at
 * k rows regardless of stream length, the same bounded-state posture as
 * the reference's continuous operators (FlinkTikvConsumer.java:222-242
 * keeps per-key state under engine checkpointing; here it rides
 * `transformWithState`, checkpointed and restart-safe).
 *
 * Emission (Update mode): every touched source re-emits its FULL current
 * ≤k sample stamped with `n_seen` — ≤ |sources|·k rows per batch,
 * dashboard-sized.
 */
object StreamingSample {

  /** Identical bytes to the batch draw's `md5(concat('smpl:', doc_id))`. */
  def priority(docId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"smpl:$docId".getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private class SampleProcessor(k: Int)
      extends StatefulProcessor[String, (String, Long), SampleDraw] {
    @transient private var st: ValueState[(List[(String, Long)], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(List[(String, Long)], Long)](
        "sample", Encoders.kryo[(List[(String, Long)], Long)], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[SampleDraw] = {
      val (kept0, n0) = if (st.exists()) st.get()
        else (List.empty[(String, Long)], 0L)
      var n = n0
      var kept = kept0
      rows.foreach { case (_, docId) =>
        n += 1L
        val cand = (priority(docId), docId)
        // insert-then-trim keeps the k smallest (pri, doc_id) — the exact
        // WindowGroupLimit the batch plan runs, one row at a time
        kept = ((cand :: kept).sorted).take(k)
      }
      st.update((kept, n))
      kept.iterator.zipWithIndex.map { case ((pri, id), i) =>
        SampleDraw(key, id, pri, i + 1L, n)
      }
    }
  }

  /** Maintain the per-source sample over a `(source, doc_id)` stream; run
    * with `outputMode("update")`. */
  def sample(docs: Dataset[(String, Long)], k: Int = 10): Dataset[SampleDraw] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new SampleProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
