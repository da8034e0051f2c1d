package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.HeavyHitters

/** One bucket's current Misra-Gries candidate: `count_lb` undercounts the
  * token's true stream frequency by at most `n_bucket / (cap+1)`. */
case class TopKCandidate(bucket: Int, token: String, count_lb: Long,
    n_bucket: Long)

/**
 * Continuous heavy hitters over an unbounded token stream — the streaming
 * twin of [[graft.operators.Corpus.q115HeavyHitters]] (C46), sharing the
 * SAME Misra-Gries eviction ([[HeavyHitters.offer]]) so batch and stream
 * agree on semantics. The reference's continuous pipelines keep exactly
 * this kind of bounded per-key state under the engine's checkpointing
 * (FlinkTikvConsumer.java:222-242); here the state rides Spark's
 * `transformWithState` store — checkpointed, exactly-once, restart-safe.
 *
 * Sharding: each token hashes to ONE of `buckets` state keys, so a
 * token's full substream meets a single MG summary — the classic MG
 * bound then holds per bucket (every token with true count >
 * n_bucket/(cap+1) is guaranteed present, each counter undercounts by at
 * most that), and buckets bound TOTAL state at `buckets · cap` counters
 * no matter the stream's cardinality. More buckets = more parallelism
 * AND tighter bounds (n_bucket shrinks); `buckets` should scale with
 * executor count at 100 TB/day rates.
 *
 * Emission (Update mode): after each micro-batch every touched bucket
 * re-emits its ≤cap candidates stamped with `n_bucket` — a monotone
 * per-bucket high-water mark, so a consumer reconstructs the CURRENT
 * global candidate set by keeping each bucket's rows at max `n_bucket`
 * and dropping null tokens (an emptied summary emits one null-token
 * heartbeat so the mark still advances). ≤ buckets·cap rows —
 * dashboard-sized. Exact top-k on demand = C46's pass 2: recount just
 * these candidates over the stored corpus.
 */
object StreamingTopK {

  private class MgProcessor(cap: Int)
      extends StatefulProcessor[Int, (Int, String), TopKCandidate] {
    @transient private var st: ValueState[(Map[String, Long], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Map[String, Long], Long)](
        "mg", Encoders.kryo[(Map[String, Long], Long)], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[TopKCandidate] = {
      val (m0, n0) = if (st.exists()) st.get() else (Map.empty[String, Long], 0L)
      val m = mutable.Map.from(m0)
      var n = n0
      rows.foreach { case (_, t) =>
        HeavyHitters.offer(m, t, cap)
        n += 1L
      }
      st.update((m.toMap, n))
      // a summary can be legitimately EMPTY right after eviction (all
      // counters hit the pivot — e.g. a batch of all-distinct tokens);
      // a touched bucket must still advance the consumer's high-water
      // mark or stale candidates from an earlier batch would read as
      // current, so emit a null-token heartbeat carrying n
      if (m.isEmpty) Iterator(TopKCandidate(key, null, 0L, n))
      else m.iterator.map { case (t, c) => TopKCandidate(key, t, c, n) }
    }
  }

  /** Stable token→bucket shard (JVM String.hashCode is specified, so the
    * assignment survives restarts and upgrades). */
  def bucketOf(token: String, buckets: Int): Int =
    math.floorMod(token.hashCode, buckets)

  /** Track heavy hitters over `tokens`; see object doc for the contract.
    * Run the result with `outputMode("update")`. */
  def track(tokens: Dataset[String], cap: Int = 64,
      buckets: Int = 16): Dataset[TopKCandidate] = {
    require(cap > 0 && buckets > 0, "cap and buckets must be positive")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.map(t => (bucketOf(t, buckets), t))
      .groupByKey(_._1)
      .transformWithState(new MgProcessor(cap), TimeMode.None(),
        OutputMode.Update())
  }
}
