package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra-Gries heavy-hitters summary as a typed [[Aggregator]] — the
 * bounded-memory sketch for "which keys are frequent" over cardinalities
 * where an exact groupBy's state would not fit (the 100 TB path q60's
 * exact vocabulary count cannot take). The per-partition buffer holds at
 * most `cap` counters; merging two summaries is counter addition followed
 * by the same eviction, so the aggregation is fully partial/merge-shaped —
 * Spark runs it map-side like any partial agg.
 *
 * GUARANTEE (the classic MG bound): every key with true frequency
 * > N/(cap+1) survives in the summary, and each surviving counter
 * undercounts by at most N/(cap+1). [[graft.operators.Corpus.q115HeavyHitters]]
 * uses this to get EXACT top-k at sketch memory: pass 1 finds candidate
 * keys (a superset of the true top-k when the k-th frequency clears the
 * bound — checked loudly at runtime, never assumed), pass 2 exact-counts
 * only the ≤cap candidates.
 */
object HeavyHitters {

  final class MisraGries(cap: Int)
      extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    require(cap > 0, "cap must be positive")

    override def zero: mutable.Map[String, Long] = mutable.Map.empty

    /** Evict until ≤ cap counters: subtract the (cap+1)-th largest count
      * from every counter and drop the non-positive — the batched form of
      * MG's decrement-all step (equivalent bound, one pass). */
    private def shrink(b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      if (b.size <= cap) b
      else {
        val pivot = b.values.toSeq.sorted(Ordering[Long].reverse).apply(cap)
        val out = mutable.Map.empty[String, Long]
        b.foreach { case (k, v) => if (v > pivot) out(k) = v - pivot }
        out
      }
    }

    override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
      b.updateWith(a) { c => Some(c.getOrElse(0L) + 1L) }
      shrink(b)
    }

    override def merge(
        x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      y.foreach { case (k, v) => x.updateWith(k)(c => Some(c.getOrElse(0L) + v)) }
      shrink(x)
    }

    override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

    override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
