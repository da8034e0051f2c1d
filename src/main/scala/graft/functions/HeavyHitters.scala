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

  /** Summary counters plus the exact TOTAL element count — MG loses mass
    * on eviction, so N must ride the buffer for the bound check; carrying
    * it here also saves the caller a separate counting pass. */
  final case class MGBuf(counters: mutable.Map[String, Long], var n: Long)

  final class MisraGries(cap: Int)
      extends Aggregator[String, MGBuf, (Map[String, Long], Long)] {
    require(cap > 0, "cap must be positive")

    override def zero: MGBuf = MGBuf(mutable.Map.empty, 0L)

    /** Evict until ≤ cap counters by subtracting a pivot ≥ the (cap+1)-th
      * largest count and dropping the non-positive (batched MG decrement;
      * same bound). reduce() can overflow by exactly one entry, so its
      * pivot is the MINIMUM — O(cap), no sort; only merge() (≤ 2·cap
      * entries) pays the selection sort. */
    private def shrink(b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      if (b.size <= cap) b
      else {
        val pivot =
          if (b.size == cap + 1) b.values.min
          else b.values.toSeq.sorted(Ordering[Long].reverse).apply(cap)
        val out = mutable.Map.empty[String, Long]
        b.foreach { case (k, v) => if (v > pivot) out(k) = v - pivot }
        out
      }
    }

    override def reduce(b: MGBuf, a: String): MGBuf = {
      b.counters.updateWith(a) { c => Some(c.getOrElse(0L) + 1L) }
      MGBuf(shrink(b.counters), b.n + 1L)
    }

    override def merge(x: MGBuf, y: MGBuf): MGBuf = {
      y.counters.foreach { case (k, v) =>
        x.counters.updateWith(k)(c => Some(c.getOrElse(0L) + v))
      }
      MGBuf(shrink(x.counters), x.n + y.n)
    }

    override def finish(b: MGBuf): (Map[String, Long], Long) =
      (b.counters.toMap, b.n)

    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
