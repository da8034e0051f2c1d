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

  /** Evict IN PLACE until ≤ cap counters by subtracting a pivot ≥ the
    * (cap+1)-th largest count and dropping the non-positive (batched MG
    * decrement; same bound). A one-entry overflow (the per-row update
    * path) pivots on the MINIMUM — one O(cap) scan; larger overflows
    * (merge: ≤ 2·cap entries) find the pivot by [[kthSmallest]]
    * quickselect — expected O(cap), vs a full sort. No fresh map is
    * allocated: callers on per-row paths rely on mutation. Object-level
    * so the streaming processor ([[graft.streaming.StreamingTopK]])
    * shares the exact same eviction as the batch Aggregator. */
  private[graft] def shrinkInPlace(b: mutable.Map[String, Long],
      cap: Int): Unit = {
    if (b.size <= cap) return
    val pivot =
      if (b.size == cap + 1) {
        var m = Long.MaxValue
        b.foreach { case (_, v) => if (v < m) m = v }
        m
      } else {
        val vs = b.values.toArray
        kthSmallest(vs, vs.length - 1 - cap) // = (cap+1)-th largest
      }
    b.mapValuesInPlace((_, v) => v - pivot)
    b.filterInPlace((_, v) => v > 0)
  }

  /** MG point update: count `a` then re-bound — the per-element step both
    * the batch reduce and the streaming processor apply. */
  private[graft] def offer(b: mutable.Map[String, Long], a: String,
      cap: Int): Unit = {
    b.updateWith(a) { c => Some(c.getOrElse(0L) + 1L) }
    shrinkInPlace(b, cap)
  }

  /** In-place Hoare-partition quickselect: k-th smallest (0-based) of `a`.
    * Median-of-three pivot; expected O(n), and n ≤ 2·cap here. */
  private def kthSmallest(a: Array[Long], k: Int): Long = {
    var lo = 0; var hi = a.length - 1
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      val p = math.max(math.min(a(lo), a(mid)),
        math.min(math.max(a(lo), a(mid)), a(hi)))
      var i = lo; var j = hi
      while (i <= j) {
        while (a(i) < p) i += 1
        while (a(j) > p) j -= 1
        if (i <= j) { val t = a(i); a(i) = a(j); a(j) = t; i += 1; j -= 1 }
      }
      if (k <= j) hi = j
      else if (k >= i) lo = i
      else return a(k)
    }
    a(lo)
  }

  final class MisraGries(cap: Int)
      extends Aggregator[String, MGBuf, (Map[String, Long], Long)] {
    require(cap > 0, "cap must be positive")

    override def zero: MGBuf = MGBuf(mutable.Map.empty, 0L)

    override def reduce(b: MGBuf, a: String): MGBuf = {
      offer(b.counters, a, cap)
      b.n += 1L
      b
    }

    override def merge(x: MGBuf, y: MGBuf): MGBuf = {
      // fold the smaller summary into the larger — counter addition is
      // commutative and the pivot comes from the combined values, so the
      // result is direction-independent; the update count is not
      val (big, small) =
        if (x.counters.size >= y.counters.size) (x, y) else (y, x)
      small.counters.foreach { case (k, v) =>
        big.counters.updateWith(k)(c => Some(c.getOrElse(0L) + v))
      }
      shrinkInPlace(big.counters, cap)
      big.n = x.n + y.n
      big
    }

    override def finish(b: MGBuf): (Map[String, Long], Long) =
      (b.counters.toMap, b.n)

    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
