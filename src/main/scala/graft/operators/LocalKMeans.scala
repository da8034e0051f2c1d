package graft.operators

/**
 * Seeded DRIVER-LOCAL Lloyd's k-means over a bounded, already-collected
 * sample — the quantizer-fit engine behind [[IvfIndex.build]] and
 * [[PqIndex.build]].
 *
 * Why driver-local: both indexes fit their quantizer on a BOUNDED sample
 * (`fitSampleSize`, ≤25k rows by contract — the fit never scales with the
 * corpus; only the map-only assignment/encode pass does). A distributed
 * MLlib fit on that sample is pure scheduler overhead: 10 Lloyd iterations
 * × per-iteration jobs × (8 subspaces for PQ) measured as ~130 of q146's
 * 138 Spark jobs at sf0.1, against milliseconds of actual arithmetic
 * (r19 verdict item 6). Collecting the sample once (the established
 * bounded-metadata collect: ≤ fitSampleSize × dim doubles by construction)
 * and iterating on the driver removes the whole job chain while keeping
 * the distributed pass distributed.
 *
 * Determinism: seeded init (k distinct row indices via a seeded shuffle)
 * plus sequential fp accumulation in row order — the result is a pure
 * function of (sample, k, seed, iters), independent of cluster size or
 * partitioning (STRONGER than the MLlib fit it replaces, whose fp sums
 * associate per-partition). Empty clusters keep their previous center
 * (MLlib's behavior), so exactly `k` centers always come back.
 */
private[operators] object LocalKMeans {

  /** `k` centers over `points` (all rows the same width). Requires
    * `points.length >= k` — callers enforce it with their own loud
    * preconditions. Ties in the nearest-center scan break to the LOWEST
    * center id (strict `<`), matching the engine-side assignment
    * expressions' first-minimum tie break. */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
      iters: Int = 10): IndexedSeq[Seq[Double]] = {
    require(points.length >= k,
      s"k-means needs >= k ($k) points, got ${points.length}")
    val n = points.length
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(points.indices.toVector).take(k)
      .map(points(_).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      var i = 0
      while (i < n) {
        val p = points(i)
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var t = 0
          while (t < dim) {
            val diff = p(t) - centers(c)(t); d += diff * diff; t += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += p(t); t += 1 }
        cnts(best) += 1
        i += 1
      }
      var c = 0
      while (c < k) {
        if (cnts(c) > 0) {
          var t = 0
          while (t < dim) { centers(c)(t) = sums(c)(t) / cnts(c); t += 1 }
        } // empty cluster: keep the previous center — k centers, always
        c += 1
      }
      it += 1
    }
    centers.map(_.toIndexedSeq: Seq[Double]).toIndexedSeq
  }
}
