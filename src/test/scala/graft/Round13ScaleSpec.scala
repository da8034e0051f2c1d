package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Round-13 scale-posture fixes: q239 and q171 routed through size-gated
  * candidate generation (the two r12-verdict scale-killers), with the
  * same arm-equivalence + no-corpus-broadcast plan assertions that pinned
  * q183 in Round12ScaleSpec. Lives in graft.operators to reach the
  * private[operators] shared provider. */
class Round13ScaleSpec extends SparkSpec {
  import spark.implicits._

  // --- q239 neighborhood purity --------------------------------------

  test("q239 IVF arm with full probing is bit-equal to the brute-force arm") {
    // bruteForceMax = 0 forces the scaled arm; nProbe = nCells probes every
    // cell, so the candidate set is all pairs and the purity rollup must
    // match the exact brute-force arm bit for bit.
    val brute = Similarity.q239NeighborhoodPurity(spark, sf)
      .as[(Int, Long, Long, Double)].collect().toSet
    val scaled = Similarity.q239NeighborhoodPurity(spark, sf,
      bruteForceMax = 0L, nCells = 8, nProbe = 8)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(scaled === brute)
    assert(brute.nonEmpty)
  }

  test("q239 scaled arm broadcasts only the centroid table") {
    val df = Similarity.q239NeighborhoodPurity(spark, sf,
      bruteForceMax = 0L, nCells = 8, nProbe = 4)
    val lp = df.queryExecution.optimizedPlan.toString
    assert(lp.contains("Cross"), s"IVF arm not taken:\n$lp")
    val hints = "strategy=broadcast".r.findAllIn(lp).length
    assert(hints == 1, s"expected centroid-only broadcast hint, got $hints:\n$lp")
    assert(lp.contains("LocalRelation"), s"hint not on centroid table:\n$lp")
  }

  test("q239 brute arm is taken under the gate (no IVF machinery)") {
    val df = Similarity.q239NeighborhoodPurity(spark, sf)
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("Cross"), "IVF centroid cross join under the gate")
  }

  // --- q171 bitext MNN ------------------------------------------------

  test("q171 IVF arm with full probing is bit-equal to the brute-force arm") {
    val brute = Similarity.q171BitextMnn(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val scaled = Similarity.q171BitextMnn(spark, sf,
      bruteForceMax = 0L, nCells = 8, nProbe = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(scaled === brute)
    assert(brute.nonEmpty)
  }

  test("q171 scaled-arm candidate pairs broadcast no corpus-derived frame") {
    // The candidate generator's own plan (pre-truncation it is the only
    // stage that touches corpus×corpus): the cell joins must be hint-free
    // shuffle joins. The centroid broadcast lives behind the probes
    // materialization; nothing in the pair plan carries a broadcast hint.
    val e = Tables.embeddings(spark, sf)
    val pairs = Similarity.cellBlockedCrossScores(
      e, col("label") % 2 === 0, nCells = 8, nProbe = 4)
    val lp = pairs.queryExecution.optimizedPlan.toString
    assert(lp.contains("Union"), s"two-direction union missing:\n$lp")
    assert(!lp.contains("strategy=broadcast"),
      s"broadcast hint on a corpus-derived frame:\n$lp")
  }

  test("q171 candidate set is direction-symmetric at partial probing") {
    // A pair found by either direction must appear exactly once, and both
    // directions' scored pairs must agree — first() dedup is sound only
    // because cosine is direction-independent bit-for-bit.
    val e = Tables.embeddings(spark, sf)
    val pairs = Similarity.cellBlockedCrossScores(
      e, col("label") % 2 === 0, nCells = 8, nProbe = 2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "pair-keyed dedup failed")
    // cross-side only: side A = even labels
    val side = e.select(col("vec_id"), (col("label") % 2 === 0).as("s"))
      .as[(Long, Boolean)].collect().toMap
    assert(pairs.forall(p => side(p._1) && !side(p._2)),
      "a same-side or swapped-side pair leaked through")
  }
}
