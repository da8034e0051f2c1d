package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-12 scale-posture fixes: q183's size-gated candidate generation
  * (no corpus-sized broadcast past the gate) and its arm equivalence. */
class Round12ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("q183 IVF arm with full probing is bit-equal to the brute-force arm") {
    // bruteForceMax = 0 forces the scaled arm; nProbe = nCells probes every
    // cell, so the candidate set is all pairs and the result must match the
    // exact brute-force arm bit for bit (same vote, same tie-break).
    val brute = Similarity.q183KnnClassify(spark, sf)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSet
    val scaled = Similarity.q183KnnClassify(spark, sf,
      bruteForceMax = 0L, nCells = 8, nProbe = 8)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSet
    assert(scaled === brute)
    assert(brute.nonEmpty)
  }

  test("q183 scaled arm forces no broadcast on any corpus-derived frame") {
    val df = Similarity.q183KnnClassify(spark, sf,
      bruteForceMax = 0L, nCells = 8, nProbe = 4)
    val lp = df.queryExecution.optimizedPlan.toString
    // the scaled arm was taken: the centroid probe is the only cross join
    assert(lp.contains("Cross"), s"IVF arm not taken:\n$lp")
    // the ONLY broadcast HINT is the nCells-row centroid LocalRelation; the
    // cell join and both label joins must be hint-free (stats/AQE may still
    // broadcast them at tiny sf — that is size-adaptive and scale-safe; a
    // forced hint on a corpus-sized side is not)
    val hints = "strategy=broadcast".r.findAllIn(lp).length
    assert(hints == 1, s"expected centroid-only broadcast hint, got $hints:\n$lp")
    assert(lp.contains("LocalRelation"), s"hint not on centroid table:\n$lp")
  }

  test("q183 brute arm is taken under the gate (no IVF machinery)") {
    val df = Similarity.q183KnnClassify(spark, sf) // default gate ≫ sf0.001
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("Cross"), "IVF centroid cross join under the gate")
  }
}
