package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Multimodal

/** The two q181 paths the driver corpus can never reach (its byte-noise
  * images floor the adaptive clamp at B=16 and stay under the population
  * cap at every test SF): (1) a planted STRUCTURED-luminance corpus large
  * enough to drive the adaptive bucket count past 16, where the
  * arithmetic recall guarantee (jpeg mean shift < 1/B ⇒ the true pair
  * shares a probed bucket) must still hold exactly; (2) a planted
  * DEGENERATE corpus that trips the bucket-population gate, where every
  * touched jpeg must get ONE explicit NULL verdict — never a silently
  * incomplete top-k — while co-resident under-cap jpegs keep exact
  * results (q122's over-cap discipline, applied to retrieval). */
class Round18Q181GateSpec extends SparkSpec {
  import spark.implicits._

  /** Planted feature frame: (media_id, blocks, mean_lum). `blocks` is a
    * zero-mean ± pattern around `mean`, so mean_lum is exact. The 0.5
    * amplitude makes the minimum per-block separation between DISTINCT
    * patterns 0.5/97 ≈ 0.00515 — strictly above the 0.004 jpeg shift, so
    * the true pair (L1 = 8×0.004) beats every rival (≥ 8×0.00515) by
    * arithmetic, not luck. */
  private def features(rows: Seq[(Long, Double, Double)]): DataFrame =
    rows.map { case (id, mean, shift) =>
      val amp = Array.tabulate(4)(j => ((id * 31 + j * 17) % 97) / 97.0 * 0.5)
      val blocks = Array.tabulate(8)(b =>
        mean + shift + (if (b % 2 == 0) amp(b / 2) else -amp(b / 2)))
      (id, blocks, mean + shift)
    }.toDF("media_id", "blocks", "mean_lum")

  test("adaptiveBuckets clamps to [16, 96] and grows past 16 with the corpus") {
    assert(Multimodal.adaptiveBuckets(500) === 16)   // driver-scale floor
    assert(Multimodal.adaptiveBuckets(16 * 512) === 16)
    assert(Multimodal.adaptiveBuckets(16 * 512 + 1) === 17) // adaptive branch
    assert(Multimodal.adaptiveBuckets(8704) === 17)
    assert(Multimodal.adaptiveBuckets(10000000L) === 96)    // probe-window cap
  }

  test("structured-luminance corpus runs the adaptive B>16 path with recall@1 = 1.0") {
    val n = 8704
    val b = Multimodal.adaptiveBuckets(n)
    assert(b === 17, s"planted corpus must exceed the 16-bucket floor, got B=$b")
    // pngs spread uniformly over [0,1); jpegs are the same ids with a
    // +0.004 mean shift — below 1/17 ≈ 0.0588, so the true pair shares a
    // probed bucket by arithmetic. Same-pattern ids collide only mod 97,
    // whose mean spacing (97/n ≈ 0.0111) keeps every rival strictly
    // farther in L1 than the 0.004 own-pair shift.
    val ids = (0L until n.toLong)
    val pngs = features(ids.map(i => (i, (i + 0.5) / n, 0.0)))
    val jpgs = features(ids.map(i => (i, (i + 0.5) / n, 0.004)))
    val got = Multimodal.jpegNearDupFromFeatures(
        pngs, jpgs, k = 3, buckets = b, maxL1 = 0.04, maxBucket = 2000)
      .as[(Long, Long, Long, Double)].collect()
    val rank1 = got.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    assert(rank1.size === n, s"every jpeg must retrieve: ${rank1.size}/$n")
    val wrong = rank1.count { case (j, p) => j != p }
    assert(wrong === 0, s"recall@1 must be 1.0 at B=$b ($wrong misses)")
  }

  test("degenerate corpus trips the population gate loudly: NULL verdicts, no partial top-k") {
    // 60 pngs piled on mean 0.5 (one bucket at B=16) + 5 spread pngs in
    // buckets whose ±1 probe windows never touch the hot bucket.
    val hotIds = (1000L until 1060L)
    val spreadIds = Seq(0L, 2L, 4L, 12L, 14L)
    val pngs = features(
      hotIds.map(i => (i, 0.5, 0.0)) ++
        spreadIds.map(i => (i, (i + 0.5) / 16.0, 0.0)))
    val jpgs = features(
      hotIds.map(i => (i, 0.5, 0.004)) ++
        spreadIds.map(i => (i, (i + 0.5) / 16.0, 0.004)))
    val got = Multimodal.jpegNearDupFromFeatures(
        pngs, jpgs, k = 3, buckets = 16, maxL1 = 0.04, maxBucket = 50)
      .collect()
    // every hot jpeg: exactly one row, all-NULL verdict
    hotIds.foreach { j =>
      val rows = got.filter(_.getLong(0) == j)
      assert(rows.length === 1, s"jpeg $j must emit one unknown row")
      assert(rows.head.isNullAt(1) && rows.head.isNullAt(2) &&
        rows.head.isNullAt(3), s"jpeg $j verdict must be NULL, got ${rows.head}")
    }
    // every spread jpeg: exact retrieval unaffected by the exclusion
    spreadIds.foreach { j =>
      val rows = got.filter(_.getLong(0) == j)
      assert(rows.nonEmpty && rows.forall(!_.isNullAt(2)),
        s"jpeg $j must keep exact results")
      val r1 = rows.find(_.getLong(1) == 1L).get
      assert(r1.getLong(2) === j, s"jpeg $j rank-1 must be itself, got $r1")
    }
    // under the cap, the same corpus answers everything exactly
    val ungated = Multimodal.jpegNearDupFromFeatures(
        pngs, jpgs, k = 3, buckets = 16, maxL1 = 0.04, maxBucket = 2000)
      .collect()
    assert(ungated.forall(!_.isNullAt(2)))
    val r1 = ungated.filter(_.getLong(1) == 1L)
    assert(r1.length === hotIds.size + spreadIds.size)
    assert(r1.forall(r => r.getLong(0) == r.getLong(2)),
      "ungated rank-1 must be the true source for every jpeg")
  }
}
