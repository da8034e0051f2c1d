package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.IvfIndex
import graft.streaming.SnapshotStore

/**
 * Crash-point enumeration over the IVF index's file CRUD — the same
 * [[CrashSweepHarness]] discipline as the snapshot/bucketed/oracle cycles
 * (B74), applied to the index the similarity surface persists through
 * ([[IvfIndex.ingestBatch]] / [[IvfIndex.compact]] /
 * [[IvfIndex.deleteVectors]]): every mutating op of one cycle is a tested
 * crash point, recovery follows each operation's documented path (the
 * streaming batch replays; compact and delete re-run), and the
 * post-recovery invariants assert content (latest-wins rows exact),
 * multiplicity (stale cross-cell copies where the contract says so, and
 * nowhere else), and hygiene (no staging debris of any generation).
 *
 * The corpus is 4 well-separated axis clusters so the seeded quantizer's
 * geometry is deterministic; expected cells are recomputed from the SAVED
 * centroids (driver-side nearest-centroid over ≤26 vectors), never
 * hard-coded against KMeans' arbitrary cell numbering.
 */
class IvfCrashSweepSpec extends SparkSpec with CrashSweepHarness {
  import spark.implicits._

  private val Lease = 1000L // floor: fast corpse takeover in the sweep

  // ---- deterministic corpus: 4 axis clusters × 6 members, dim 4 ----
  private def vec(cluster: Int, spread: Float): Array[Float] = {
    val a = Array.fill(4)(0f)
    a(cluster) = 10f
    a((cluster + 1) % 4) += spread
    a
  }
  private val corpusRows: Seq[(Long, Array[Float])] =
    for (c <- 0 until 4; j <- 0 until 6)
      yield ((c * 6 + j + 1).toLong, vec(c, 0.1f * j))

  // the ingest batch: one in-cell update, one cross-cell move whose OLD
  // cell the batch does not touch (the only way a stale copy can remain —
  // a touched old cell is rewritten without the moved id), two inserts
  private val updated: Map[Long, Array[Float]] = Map(
    1L -> vec(0, 0.77f), // id 1: cluster 0 → cluster 0 (in-cell replace)
    14L -> vec(3, 0.33f), // id 14: cluster 2 → cluster 3; cluster 2 untouched
    25L -> vec(0, 0.55f), // new
    26L -> vec(1, 0.66f)) // new
  private def batchDf =
    updated.toSeq.sortBy(_._1).toDF("vec_id", "embedding")

  private def ingest(root: String): Unit =
    IvfIndex.ingestBatch(s"$root/idx", Lease)(batchDf, 1L)

  /** Retry through the crashed attempt's decaying writer lease. */
  private def retryLease[T](body: => T): T = {
    val deadline = System.currentTimeMillis() + 30000
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return body
      catch {
        case e: SnapshotStore.ConcurrentPublishException =>
          last = e; Thread.sleep(150)
      }
    }
    throw last
  }

  // ---- expected-state math from the SAVED centroids ----
  private def centroidsOf(local: java.io.File): Map[Int, Array[Double]] =
    spark.read.parquet(s"ifs://$local/idx/centroids")
      .select(col("cell"), col("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

  private def nearestCell(cs: Map[Int, Array[Double]],
      e: Array[Float]): Int =
    cs.toSeq.map { case (c, cen) =>
      val d = cen.indices.map(i => (e(i) - cen(i)) * (e(i) - cen(i))).sum
      (d, c)
    }.min._2

  /** (vec_id, cell, emb, __ver) rows of the live assignments. */
  private def liveRows(local: java.io.File): Seq[(Long, Int, Seq[Double], Long)] = {
    val dir = IvfIndex.assignmentsDir(spark, s"ifs://$local/idx")
    spark.read.parquet(dir)
      .select(col("vec_id"), col("cell"), col("emb"), col("__ver"))
      .as[(Long, Int, Seq[Double], Long)].collect().toSeq
  }

  private def latestByVer(rows: Seq[(Long, Int, Seq[Double], Long)])
      : Map[Long, (Int, Seq[Double], Long)] =
    rows.groupBy(_._1).map { case (id, rs) =>
      val r = rs.maxBy(_._4); id -> (r._2, r._3, r._4)
    }

  private def expectedLatest(cs: Map[Int, Array[Double]])
      : Map[Long, (Int, Seq[Double], Long)] = {
    val base = corpusRows.map { case (id, e) =>
      id -> (nearestCell(cs, e), e.map(_.toDouble).toSeq, 0L)
    }.toMap
    base ++ updated.map { case (id, e) =>
      id -> (nearestCell(cs, e), e.map(_.toDouble).toSeq, 1L)
    }
  }

  private def assertNoDebris(local: java.io.File): Unit = {
    val idx = new java.io.File(local, "idx")
    assert(!names(idx).exists(_.startsWith(".compacting-")),
      s"compact staging debris left under $idx: ${names(idx)}")
    names(idx).filter(n => n == "assignments" || n.startsWith("assignments_v="))
      .foreach { d =>
        val bad = names(new java.io.File(idx, d)).filter(n =>
          n.startsWith(".spark-staging-") || n == "_temporary" ||
            n.contains("__old"))
        assert(bad.isEmpty, s"overwrite debris left under $idx/$d: $bad")
      }
  }

  // templates built once, byte-copied per crash point
  private lazy val tplBuilt: java.io.File = {
    val tpl = Files.createTempDirectory("tpl-ivf-build-").toFile
    InstrumentedFs.reset()
    val corpus = corpusRows.toDF("vec_id", "embedding")
    IvfIndex.save(IvfIndex.build(corpus, nCells = 4, fitSampleSize = 24),
      s"ifs://$tpl/idx")
    // premises of the cycles below, recomputed rather than assumed:
    // id 14's update really moves cells, id 1's really doesn't, and the
    // batch touches NO cell of cluster 2 (else id 14's old row would be
    // legitimately rewritten away and no stale copy could remain)
    val cs = centroidsOf(tpl)
    val oldCell14 = nearestCell(cs, corpusRows.find(_._1 == 14L).get._2)
    assert(nearestCell(cs, updated(14L)) !== oldCell14)
    assert(nearestCell(cs, updated(1L)) ===
      nearestCell(cs, corpusRows.find(_._1 == 1L).get._2))
    assert(!updated.values.exists(e => nearestCell(cs, e) == oldCell14))
    tpl
  }

  private lazy val tplIngested: java.io.File = {
    val tpl = Files.createTempDirectory("tpl-ivf-ingested-").toFile
    InstrumentedFs.reset()
    copyTree(tplBuilt, tpl)
    ingest(s"ifs://$tpl")
    tpl
  }

  test("IVF ingest batch survives a crash at every mutation point (replay)") {
    val swept = sweep("ivf-ingest", tplBuilt,
      attempt = (root, _) => ingest(root),
      recover = (root, _) => retryLease(ingest(root)), // streaming replay
      invariant = (_, local) => {
        val cs = centroidsOf(local)
        val rows = liveRows(local)
        assert(latestByVer(rows) === expectedLatest(cs),
          "latest-wins content diverged after replay")
        // multiplicity: the cross-cell move leaves its ONE documented
        // stale copy (old cell untouched by this batch); everything else
        // is single-row
        val m = rows.groupBy(_._1).view.mapValues(_.size).toMap
        assert(m(14L) === 2, s"id 14 should carry old+new rows, got ${m(14L)}")
        assert((m - 14L).values.forall(_ === 1),
          s"unexpected duplicate rows: ${m.filter(p => p._2 > 1 && p._1 != 14L)}")
        assertNoDebris(local)
      })
    info(s"ivf ingest: $swept crash points swept green")
    assert(swept >= 10, s"suspiciously few crash points ($swept)")
  }

  test("IVF compact survives a crash at every mutation point (re-run)") {
    val swept = sweep("ivf-compact", tplIngested,
      attempt = (root, _) => IvfIndex.compact(spark, s"$root/idx", Lease),
      recover = (root, _) =>
        retryLease(IvfIndex.compact(spark, s"$root/idx", Lease)),
      invariant = (_, local) => {
        val cs = centroidsOf(local)
        val rows = liveRows(local)
        // compact's whole contract: ONE row per vec_id, the latest
        assert(rows.map(_._1).distinct.size === rows.size,
          "stale copies survived a completed compact")
        assert(latestByVer(rows) === expectedLatest(cs),
          "compacted content diverged")
        assertNoDebris(local)
      })
    info(s"ivf compact: $swept crash points swept green")
    assert(swept >= 5, s"suspiciously few crash points ($swept)")
  }

  test("IVF delete survives a crash at every mutation point (re-run), emptied cell included") {
    // delete one WHOLE cluster — cluster 2 includes id 14, whose stale
    // copy sits in the emptied cell while its live row sits in cluster
    // 3's cell, so the delete exercises the touched-cell rewrite (cell of
    // cluster 3), the stale-copy removal, AND the emptied-directory drop
    val cs = centroidsOf(tplIngested)
    val clusterCell = nearestCell(cs, vec(2, 0f))
    val clusterIds = corpusRows
      .filter { case (_, e) => nearestCell(cs, e) == clusterCell }
      .map(_._1)
    assert(clusterIds.size === 6, s"premise: one full cluster, got $clusterIds")
    assert(clusterIds.contains(14L))
    val doomed = clusterIds.sorted
    def del(root: String): Long =
      IvfIndex.deleteVectors(spark, s"$root/idx", doomed.toDF("vec_id"),
        Lease)

    val swept = sweep("ivf-delete", tplIngested,
      attempt = (root, _) => { del(root); () },
      recover = (root, _) => retryLease { del(root); () },
      invariant = (_, local) => {
        val rows = liveRows(local)
        assert(rows.map(_._1).toSet.intersect(doomed.toSet).isEmpty,
          "deleted ids still present after recovery")
        val kept = expectedLatest(centroidsOf(local)) -- doomed
        assert(latestByVer(rows) === kept, "surviving rows diverged")
        // the emptied cell's directory is gone (dynamic overwrite cannot
        // drop it; the explicit delete must have, before or after replay)
        val dir = new java.io.File(
          IvfIndex.assignmentsDir(spark, s"ifs://$local/idx")
            .stripPrefix("ifs://"))
        assert(!names(dir).contains(s"cell=$clusterCell"),
          s"emptied cell dir survived: ${names(dir)}")
        assertNoDebris(local)
      })
    info(s"ivf delete: $swept crash points swept green")
    assert(swept >= 5, s"suspiciously few crash points ($swept)")
  }
}
