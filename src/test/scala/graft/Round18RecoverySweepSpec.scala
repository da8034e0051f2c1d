package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.IvfIndex
import graft.streaming.SnapshotStore

/**
 * SECOND-ORDER crash sweep: the r17 sweeps enumerated every mutation of
 * the clean-template write paths, but recovery itself (reclaimDebris's
 * park-reconcile renames and staging-sweep deletes) only ever ran as the
 * un-instrumented tail of a recovery call — crash-DURING-recovery was
 * asserted idempotent, not proven. Here the templates are PRE-SEEDED with
 * exactly the debris reclaimDebris exists to handle:
 *
 *   - a TORN-SWAP park (`.park-cell=N` present, `cell=N` missing — the
 *     park is the cell's only copy; dropping it instead of restoring it
 *     is permanent data loss),
 *   - a TRASH park (`.park-cell=M` beside a live `cell=M` — the swap
 *     committed; restoring it over the live cell would resurrect stale
 *     rows),
 *   - orphaned `.ingest-staging-*` / `_temporary` dirs under live and a
 *     `.compacting-*` dir under the root,
 *
 * so the FIRST mutating ops of any writer entry are reclaim's own
 * renames/deletes, and the sweep injects a crash at each of them (then
 * at every later op of the cycle). Recovery re-enters the writer path,
 * i.e. reclaim runs AGAIN over whatever its crashed self left — the
 * crash-during-recovery case, now enumerated instead of assumed.
 */
class Round18RecoverySweepSpec extends SparkSpec with CrashSweepHarness {
  import spark.implicits._

  private val Lease = 1000L

  private def vec(cluster: Int, spread: Float): Array[Float] = {
    val a = Array.fill(4)(0f)
    a(cluster) = 10f
    a((cluster + 1) % 4) += spread
    a
  }
  private val corpusRows: Seq[(Long, Array[Float])] =
    for (c <- 0 until 4; j <- 0 until 6)
      yield ((c * 6 + j + 1).toLong, vec(c, 0.1f * j))

  private val updated: Map[Long, Array[Float]] = Map(
    1L -> vec(0, 0.77f),
    14L -> vec(3, 0.33f), // cluster 2 → 3; cluster 2 untouched by the batch
    25L -> vec(0, 0.55f),
    26L -> vec(1, 0.66f))
  private def batchDf =
    updated.toSeq.sortBy(_._1).toDF("vec_id", "embedding")

  private def ingest(root: String): Unit =
    IvfIndex.ingestBatch(s"$root/idx", Lease)(batchDf, 1L)

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

  private def liveRows(local: java.io.File)
      : Seq[(Long, Int, Seq[Double], Long)] = {
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

  private def assertClean(local: java.io.File): Unit = {
    val idx = new java.io.File(local, "idx")
    assert(!names(idx).exists(_.startsWith(".compacting-")),
      s"compact staging debris left under $idx: ${names(idx)}")
    names(idx).filter(n => n == "assignments" || n.startsWith("assignments_v="))
      .foreach { d =>
        val bad = names(new java.io.File(idx, d)).filter(n =>
          n.startsWith(".spark-staging-") || n == "_temporary" ||
            n.startsWith(".ingest-staging-") || n.startsWith(".park-"))
        assert(bad.isEmpty, s"recovery debris left under $idx/$d: $bad")
      }
  }

  /** Clean built index (no ingest yet), reused across debris templates. */
  private lazy val tplBuilt: java.io.File = {
    val tpl = Files.createTempDirectory("tpl-r18-build-").toFile
    InstrumentedFs.reset()
    val corpus = corpusRows.toDF("vec_id", "embedding")
    IvfIndex.save(IvfIndex.build(corpus, nCells = 4, fitSampleSize = 24),
      s"ifs://$tpl/idx")
    tpl
  }

  /** tplBuilt plus every debris species reclaimDebris handles, planted
    * with raw java.io ops (no InstrumentedFs counting — the debris is the
    * PRE-EXISTING state of a previously crashed writer). */
  private lazy val tplDebris: java.io.File = {
    val tpl = Files.createTempDirectory("tpl-r18-debris-").toFile
    copyTree(tplBuilt, tpl)
    val live = new java.io.File(tpl, "idx/assignments")
    assert(live.isDirectory, s"template layout changed: ${names(new java.io.File(tpl, "idx"))}")
    val cs = centroidsOf(tpl)
    val tornCell = nearestCell(cs, vec(2, 0f))   // untouched by the batch
    val trashCell = nearestCell(cs, vec(0, 0f))  // touched by the batch
    assert(tornCell !== trashCell)
    // torn swap: the park is the ONLY copy of cluster 2's cell
    val torn = new java.io.File(live, s"cell=$tornCell")
    assert(torn.isDirectory)
    assert(torn.renameTo(new java.io.File(live, s".park-cell=$tornCell")))
    // trash park: committed swap — live cell stays, the park must drop
    copyTree(new java.io.File(live, s"cell=$trashCell"),
      new java.io.File(live, s".park-cell=$trashCell"))
    // orphaned staging of every species
    def junk(dir: java.io.File): Unit = {
      assert(dir.mkdirs())
      Files.write(new java.io.File(dir, "garbage.bin").toPath,
        Array[Byte](1, 2, 3))
    }
    junk(new java.io.File(live, ".ingest-staging-r18seeded/cell=0"))
    junk(new java.io.File(live, "_temporary/0"))
    junk(new java.io.File(tpl, "idx/.compacting-r18seeded"))
    tpl
  }

  test("ingest from a debris-seeded index survives a crash at every point, reclaim included") {
    val swept = sweep("r18-ingest-debris", tplDebris,
      attempt = (root, _) => ingest(root),
      recover = (root, _) => retryLease(ingest(root)),
      invariant = (_, local) => {
        val cs = centroidsOf(local)
        val rows = liveRows(local)
        // the torn park was restored, never dropped: cluster 2's six
        // originals are all present (id 14's old row among them)
        assert(latestByVer(rows) === expectedLatest(cs),
          "latest-wins content diverged after debris recovery")
        val m = rows.groupBy(_._1).view.mapValues(_.size).toMap
        assert(m(14L) === 2, s"id 14 should carry old+new rows, got ${m(14L)}")
        assert((m - 14L).values.forall(_ === 1),
          s"unexpected duplicate rows: ${m.filter(p => p._2 > 1 && p._1 != 14L)}")
        assertClean(local)
      })
    info(s"r18 ingest-from-debris: $swept crash points swept green")
    // reclaim's own ops (2 park renames/deletes + 3 junk deletes) come
    // before the r17-swept ingest ops, so the count must exceed theirs
    assert(swept >= 15, s"suspiciously few crash points ($swept)")
  }

  test("compact from a debris-seeded index survives a crash at every point, reclaim included") {
    val swept = sweep("r18-compact-debris", tplDebris,
      attempt = (root, _) => IvfIndex.compact(spark, s"$root/idx", Lease),
      recover = (root, _) =>
        retryLease(IvfIndex.compact(spark, s"$root/idx", Lease)),
      invariant = (_, local) => {
        val cs = centroidsOf(local)
        val rows = liveRows(local)
        assert(rows.map(_._1).distinct.size === rows.size,
          "stale copies survived a completed compact")
        // no ingest ran: expected content is the BUILT corpus (ver 0),
        // including the torn-parked cell's six rows
        val base = corpusRows.map { case (id, e) =>
          id -> (nearestCell(cs, e), e.map(_.toDouble).toSeq, 0L)
        }.toMap
        assert(latestByVer(rows) === base, "compacted content diverged")
        assertClean(local)
      })
    info(s"r18 compact-from-debris: $swept crash points swept green")
    assert(swept >= 8, s"suspiciously few crash points ($swept)")
  }

  test("bucketed upsert from a trash-seeded table survives a crash at " +
    "every point, reconcile included") {
    // the IVF sweeps above cover IvfIndex.reclaimDebris; this covers the
    // OTHER recovery path — BucketedTable.reconcileTrash, the machinery
    // every upsert consumer (UpsertSink, JoinMv, MultiMv) shares. The
    // template is pre-seeded with both trash species a crashed swap can
    // leave: a DISPLACED bucket that is its content's only copy (crash
    // between rename-out and rename-in — dropping it is data loss) and a
    // SUPERSEDED bucket beside its live dir (crash before the trash
    // delete — restoring it would resurrect stale rows), plus stage
    // leftovers; reconcile's own renames/deletes are the first swept ops.
    import graft.streaming.UpsertSink
    val keys = Seq("k")
    def apply(root: String, rows: Seq[(Int, String, Long, Boolean)]): Unit =
      UpsertSink.upsertBucketed(rows.toDF("k", "v", "ver", "del"),
        s"$root/tbl", keys, "ver", deleteCol = Some("del"), nBuckets = 4)

    val batch1 = (1 to 12).map(k => (k, "v1", 1L, false))
    val batch2 = Seq((1, "v2", 2L, false), (5, "v2", 2L, false),
      (9, "v2", 2L, false), (13, "v2", 2L, false), (2, "gone", 2L, true))
    val expected = ((3 to 12).filter(_ != 5).filter(_ != 9).map(k => (k, "v1")) ++
      Seq((1, "v2"), (5, "v2"), (9, "v2"), (13, "v2"))).toSet

    val tpl = Files.createTempDirectory("tpl-r18-trash-").toFile
    InstrumentedFs.reset()
    apply(s"ifs://$tpl", batch1)
    // seed the debris with raw java.io ops (pre-existing crashed-writer
    // state, not counted by the sweep)
    val tbl = new java.io.File(tpl, "tbl")
    val trash = new java.io.File(tpl, "tbl__old")
    val liveBuckets = names(tbl).filter(_.startsWith("__bucket="))
    assert(liveBuckets.size >= 2, s"template too small: ${names(tbl)}")
    val tornB = liveBuckets.head.stripPrefix("__bucket=")
    val supersededB = liveBuckets.last.stripPrefix("__bucket=")
    assert(trash.mkdirs())
    // displaced-only copy: the live dir moves OUT (reconcile must restore)
    assert(new java.io.File(tbl, s"__bucket=$tornB")
      .renameTo(new java.io.File(trash, tornB)))
    // superseded: live dir stays (reconcile must drop the trash copy)
    copyTree(new java.io.File(tbl, s"__bucket=$supersededB"),
      new java.io.File(trash, supersededB))
    val stage = new java.io.File(tpl, "tbl__stage/__bucket=0")
    assert(stage.mkdirs())
    Files.write(new java.io.File(stage, "garbage.bin").toPath,
      Array[Byte](1, 2, 3))

    val swept = sweep("r18-bucketed-trash", tpl,
      attempt = (root, _) => apply(root, batch2),
      recover = (root, _) => apply(root, batch2),
      invariant = (root, local) => {
        val got = spark.read.parquet(s"$root/tbl")
          .select("k", "v").as[(Int, String)].collect().toSet
        assert(got === expected,
          "content diverged after trash-seeded recovery (displaced bucket " +
            "dropped, or superseded bucket resurrected)")
        assert(names(new java.io.File(local, "tbl__old")).isEmpty,
          "trash left unreconciled after a completed replay")
        assert(!new java.io.File(local, "tbl__stage").exists() ||
          names(new java.io.File(local, "tbl__stage")).isEmpty)
      })
    info(s"r18 bucketed-from-trash: $swept crash points swept green")
    assert(swept >= 10, s"suspiciously few crash points ($swept)")
  }

  test("load under a held lease warns loudly on a torn park; a plain load " +
    "with the lease free auto-heals it with no operator action") {
    val tpl = Files.createTempDirectory("tpl-r18-torn-").toFile
    copyTree(tplDebris, tpl)
    val root = s"ifs://$tpl/idx"
    // a LIVE writer holds the lease: the reader cannot reconcile (the
    // non-blocking acquire throws), so it keeps the r18 warn-only path —
    // smaller corpus served loudly, read never blocked on the lease
    SnapshotStore.withWriterLock(spark, root, 60000L) {
      IvfIndex.tornParkWarnings.set(0)
      IvfIndex.tornParkAutoHeals.set(0)
      val before = IvfIndex.load(spark, root)
      assert(IvfIndex.tornParkWarnings.get() === 1L,
        "with the lease held, a torn park must warn the reader loudly")
      assert(IvfIndex.tornParkAutoHeals.get() === 0L,
        "a reader must never reconcile while a writer holds the lease")
      // the torn cell's 6 rows are invisible to this lock-free reader
      assert(before.assignments.count() === 18L)
    }
    // lease free: the NEXT plain load heals the crashed manual compact's
    // debris itself (r19 — the r18 gap was exactly this unbounded wait
    // for an operator to act on the warning)
    IvfIndex.tornParkWarnings.set(0)
    IvfIndex.tornParkAutoHeals.set(0)
    val after = IvfIndex.load(spark, root)
    assert(IvfIndex.tornParkAutoHeals.get() === 1L,
      "a plain load with the lease free must auto-heal the torn park")
    assert(IvfIndex.tornParkWarnings.get() === 0L,
      "a healed load must not also warn")
    assert(after.assignments.count() === 24L,
      "the auto-heal must restore the parked cell's rows")
    // steady state: the next load finds nothing to do
    val again = IvfIndex.load(spark, root)
    assert(IvfIndex.tornParkAutoHeals.get() === 1L && again.assignments.count() === 24L)
    assertClean(tpl)
  }
}
