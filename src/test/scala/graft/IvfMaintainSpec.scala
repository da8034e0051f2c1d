package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Streaming IVF index maintenance: assignment parity with the build,
  * O(delta) cell-directory writes, latest-wins updates, and compaction of
  * cross-cell moves. */
class IvfMaintainSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")

  test("assignCells matches the built index's KMeans assignment") {
    val idx = IvfIndex.build(corpus, nCells = 8)
    val viaExpr = IvfIndex.assignCells(
      corpus.select($"vec_id", $"embedding"), idx.centroids)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val viaModel = idx.assignments
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(viaExpr === viaModel)
    assert(viaExpr.nonEmpty)
  }

  test("streamed vectors join the index; untouched cells stay byte-identical") {
    val path = Files.createTempDirectory("ivf-m").toString + "/idx"
    val ckpt = Files.createTempDirectory("ivf-m-ckpt").toString
    val base = corpus.filter($"vec_id" < 300L)
    IvfIndex.save(IvfIndex.build(base, nCells = 8), path)

    val rest = corpus.filter($"vec_id" >= 300L)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    // pick an untouched cell: one whose members all come from the base set
    val loaded0 = IvfIndex.load(spark, path)
    val restCells = IvfIndex.assignCells(
      rest.toSeq.toDF("vec_id", "embedding"), loaded0.centroids)
      .select($"cell").distinct().as[Int].collect().toSet
    val allCells = loaded0.assignments.select($"cell").distinct()
      .as[Int].collect().toSet
    val untouched = (allCells -- restCells).headOption
    def cellFiles(c: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$path/assignments/cell=$c")
      if (!d.exists) Map.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length, f.lastModified))).toMap
    }
    val before = untouched.map(cellFiles)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = IvfIndex.maintain(
      input.toDF().toDF("vec_id", "embedding"), path, ckpt)
    try {
      input.addData(rest.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val after = IvfIndex.load(spark, path)
    val ids = after.assignments.select($"vec_id").as[Long].collect().toSet
    assert(ids === corpus.select($"vec_id").as[Long].collect().toSet)
    // a streamed vector is its own exact-cosine nearest neighbor
    val probe = corpus.filter($"vec_id" === rest.head._1)
      .select($"vec_id".as("query_id"),
        graft.functions.VectorFunctions.toDoubles($"embedding").as("q_emb"),
        graft.functions.VectorFunctions.l2Norm($"embedding").as("q_norm"))
    val top = IvfIndex.query(after, probe, k = 1, nProbe = 2)
      .select($"neighbor_id", $"score").as[(Long, Double)].head()
    assert(top._1 === rest.head._1 && math.abs(top._2 - 1.0) < 1e-12)
    untouched.foreach(c => assert(cellFiles(c) === before.get))
  }

  test("same-cell re-ingest replaces; cross-cell move is healed by compact") {
    val path = Files.createTempDirectory("ivf-c").toString + "/idx"
    val ckpt = Files.createTempDirectory("ivf-c-ckpt").toString
    IvfIndex.save(IvfIndex.build(corpus, nCells = 8), path)
    val loaded = IvfIndex.load(spark, path)

    val cellOf = IvfIndex.assignCells(
      corpus.select($"vec_id", $"embedding"), loaded.centroids)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    // The ids are chosen to satisfy the scenario's OWN preconditions
    // (formerly hardcoded 0/1, which only worked under one centroid
    // layout): the stale-copy assertion below needs vB's old cell to stay
    // UNTOUCHED by this batch — ingestBatch's latest-wins anti-join heals
    // an ingested id's stale row whenever its old cell happens to be
    // touched — so vA, vB, and the donor must sit in three distinct cells.
    val vA = cellOf.keys.min // same-cell re-ingest: own embedding
    val vB = cellOf.keys.filter(k => cellOf(k) != cellOf(vA)).min
    val donor = cellOf.keys
      .filter(k => cellOf(k) != cellOf(vB) && cellOf(k) != cellOf(vA)).min
    val vAEmb = corpus.filter($"vec_id" === lit(vA))
      .select($"embedding").as[Seq[Float]].head()
    val vDonor = corpus.filter($"vec_id" === lit(donor))
      .select($"embedding").as[Seq[Float]].head()

    val input = MemoryStream[(Long, Seq[Float])]
    val q = IvfIndex.maintain(
      input.toDF().toDF("vec_id", "embedding"), path, ckpt)
    try {
      input.addData((vA, vAEmb), (vB, vDonor))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(s"$path/assignments")
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    assert(rows.count(_._1 == vA) === 1) // same-cell replace, no dup
    assert(rows.count(_._1 == vB) === 2) // stale copy documented pre-compact
    IvfIndex.compact(spark, path)
    // compact publishes a NEW generation dir; resolve like a reader would
    val afterC = spark.read.parquet(IvfIndex.assignmentsDir(spark, path))
      .select($"vec_id", $"cell").as[(Long, Int)].collect()
    assert(afterC.count(_._1 == vB) === 1)
    assert(afterC.find(_._1 == vB).get._2 === cellOf(donor)) // latest cell won
    assert(afterC.length === afterC.map(_._1).distinct.length)
  }

  test("a reader looping during repeated compacts never sees a missing dir") {
    val path = Files.createTempDirectory("ivf-r").toString + "/idx"
    val small = corpus.filter($"vec_id" < 200L)
    IvfIndex.save(IvfIndex.build(small, nCells = 4), path)
    val expected = small.count()

    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          // full reader path: resolve generation, read, count — compaction
          // is a semantic no-op, so the count must never change either
          val n = IvfIndex.load(spark, path).assignments.count()
          if (n != expected)
            failure = Some(new AssertionError(s"saw $n rows, expected $expected"))
        } catch { case t: Throwable => failure = Some(t) }
      }
    }, "ivf-compact-reader")
    reader.start()
    try (1 to 3).foreach(_ => IvfIndex.compact(spark, path))
    finally { stop = true; reader.join(30000) }
    failure.foreach(t => fail(s"reader failed during compact: $t", t))
    // generations pruned with one-gen grace: at most live + previous remain
    val gens = new java.io.File(path).listFiles.map(_.getName)
      .filter(n => n == "assignments" || n.startsWith("assignments_v="))
    assert(gens.length <= 2, s"stale generations not pruned: ${gens.mkString(", ")}")
  }

  test("write-side single-writer is enforced: ingest/compact conflict loudly") {
    val path = Files.createTempDirectory("ivf-x").toString + "/idx"
    val small = corpus.filter($"vec_id" < 100L)
    IvfIndex.save(IvfIndex.build(small, nCells = 4), path)
    val rows = small.count()
    // a competing writer holds the index lease (lock held for the body's
    // duration) — both mutators must THROW, never write into a generation
    // the lock holder may be about to prune
    graft.streaming.SnapshotStore.withWriterLock(spark, path) {
      val c = intercept[Exception](IvfIndex.compact(spark, path))
      assert(c.getMessage.contains("another writer holds"), c.getMessage)
      val batch = small.limit(5).select($"vec_id", $"embedding")
      val i = intercept[Exception](IvfIndex.ingestBatch(path)(batch, 7L))
      assert(i.getMessage.contains("another writer holds"), i.getMessage)
    }
    // nothing was dropped or half-written: index content unchanged
    assert(IvfIndex.load(spark, path).assignments.count() === rows)
    // and once the lease is free, both mutators proceed
    IvfIndex.ingestBatch(path)(
      corpus.filter($"vec_id" >= 100L && $"vec_id" < 110L)
        .select($"vec_id", $"embedding"), 8L)
    IvfIndex.compact(spark, path)
    assert(IvfIndex.load(spark, path).assignments.count() === rows + 10L)
  }

  test("deleteVectors forgets ids, drops emptied cells, refuses a full wipe") {
    val path = Files.createTempDirectory("ivf-d").toString + "/idx"
    IvfIndex.save(IvfIndex.build(corpus, nCells = 8), path)
    val before = IvfIndex.load(spark, path).assignments
    val total = before.count()
    val victims = before.select($"vec_id").as[Long].take(3).toSeq

    // absent ids: a no-op that reports zero
    assert(IvfIndex.deleteVectors(spark, path, Seq(-1L, -2L)) === 0L)
    assert(IvfIndex.load(spark, path).assignments.count() === total)

    assert(IvfIndex.deleteVectors(spark, path, victims) === 3L)
    val after = IvfIndex.load(spark, path).assignments
    assert(after.count() === total - 3L)
    assert(after.filter($"vec_id".isin(victims: _*)).isEmpty)
    // the query surface forgot them too
    val q = IvfIndex.query(IvfIndex.load(spark, path),
      corpus.filter($"vec_id" === victims.head)
        .select($"vec_id".as("query_id"),
          graft.functions.VectorFunctions.toDoubles($"embedding").as("q_emb"),
          graft.functions.VectorFunctions.l2Norm($"embedding").as("q_norm")),
      k = 10, nProbe = 8, excludeSelf = false)
    assert(q.filter($"neighbor_id".isin(victims: _*)).isEmpty)

    // emptying a whole cell drops its directory but keeps the index sound
    val someCell = after.groupBy($"cell").count()
      .orderBy($"count".asc).select($"cell").head().getInt(0)
    val cellIds = after.filter($"cell" === someCell)
      .select($"vec_id").as[Long].collect().toSeq
    assert(IvfIndex.deleteVectors(spark, path, cellIds) === cellIds.length.toLong)
    val after2 = IvfIndex.load(spark, path).assignments
    assert(after2.count() === total - 3L - cellIds.length)
    assert(after2.filter($"cell" === someCell).isEmpty)

    // wiping everything is refused loudly
    val rest = after2.select($"vec_id").as[Long].collect().toSeq
    val e = intercept[IllegalArgumentException] {
      IvfIndex.deleteVectors(spark, path, rest)
    }
    assert(e.getMessage.contains("rebuild"))
    assert(IvfIndex.load(spark, path).assignments.count() === after2.count())
  }
}
