package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CurationPipeline, SnapshotStore}

/** End-to-end streaming curation: normalize → repetition-filter → dedup →
  * versioned snapshot epochs, with batch-operator parity for the map-only
  * prefix. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("curatedColumns agrees with the q70 normalization on real docs") {
    val batch = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val viaPipeline = CurationPipeline.curatedColumns(batch)
      .select($"doc_id", $"norm_text").as[(Long, String)].collect().toMap
    val viaQ70 = graft.operators.TextAnalysis.q70Normalize(spark, sf)
      .select($"doc_id", $"norm_text").as[(Long, String)].collect().toMap
    assert(viaPipeline === viaQ70)
  }

  test("curatedColumns keep flag agrees with q64 at the same thresholds") {
    // q64 scores the RAW text; feed the pipeline pre-normalized docs so
    // both predicates see identical input (real docs are already clean)
    val batch = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val viaPipeline = CurationPipeline
      .curatedColumns(batch, maxTopFrac = 0.1, minDistinctRatio = 0.4)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val viaQ64 = graft.operators.TextAnalysis.q64RepetitionFilter(spark, sf)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(viaPipeline === viaQ64)
    assert(viaPipeline.values.exists(identity))
  }

  test("streaming curation dedups, filters junk, and publishes epochs") {
    val base = Files.createTempDirectory("cur").toString + "/t"
    val ckpt = Files.createTempDirectory("cur-ckpt").toString
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "sec")
      .select($"doc_id", $"text", timestamp_seconds($"sec").as("ts"))
    val q = CurationPipeline.start(docs, base, ckpt)
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the dog", 1000L),
        (2L, "The  Quick   Brown fox jumps over the dog", 1001L), // dup of 1 after normalize
        (3L, "spam spam spam spam spam spam spam spam", 1002L), // repetition junk
        (4L, "an entirely different document body here", 1003L))
      q.processAllAvailable()
      val v1 = SnapshotStore.latestVersion(spark, base).get
      val s1 = SnapshotStore.readSnapshot(spark, base)
        .select($"norm_text").as[String].collect().toSet
      // dup collapsed to one normalized form; junk gone; both texts normalized
      assert(s1 === Set(
        "the quick brown fox jumps over the dog",
        "an entirely different document body here"))

      input.addData(
        (5L, "the quick brown fox jumps over the dog", 1010L), // still in horizon
        (6L, "a second batch contributes this new doc", 1011L))
      q.processAllAvailable()
      val v2 = SnapshotStore.latestVersion(spark, base).get
      assert(v2 > v1)
      val s2 = SnapshotStore.readSnapshot(spark, base)
        .select($"norm_text").as[String].collect().toSet
      assert(s2 === s1 + "a second batch contributes this new doc")
      // pinned read of the first epoch still sees the pre-batch-2 corpus
      assert(SnapshotStore.readSnapshot(spark, base, Some(v1))
        .select($"norm_text").as[String].collect().toSet === s1)
    } finally q.stop()
  }

  test("in-stream mixing and split labels match the batch expressions") {
    val base = Files.createTempDirectory("curm").toString + "/t"
    val ckpt = Files.createTempDirectory("curm-ckpt").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "source", "sec")
      .select($"doc_id", $"text", $"source", timestamp_seconds($"sec").as("ts"))
    val rates = Map("keep_all" -> 1.0, "drop_all" -> 0.0)
    val q = CurationPipeline.start(docs, base, ckpt,
      mixRates = Some((rates, 0.5)), splitFracs = Some((0.1, 0.1)))
    try {
      val rows = (1L to 40L).map(i =>
        (i, s"document number $i with its own distinct body text",
          if (i <= 10) "keep_all" else if (i <= 20) "drop_all" else "mixed",
          1000L + i))
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = SnapshotStore.readSnapshot(spark, base)
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      // batch-expression expectation over the same input
      val batchDocs = rows.toDF("doc_id", "text", "source", "sec")
      val expectIds = batchDocs
        .filter(graft.operators.Corpus.mixKeepExpr($"doc_id", $"source", rates, 0.5))
        .select($"doc_id").as[Long].collect().toSet
      assert(got.keySet === expectIds)
      assert((1L to 10L).forall(got.contains))   // rate 1.0 all kept
      assert((11L to 20L).forall(!got.contains(_))) // rate 0.0 all dropped
      val expectSplit = batchDocs
        .select($"doc_id", graft.operators.Corpus.splitExpr($"doc_id", 0.1, 0.1).as("s"))
        .as[(Long, String)].collect().toMap
      got.foreach { case (id, s) => assert(s === expectSplit(id)) }
    } finally q.stop()
  }

  test("curation pipeline resumes from its checkpoint without re-publishing") {
    val base = Files.createTempDirectory("curr").toString + "/t"
    val ckpt = Files.createTempDirectory("curr-ckpt").toString
    val input = MemoryStream[(Long, String, Long)]
    def frame = input.toDF().toDF("doc_id", "text", "sec")
      .select($"doc_id", $"text", timestamp_seconds($"sec").as("ts"))
    val q1 = CurationPipeline.start(frame, base, ckpt)
    try {
      input.addData((1L, "one document before the restart", 1000L))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = SnapshotStore.readSnapshot(spark, base)
      .select($"doc_id").as[Long].collect().toSet
    assert(afterFirst === Set(1L))
    // restart from the same checkpoint: prior batch is not replayed into a
    // regressed epoch; new data lands in a NEW epoch
    val q2 = CurationPipeline.start(frame, base, ckpt)
    try {
      input.addData((2L, "one document after the restart", 1005L))
      q2.processAllAvailable()
      val got = SnapshotStore.readSnapshot(spark, base)
        .select($"doc_id").as[Long].collect().toSet
      assert(got === Set(1L, 2L))
    } finally q2.stop()
  }
}
