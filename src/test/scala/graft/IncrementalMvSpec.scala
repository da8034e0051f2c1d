package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.IncrementalMv

/** The TiFlink flagship semantics: an aggregate MV maintained under inserts,
  * updates (group moves!), and deletes, converging to the batch ground truth
  * after every micro-batch. */
class IncrementalMvSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("aggregate MV stays exact under insert/update/delete and group moves") {
    val input = MemoryStream[(Long, Long, String, String, Double)]
    val source = input.toDF().toDF("pk", "version", "op", "grp", "value")
    val base = Files.createTempDirectory("imv").toString

    val q = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(b, id))
      .start()

    def agg = spark.read.parquet(s"$base/mv/agg")
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet
    def entity = spark.read.parquet(s"$base/mv/entity")
      .select("pk", "grp", "value").as[(Long, String, Double)].collect().toSet

    try {
      // batch 1: three inserts in two groups
      input.addData((1L, 1L, "ins", "a", 10.0), (2L, 1L, "ins", "a", 20.0), (3L, 1L, "ins", "b", 5.0))
      q.processAllAvailable()
      assert(agg === Set(("a", 2L, 30.0), ("b", 1L, 5.0)))

      // batch 2: update moves pk=2 from group a to b; delete pk=3
      input.addData((2L, 2L, "upd", "b", 25.0), (3L, 2L, "delete", "b", 0.0))
      q.processAllAvailable()
      assert(agg === Set(("a", 1L, 10.0), ("b", 1L, 25.0)))
      assert(entity === Set((1L, "a", 10.0), (2L, "b", 25.0)))

      // batch 3: in-batch churn compacts to the final change per key,
      // plus a stale replay (version 1 for pk=2) that must be ignored
      input.addData((4L, 1L, "ins", "a", 7.0), (4L, 2L, "upd", "a", 8.0),
        (2L, 1L, "ins", "a", 999.0))
      q.processAllAvailable()
      assert(agg === Set(("a", 2L, 18.0), ("b", 1L, 25.0)))

      // batch 4: delete the last member of group b → group disappears
      input.addData((2L, 3L, "delete", "b", 0.0))
      q.processAllAvailable()
      assert(agg === Set(("a", 2L, 18.0)))
    } finally q.stop()
  }

  test("MV output changelog: per-batch I/U/D diffs replay to the final state") {
    val input = MemoryStream[(Long, Long, String, String, Double)]
    val source = input.toDF().toDF("pk", "version", "op", "grp", "value")
    val base = Files.createTempDirectory("imvcl").toString
    val cl = s"$base/changelog"

    val q = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value",
          changelogPath = Some(cl))(b, id))
      .start()

    def diffs(batch: Long) = spark.read.parquet(s"$cl/batch=$batch")
      .select("grp", "op", "cnt", "total")
      .as[(String, String, Option[Long], Option[Double])].collect().toSet
    def agg = spark.read.parquet(s"$base/mv/agg")
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet

    try {
      input.addData((1L, 1L, "ins", "a", 10.0), (2L, 1L, "ins", "a", 20.0), (3L, 1L, "ins", "b", 5.0))
      q.processAllAvailable()
      assert(diffs(0) === Set(("a", "I", Some(2L), Some(30.0)), ("b", "I", Some(1L), Some(5.0))))

      // group move a→b plus a delete: 'a' shrinks, 'b' replaces its row
      input.addData((2L, 2L, "upd", "b", 25.0), (3L, 2L, "delete", "b", 0.0))
      q.processAllAvailable()
      assert(diffs(1) === Set(("a", "U", Some(1L), Some(10.0)), ("b", "U", Some(1L), Some(25.0))))

      // last member of a group deleted → the group itself retracts as 'D'
      input.addData((1L, 2L, "delete", "a", 0.0))
      q.processAllAvailable()
      assert(diffs(2) === Set(("a", "D", None, None)))

      // folding the emitted diffs in batch order rebuilds the MV exactly —
      // the defining property of an output changelog
      val folded = (0L to 2L).foldLeft(Map.empty[String, (Long, Double)]) { (s, b) =>
        diffs(b).foldLeft(s) {
          case (m, (g, "D", _, _)) => m - g
          case (m, (g, _, Some(c), Some(t))) => m + (g -> (c, t))
          case (_, r) => fail(s"malformed diff row $r")
        }
      }
      assert(folded.map { case (g, (c, t)) => (g, c, t) }.toSet === agg)
    } finally q.stop()
  }

  test("changelog replay: an already-committed batch is not re-emitted") {
    val base = Files.createTempDirectory("imvcl2").toString
    val cl = s"$base/changelog"
    val batch = Seq((1L, 1L, "ins", "g", 5.0)).toDF("pk", "version", "op", "grp", "value")
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value",
      changelogPath = Some(cl))(batch, 0L)
    val first = spark.read.parquet(s"$cl/batch=0")
      .select("grp", "op").as[(String, String)].collect().toSet
    assert(first === Set(("g", "I")))
    // at-least-once replay after the state swap: the version guard makes the
    // recomputed diff empty — the committed batch=0 dir must survive as-is
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value",
      changelogPath = Some(cl))(batch, 0L)
    val after = spark.read.parquet(s"$cl/batch=0")
      .select("grp", "op").as[(String, String)].collect().toSet
    assert(after === first, "replay must not clobber the committed changelog batch")
  }

  test("replay after agg swap but before entity swap does not double-apply") {
    // Reconstructs the crash window the `_applied_batch` marker closes:
    // batch 1 fully commits (changelog-less path), then the ENTITY table is
    // rolled back to its pre-batch-1 buckets — exactly the on-disk state a
    // replay sees when the crash landed between the marker write and the
    // entity swap. The replayed deltas are non-empty (old entity state) but
    // the marker must keep them out of the already-swapped agg.
    val base = Files.createTempDirectory("imv3").toString
    val b0 = Seq((1L, 1L, "ins", "g", 5.0), (2L, 1L, "ins", "g", 7.0))
      .toDF("pk", "version", "op", "grp", "value")
    val b1 = Seq((2L, 2L, "upd", "h", 9.0)).toDF("pk", "version", "op", "grp", "value")
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(b0, 0L)
    // snapshot the pre-batch-1 entity buckets
    val entityDir = new java.io.File(s"$base/mv/entity")
    val saved = new java.io.File(s"$base/entity_saved")
    org.apache.commons.io.FileUtils.copyDirectory(entityDir, saved)
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(b1, 1L)
    def agg = spark.read.parquet(s"$base/mv/agg")
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet
    assert(agg === Set(("g", 1L, 5.0), ("h", 1L, 9.0)))
    // roll entity back to pre-batch-1 = the mid-crash state, then replay
    org.apache.commons.io.FileUtils.deleteDirectory(entityDir)
    org.apache.commons.io.FileUtils.copyDirectory(saved, entityDir)
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(b1, 1L)
    assert(agg === Set(("g", 1L, 5.0), ("h", 1L, 9.0)),
      "marker must stop the replayed deltas from double-applying to agg")
    val entity = spark.read.parquet(s"$base/mv/entity")
      .select("pk", "grp", "value").as[(Long, String, Double)].collect().toSet
    assert(entity === Set((1L, "g", 5.0), (2L, "h", 9.0)),
      "replay must still complete the entity swap")
  }

  test("replaying a batch is a no-op (version guard gives idempotence)") {
    val base = Files.createTempDirectory("imv2").toString
    val batch = Seq((1L, 1L, "ins", "g", 5.0), (2L, 1L, "ins", "g", 7.0))
      .toDF("pk", "version", "op", "grp", "value")
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(batch, 0L)
    def agg = spark.read.parquet(s"$base/mv/agg")
      .select("grp", "cnt", "total").as[(String, Long, Double)].collect().toSet
    assert(agg === Set(("g", 2L, 12.0)))
    // crash-replay of the same micro-batch (foreachBatch at-least-once)
    IncrementalMv.maintain(s"$base/mv", "pk", "version", "op", "grp", "value")(batch, 0L)
    assert(agg === Set(("g", 2L, 12.0)))
  }
}
