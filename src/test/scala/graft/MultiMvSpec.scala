package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{MultiMv, SnapshotStore}

/** Multi-MV fan-out: N views from one stream commit at ONE epoch — no
  * cross-view version skew for pinned readers. */
class MultiMvSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("two views from one stream commit atomically at the batch epoch") {
    val base = Files.createTempDirectory("mmv").toString
    val input = MemoryStream[(Long, Long, String, Double)]
    val views = Seq(
      MultiMv.ViewDef("latest_value",
        b => b.select($"user_id", $"us", $"value"),
        Seq("user_id"), "us"),
      MultiMv.ViewDef("latest_event",
        b => b.select($"user_id", $"event_type", $"us"),
        Seq("user_id", "event_type"), "us"))

    val q = input.toDF().toDF("user_id", "us", "event_type", "value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(MultiMv.fanOut(s"$base/mv", views) _)
      .start()
    def latestValue(v: Option[Long] = None) =
      SnapshotStore.readSnapshot(spark, s"$base/mv/latest_value", v)
        .select($"user_id", $"value").as[(Long, Double)].collect().toSet
    def latestEvent(v: Option[Long] = None) =
      SnapshotStore.readSnapshot(spark, s"$base/mv/latest_event", v)
        .select($"user_id", $"event_type", $"us").as[(Long, String, Long)].collect().toSet
    def versions = (
      SnapshotStore.latestVersion(spark, s"$base/mv/latest_value"),
      SnapshotStore.latestVersion(spark, s"$base/mv/latest_event"))

    try {
      input.addData((1L, 10L, "view", 1.0), (2L, 11L, "click", 2.0))
      q.processAllAvailable()
      assert(versions === (Some(0L), Some(0L)), "both views commit at epoch 0")
      assert(latestValue() === Set((1L, 1.0), (2L, 2.0)))
      assert(latestEvent() === Set((1L, "view", 10L), (2L, "click", 11L)))

      input.addData((1L, 20L, "click", 5.0))
      q.processAllAvailable()
      assert(versions === (Some(1L), Some(1L)), "both views advance together")
      assert(latestValue() === Set((1L, 5.0), (2L, 2.0)))
      assert(latestEvent() ===
        Set((1L, "view", 10L), (1L, "click", 20L), (2L, "click", 11L)))

      // a pinned reader at epoch 0 sees BOTH views as of epoch 0 — the
      // cross-view consistency publishAll exists for
      assert(latestValue(Some(0L)) === Set((1L, 1.0), (2L, 2.0)))
      assert(latestEvent(Some(0L)) === Set((1L, "view", 10L), (2L, "click", 11L)))
    } finally q.stop()
  }

  test("replaying a committed batch leaves every view's epoch intact") {
    val base = Files.createTempDirectory("mmv2").toString
    val views = Seq(
      MultiMv.ViewDef("a", b => b, Seq("user_id"), "us"),
      MultiMv.ViewDef("b", b => b.withColumn("d", $"us" * 2), Seq("user_id"), "us"))
    val batch = Seq((1L, 5L)).toDF("user_id", "us")
    MultiMv.fanOut(s"$base/mv", views)(batch, 0L)
    MultiMv.fanOut(s"$base/mv", views)(batch, 0L) // at-least-once replay
    assert(SnapshotStore.latestVersion(spark, s"$base/mv/a") === Some(0L))
    assert(SnapshotStore.readSnapshot(spark, s"$base/mv/b")
      .select($"user_id", $"d").as[(Long, Long)].collect().toSeq === Seq((1L, 10L)))
  }
}
