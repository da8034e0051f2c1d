package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{ChangelogOps, SnapshotStore}

/** Stale-snapshot-isolation semantics: versioned publish, pinned reads,
  * pointer-flip commit, retention pruning. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming MV publishes immutable epochs; pinned reads time-travel") {
    val input = MemoryStream[(Long, Long, String, Double)]
    val source = input.toDF().toDF("user_id", "version", "op", "value")
    val base = Files.createTempDirectory("snap").toString + "/t"

    val q = ChangelogOps.latestByKey(source, Seq("user_id"), "version")
      .withColumn("is_delete", $"op" === "del")
      .writeStream.outputMode("update")
      .option("checkpointLocation", base + ".ckpt")
      .foreachBatch(SnapshotStore.upsertSink(base, Seq("user_id"), "version", Some("is_delete")))
      .start()
    try {
      input.addData((1L, 1L, "ins", 10.0), (2L, 1L, "ins", 20.0))
      q.processAllAvailable()
      val v1 = SnapshotStore.latestVersion(spark, base).get

      input.addData((1L, 2L, "upd", 11.0), (2L, 2L, "del", 0.0))
      q.processAllAvailable()
      val v2 = SnapshotStore.latestVersion(spark, base).get
      assert(v2 > v1)

      def state(v: Long) = SnapshotStore.readSnapshot(spark, base, Some(v))
        .select("user_id", "value").as[(Long, Double)].collect().toSet
      // pinned read of the OLD epoch still sees the pre-update world
      assert(state(v1) === Set((1L, 10.0), (2L, 20.0)))
      assert(state(v2) === Set((1L, 11.0)))
      // latest-pointer read = newest epoch
      assert(SnapshotStore.readSnapshot(spark, base)
        .select("user_id").as[Long].collect().toSeq === Seq(1L))
    } finally q.stop()
  }

  test("retention prunes old epochs but keeps the window") {
    val base = Files.createTempDirectory("snapr").toString + "/t"
    (0L to 5L).foreach { v =>
      SnapshotStore.publish(Seq((v, "x")).toDF("id", "s"), base, v, keep = 2)
    }
    assert(SnapshotStore.versions(spark, base).sorted === Seq(4L, 5L))
    assert(SnapshotStore.latestVersion(spark, base) === Some(5L))
  }

  test("reading an empty store fails loudly, not with a partial view") {
    val base = Files.createTempDirectory("snape").toString + "/t"
    intercept[IllegalStateException](SnapshotStore.readSnapshot(spark, base))
  }
}
