package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{ChangelogOps, MaterializedView}

/** Watermarked windows + checkpoint recovery — TiFlink's exactly-once
  * checkpointing discipline (FlinkTikvConsumer.snapshotState/
  * notifyCheckpointComplete) expressed as Structured Streaming state. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(u: Long, sec: Long, v: Double) =
    ChangelogOps.Event(u, new Timestamp(sec * 1000), "click", v)

  test("watermarked tumbling window aggregates event-time correctly") {
    val input = MemoryStream[ChangelogOps.Event]
    val agg = input.toDF()
      .withWatermark("ts", "30 seconds")
      .groupBy(window($"ts", "1 minute"))
      .agg(count(lit(1)).as("cnt"), sum($"value").as("total"))
      .select($"window.start".as("ws"), $"cnt", $"total")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("winagg").start()
    try {
      input.addData(ev(1, 60, 1.0), ev(1, 70, 2.0), ev(2, 130, 3.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .as[(Timestamp, Long, Double)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.last }
      assert(rows(new Timestamp(60_000))._2 === 2L)
      assert(rows(new Timestamp(120_000))._3 === 3.0)

      // late but within watermark: still applied to the 60s window
      input.addData(ev(3, 80, 10.0))
      q.processAllAvailable()
      val updated = spark.table("winagg").as[(Timestamp, Long, Double)]
        .collect().filter(_._1 == new Timestamp(60_000)).map(_._2).max
      assert(updated === 3L)
    } finally q.stop()
  }

  test("MV restarts from checkpoint and keeps exactly-once target state") {
    val input = MemoryStream[(Long, Long, String, Double)]
    val source = input.toDF().toDF("user_id", "version", "op", "value")
    val base = Files.createTempDirectory("mvr").toString
    def mv = MaterializedView.newBuilder()
      .setSource(source)
      .setQuery(df => ChangelogOps.latestByKey(df, Seq("user_id"), "version"))
      .setTargetPath(s"$base/target")
      .setPrimaryKeys("user_id")
      .setVersionColumn("version")
      .setCheckpointLocation(s"$base/ckpt")
      .build()

    val q1 = mv.start()
    input.addData((1L, 1L, "ins", 10.0), (2L, 1L, "ins", 20.0))
    q1.processAllAvailable()
    q1.stop()

    // restart with the same checkpoint: offsets resume, no re-application
    val q2 = mv.start()
    input.addData((1L, 2L, "upd", 11.0))
    q2.processAllAvailable()
    q2.stop()

    val state = spark.read.parquet(s"$base/target")
      .select("user_id", "version", "value").as[(Long, Long, Double)].collect().toSet
    assert(state === Set((1L, 2L, 11.0), (2L, 1L, 20.0)))
  }

  test("sorted_intersect_count is callable from SQL after registration") {
    GraftSession.registerFunctions(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L, 9L), array(2L, 5L, 7L)) AS n")
      .as[Long].head()
    assert(n === 2L)
  }
}
