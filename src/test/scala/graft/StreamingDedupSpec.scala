package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming deduplication with bounded state — the scale path for exact
  * dedup over an unbounded ingest stream (state evicted past the
  * watermark, so memory tracks the dedup horizon, not history). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("transformWithState running aggregate accumulates across batches") {
    // transformWithState needs multi-column-family state → RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Double)]
    val out = graft.streaming.ChangelogOps.runningAggregateTws(input.toDS())
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("tws_agg").start()
    try {
      input.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      input.addData((1L, 5.0))
      q.processAllAvailable()
      val latest = spark.table("tws_agg")
        .groupBy($"key").agg(org.apache.spark.sql.functions.max($"n_events").as("n"),
          org.apache.spark.sql.functions.max($"total").as("t"))
        .as[(Long, Long, Double)].collect().toSet
      assert(latest === Set((1L, 3L, 10.0), (2L, 1L, 10.0)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("dropDuplicatesWithinWatermark dedups repeats inside the horizon") {
    val input = MemoryStream[(String, Long)]
    val deduped = input.toDF().toDF("fp", "sec")
      .select($"fp", timestamp_seconds($"sec").as("ts"))
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      input.addData(("a", 1000L), ("b", 1001L), ("a", 1002L))
      q.processAllAvailable()
      input.addData(("a", 1010L), ("c", 1011L)) // 'a' still within horizon
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select($"fp").as[String]
        .collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(got === Map("a" -> 1, "b" -> 1, "c" -> 1))
    } finally q.stop()
  }
}
