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
