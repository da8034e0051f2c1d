package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the two-changelog join Flink SQL runs for
  * MVs over multiple tables; watermarks bound both sides' state. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  case class Click(user: Long, clickTs: Timestamp)
  case class Purchase(user: Long, buyTs: Timestamp, amount: Double)

  test("purchases join clicks within a 10-minute attribution window") {
    val clicks = MemoryStream[(Long, Long)]
    val purchases = MemoryStream[(Long, Long, Double)]
    val c = clicks.toDF().toDF("user", "c_sec")
      .select($"user", timestamp_seconds($"c_sec").as("clickTs"))
      .withWatermark("clickTs", "1 minute")
    val p = purchases.toDF().toDF("p_user", "p_sec", "amount")
      .select($"p_user", timestamp_seconds($"p_sec").as("buyTs"), $"amount")
      .withWatermark("buyTs", "1 minute")

    val joined = p.join(c,
      $"p_user" === $"user" &&
        $"buyTs" >= $"clickTs" && $"buyTs" <= $"clickTs" + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    try {
      clicks.addData((1L, 1000L), (2L, 1000L))
      purchases.addData((1L, 1300L, 99.0)) // 5 min after click → attributed
      purchases.addData((2L, 1700L, 50.0)) // 11+ min after click → not attributed
      q.processAllAvailable()
      val got = spark.table("attrib").select($"p_user", $"amount")
        .as[(Long, Double)].collect().toSet
      assert(got === Set((1L, 99.0)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null-padded rows past the watermark") {
    val clicks = MemoryStream[(Long, Long)]
    val purchases = MemoryStream[(Long, Long, Double)]
    val c = clicks.toDF().toDF("user", "c_sec")
      .select($"user", timestamp_seconds($"c_sec").as("clickTs"))
      .withWatermark("clickTs", "10 seconds")
    val p = purchases.toDF().toDF("p_user", "p_sec", "amount")
      .select($"p_user", timestamp_seconds($"p_sec").as("buyTs"), $"amount")
      .withWatermark("buyTs", "10 seconds")

    // left outer: every click eventually emits — matched within the window,
    // or null-padded once the watermark proves no match can still arrive
    // (the unmatched row CANNOT emit earlier without risking a retraction,
    // which append-mode streams don't have — Flink's outer-join semantics)
    val joined = c.join(p,
      $"user" === $"p_user" &&
        $"buyTs" >= $"clickTs" && $"buyTs" <= $"clickTs" + expr("INTERVAL 10 SECONDS"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_outer").start()
    try {
      clicks.addData((1L, 1000L), (2L, 1000L))
      purchases.addData((1L, 1005L, 42.0)) // matches user 1; user 2 never buys
      q.processAllAvailable()
      // advance BOTH watermarks far past click+window+delay so the engine
      // can prove user 2's click is unmatched forever
      clicks.addData((9L, 2000L))
      purchases.addData((9L, 2000L, 0.0))
      q.processAllAvailable()
      val got = spark.table("attrib_outer")
        .filter($"user" === 1L || $"user" === 2L)
        .select($"user", $"amount").as[(Long, Option[Double])].collect().toSet
      assert(got === Set((1L, Some(42.0)), (2L, None)),
        "matched row carries the purchase; unmatched click null-pads after the watermark")
    } finally q.stop()
  }
}
