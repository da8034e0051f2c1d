package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.StreamingOhlc

/** Continuous OHLC bars: the maintained bars must be bit-equal to the
  * batch q137 aggregation over the same events, under adversarial
  * micro-batch slicing and ordering — the order keys ride in state, so
  * arrival order must not matter. */
class StreamingOhlcSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream bars equal batch q137 bit-for-bit under reordering") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ticks = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        ($"value".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    // adversarial: reverse time order, uneven batch cuts
    val shuffled = ticks.sortBy(t => (-t._3, -t._2))
    val (b1, rest) = shuffled.splitAt(ticks.length / 4)
    val (b2, b3) = rest.splitAt(rest.length / 3)

    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingOhlc.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("ohlc_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("ohlc_stream")
        .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
        .collect()
      val hwm = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._7).max).toMap
      val got = rows.filter(r => r._7 == hwm((r._1, r._2))).toSet

      val want = Relational.q137OhlcBars(spark, sf)
        .select($"user_id", $"bucket", $"open", $"high", $"low", $"close",
          $"n", $"vsum")
        .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
        .collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }
}
