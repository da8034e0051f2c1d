package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.StreamingRapidFire

/** Continuous rapid-fire screen: the maintained per-user rows must be
  * bit-equal to batch q257 over the same events — including the
  * forward-looking max-in-60s, whose windows close across micro-batch
  * boundaries — and a per-key event-time order violation must fail loudly
  * rather than corrupt gap stats. */
class StreamingRapidFireSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def eventRows: Array[(Long, Long)] =
    sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long)].collect()

  test("stream screen rows equal batch q257 bit-for-bit across batch cuts") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // global time order preserves each user's order across batches; the
    // uneven cuts land mid-window so open 60s windows straddle batches;
    // each batch is internally REVERSED (the processor must sort per key)
    val ordered = eventRows.sortBy(_._2)
    val (b1, rest) = ordered.splitAt(ordered.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 5)

    val input = MemoryStream[(Long, Long)]
    val q = StreamingRapidFire.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("rapid_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.reverse.toSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("rapid_stream")
        .as[(Long, Long, Option[Long], Long, Long)].collect()
      // current state = each user's row at its max (monotone) event count
      val hwm = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = rows.filter(r => r._2 == hwm(r._1)).toSet

      val want = Relational.q257RapidFire(spark, sf)
        .as[(Long, Long, Option[Long], Long, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
      assert(want.exists(_._5 >= 2L)) // a 60s window with real overlap
    } finally q.stop()
  }

  test("per-key out-of-order arrival fails loudly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val q = StreamingRapidFire.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("rapid_ooo").start()
    try {
      input.addData((7L, 1000000L), (7L, 2000000L))
      q.processAllAvailable()
      input.addData((7L, 1500000L)) // regresses user 7's clock
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("out-of-order event")))
    } finally q.stop()
  }
}
