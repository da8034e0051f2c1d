package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.StreamingSessionize

/** Continuous sessionization: appended assignments must be bit-equal to
  * batch q89 over the same events under uneven micro-batch slicing, and
  * an event-time regression must fail loudly. */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streamed session assignments equal batch q89 bit-for-bit") { withRocksDb {
    val events = sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long, Long)].collect()
      // global event-time order respects every user's order; uneven cuts
      // land mid-session for many users
      .sortBy(e => (e._3, e._1))
    val (b1, rest) = events.splitAt(events.length / 5)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingSessionize.assign(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("sess_stream")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = Relational.q89Sessionize(spark, sf)
        .select($"event_id", $"user_id",
          unix_micros($"ts".cast("timestamp")).as("us"), $"session_seq")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
      // every event got exactly one final assignment (append, no dups)
      assert(spark.table("sess_stream").count() === events.length.toLong)
    } finally q.stop()
  } }

  test("an event-time regression fails loudly") { withRocksDb {
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingSessionize.assign(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_disorder").start()
    try {
      input.addData((1L, 7L, 1000000L))
      q.processAllAvailable()
      input.addData((2L, 7L, 999999L)) // behind user 7's clock
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("out-of-order")
        || Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  } }

  test("the ttl parameter expires idle-user state (production knob)") {
    withRocksDb {
      val input = MemoryStream[(Long, Long, Long)] // (event_id, user, us)
      // real TTL ⇒ processing-time mode, where the engine self-triggers
      // batches to evict state — processAllAvailable never idles there,
      // so this test POLLS the sink instead (split-sourcing precedent)
      val q = StreamingSessionize.assign(input.toDS(), gapUs = 1000L,
          ttl = org.apache.spark.sql.streaming.TTLConfig
            .apply(java.time.Duration.ofSeconds(1)))
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_ttl").start()
      def seqs(): Map[Long, Long] = spark.table("sess_ttl")
        .select($"event_id", $"session_seq")
        .as[(Long, Long)].collect().toMap
      try {
        // two events a session-gap apart → sessions 1 and 2
        input.addData((1L, 1L, 1000000L), (2L, 1L, 2000000L))
        val first = pollSink()(seqs())(_.size >= 2)
        assert(first === Map(1L -> 1L, 2L -> 2L))
        // Per attempt: ONE more event, strictly later us, a full
        // session-gap later (legal whether or not the old state
        // survived). Append mode stamps every event, so each attempt
        // gets a POSITIVE verdict: fresh state restarts the counter at
        // session 1, surviving state keeps counting (3, 4, …).
        awaitTtlExpiry() { attempt =>
          val eid = 10L + attempt
          input.addData((eid, 1L, 2000000L + attempt * 1000000L))
          val c = pollSink()(seqs())(_.contains(eid))
          assert(c.contains(eid), s"event $eid never stamped: $c")
          c(eid) == 1L
        }
      } finally q.stop()
    }
  }
}
