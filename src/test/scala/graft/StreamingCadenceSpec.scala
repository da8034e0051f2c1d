package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.StreamingCadence

/** Continuous cadence regularity: maintained rows must be bit-equal to
  * batch q291 over the same orders under uneven micro-batch slicing, and
  * an order-date regression must fail loudly. */
class StreamingCadenceSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streamed cadence rows equal batch q291 bit-for-bit") { withRocksDb {
    val orders = sources.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey",
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000L")
          .as("day"))
      .as[(Long, Long, Long)].collect()
      .sortBy(o => (o._3, o._2)) // global date order ⊇ per-customer order
    val (b1, rest) = orders.splitAt(orders.length / 4)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingCadence.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cad_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("cad_stream")
        .as[(Long, Long, Double, Option[Double])].collect()
      val hwm = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = rows.filter(r => r._2 == hwm(r._1)).toSet

      val want = Relational.q291GapRegularity(spark, sf)
        .select($"o_custkey", $"n_orders", $"mean_gap_days", $"gap_cv")
        .as[(Long, Long, Double, Option[Double])].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
      // sub-threshold customers (≤2 orders) never emitted
      assert(rows.forall(_._2 >= 3L))
    } finally q.stop()
  } }

  test("an order-date regression fails loudly") { withRocksDb {
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingCadence.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cad_disorder").start()
    try {
      input.addData((9L, 1L, 100L))
      q.processAllAvailable()
      input.addData((9L, 2L, 99L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("out-of-order")
        || Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  } }

  test("the ttl parameter expires idle-customer state (production knob)") {
    withRocksDb {
      val input = MemoryStream[(Long, Long, Long)]
      // real TTL ⇒ processing-time mode, where the engine self-triggers
      // batches to evict state — processAllAvailable never idles there,
      // so this test POLLS the sink instead (split-sourcing precedent)
      val q = StreamingCadence.track(input.toDS(),
          org.apache.spark.sql.streaming.TTLConfig
            .apply(java.time.Duration.ofSeconds(1)))
        .writeStream.outputMode("update")
        .format("memory").queryName("cadence_ttl").start()
      def ns(): Array[Long] = spark.table("cadence_ttl")
        .select($"n_orders").as[Long].collect()
      try {
        // three orders in one batch → one n_orders=3 row
        input.addData((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
        val first = pollSink()(ns())(_.nonEmpty)
        assert(first.nonEmpty && first.forall(_ == 3L), first.toSeq)
        // Per attempt: feed three MORE orders at strictly later days
        // (legal whether or not the old state survived); fresh state
        // re-emits an n_orders=3 row (the count of 3-rows grows),
        // surviving state keeps counting (the max n grows).
        var threes = 1
        var maxSeen = 3L
        awaitTtlExpiry() { attempt =>
          val d = 100L * attempt + 100L
          input.addData((1L, 10L + attempt * 3L, d),
            (1L, 11L + attempt * 3L, d + 10L),
            (1L, 12L + attempt * 3L, d + 30L))
          val verdict = (a: Array[Long]) =>
            a.count(_ == 3L) > threes || a.max > maxSeen
          val c = pollSink()(ns())(verdict)
          // a 60 s timeout means the query stalled, not that state
          // survived — fail fast instead of burning widening attempts
          assert(verdict(c), s"sink never reacted to the probe: ${c.toSeq}")
          val fresh = c.count(_ == 3L) > threes
          if (!fresh && c.nonEmpty) maxSeen = c.max
          threes = c.count(_ == 3L)
          fresh
        }
      } finally q.stop()
    }
  }
}
