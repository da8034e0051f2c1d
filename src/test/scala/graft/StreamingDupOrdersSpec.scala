package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.StreamingDupOrders

/** Continuous duplicate-order screen: the maintained suspect groups must
  * be bit-equal to batch q252 over the same orders, under adversarial
  * micro-batch slicing and ordering — count/min/max are order-free, and a
  * key emits only once it crosses the batch HAVING threshold. */
class StreamingDupOrdersSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream suspect groups equal batch q252 bit-for-bit under reordering") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val orders = sources.Tables.orders(spark, sf)
      .select($"o_custkey", unix_micros($"o_orderdate".cast("timestamp"))
          .as("date_us"),
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    // adversarial: sort by amount descending (scatters each day's orders
    // across batches), uneven cuts
    val shuffled = orders.sortBy(o => (-o._3, o._1))
    val (b1, rest) = shuffled.splitAt(orders.length / 4)
    val (b2, b3) = rest.splitAt(rest.length / 3)

    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamingDupOrders.track(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("dup_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("dup_stream")
        .as[(Long, Long, Long, Long, Long)].collect()
      // current state = each key's row at its max (monotone) count
      val hwm = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
      val got = rows.filter(r => r._3 == hwm((r._1, r._2))).toSet

      val want = Relational.q252DupOrders(spark, sf)
        .select($"o_custkey",
          unix_micros($"o_orderdate".cast("timestamp")).as("date_us"),
          $"n_orders", $"min_cents", $"max_cents")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)

      // below-threshold keys never emitted (the HAVING is in the stream)
      assert(rows.forall(_._3 >= 2L))
    } finally q.stop()
  }
}
