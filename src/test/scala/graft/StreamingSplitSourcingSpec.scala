package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingSplitSourcing

/** Continuous split-sourcing flags: maintained distinct-supplier counts
  * must be bit-equal to the batch groups over the same lines under
  * ADVERSARIAL reordering (set semantics need no ordering contract),
  * and single-supplier groups must never emit. */
class StreamingSplitSourcingSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streamed flags equal the batch distinct counts under reordering") {
    withRocksDb {
      val lines = sources.Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_partkey", $"l_suppkey")
        .as[(Long, Long, Long)].collect()
        // adversarial: sort by SUPPLIER (scatters each group's suppliers
        // across batches), uneven cuts
        .sortBy(r => (r._3, r._1))
      val (b1, rest) = lines.splitAt(lines.length / 5)
      val (b2, b3) = rest.splitAt(rest.length / 2)

      val input = MemoryStream[(Long, Long, Long)]
      val q = StreamingSplitSourcing.track(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("split_stream").start()
      try {
        Seq(b1, b2, b3).foreach { b =>
          input.addData(b.toSeq: _*)
          q.processAllAvailable()
        }
        val rows = spark.table("split_stream")
          .as[(Long, Long, Long)].collect()
        val hwm = rows.groupBy(r => (r._1, r._2)).view
          .mapValues(_.map(_._3).max).toMap
        val got = rows.filter(r => r._3 == hwm((r._1, r._2))).toSet

        val want = sources.Tables.lineitem(spark, sf)
          .groupBy($"l_orderkey", $"l_partkey")
          .agg(countDistinct($"l_suppkey").as("n_supp"))
          .filter($"n_supp" >= 2)
          .as[(Long, Long, Long)].collect().toSet
        assert(got === want)
        assert(want.nonEmpty, "no split-sourced group in fixture")
        // the threshold lives in the stream: no 1-supplier emissions
        assert(rows.forall(_._3 >= 2L))
      } finally q.stop()
    }
  }

  test("the ttl parameter expires idle-group state (production knob)") {
    withRocksDb {
      val input = MemoryStream[(Long, Long, Long)]
      // real TTL ⇒ processing-time mode, where the engine self-triggers
      // batches to evict state — processAllAvailable never idles there,
      // so this test POLLS the sink instead
      val q = StreamingSplitSourcing
        .track(input.toDS(), org.apache.spark.sql.streaming.TTLConfig
          .apply(java.time.Duration.ofSeconds(1)))
        .writeStream.outputMode("update")
        .format("memory").queryName("split_ttl").start()
      def counts(): Array[Long] = spark.table("split_ttl")
        .as[(Long, Long, Long)].collect().map(_._3)
      def awaitUntil(p: Array[Long] => Boolean): Array[Long] = {
        val deadline = System.currentTimeMillis() + 60000
        var c = counts()
        while (!p(c) && System.currentTimeMillis() < deadline) {
          Thread.sleep(200); c = counts()
        }
        assert(p(c), s"sink never satisfied the condition: ${c.toSeq}")
        c
      }
      try {
        input.addData((1L, 1L, 10L), (1L, 1L, 20L))
        assert(awaitUntil(_.nonEmpty).forall(_ == 2L))
        // Eviction is wall-clock (1 s TTL), so one fixed sleep can flake
        // on a loaded box — POLL the expiry instead: each attempt sleeps
        // (widening), feeds two FRESH suppliers, and reads the verdict
        // off the new sink rows. Fresh state re-flags at exactly 2 (a
        // new `(group, 2)` row lands — the count of 2-rows grows);
        // surviving state keeps counting (the max grows past what we've
        // seen) — then widen the sleep and try again.
        var twos = 1 // rows with n_supp == 2 so far
        var maxSeen = 2L
        var expired = false
        var nextSupp = 30L
        var attempt = 0
        while (!expired && attempt < 5) {
          attempt += 1
          Thread.sleep(5000L * attempt)
          input.addData((1L, 1L, nextSupp), (1L, 1L, nextSupp + 10L))
          nextSupp += 20L
          val c = awaitUntil(a =>
            a.count(_ == 2L) > twos || a.max > maxSeen)
          if (c.count(_ == 2L) > twos) expired = true // started FRESH
          else maxSeen = c.max // state survived this sleep — widen
          twos = c.count(_ == 2L)
        }
        assert(expired,
          s"state never expired after $attempt widening sleeps (TTL 1 s)")
      } finally q.stop()
    }
  }
}
