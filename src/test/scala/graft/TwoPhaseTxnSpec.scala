package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.TwoPhaseTxn
import graft.streaming.TwoPhaseTxn.{TxnLogRecord, COMMIT, PREWRITE, ROLLBACK}

/** Streaming two-phase transaction application (B29): the stream must
  * converge to exactly the batch ground truth `q63TxnApply` computes — the
  * oracle-checked COMMIT/ROLLBACK semantics of the reference's CDC consumer
  * (FlinkTikvConsumer.java:108-191) — including across a query restart
  * mid-log (checkpointed state resume, :204-242). */
class TwoPhaseTxnSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[T](body: => T): T = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("replays q63's exact batch result through a restart mid-log") {
    withRocksDb {
      // The same deterministic txn log q63 derives: txn = 3 consecutive
      // events, every 10th txn rolls back, commit_ts = the txn's max ts.
      val ev = graft.sources.Tables.events(spark, sf)
        .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id", $"value",
          expr("event_id div 3").as("txn_id"))
        .as[(Long, Timestamp, Long, Double, Long)]
        .collect()
      val prewrites = ev.map { case (eid, t, uid, v, txn) =>
        TxnLogRecord(txn, PREWRITE, eid, uid, v, t) }
      val outcomes = ev.groupBy(_._5).map { case (txn, rows) =>
        val commitTs = rows.map(_._2).maxBy(_.getTime)
        TxnLogRecord(txn, if (txn % 10 == 0) ROLLBACK else COMMIT, 0L, 0L, 0.0, commitTs)
      }
      // Log order: by event time (so nothing falls behind the watermark),
      // outcomes after prewrites at equal ts.
      val log = (prewrites ++ outcomes).sortBy(r =>
        (r.ts.getTime, if (r.op == PREWRITE) 0 else 1, r.event_id))
      val (chunk1, chunk2) = log.splitAt(log.length / 2)

      // The memory sink can't recover from a checkpoint; the parquet file
      // sink can (exactly-once via its _spark_metadata log) — and is the
      // shape a real deployment uses.
      val ckpt = Files.createTempDirectory("twophase-ckpt").toString
      val outDir = Files.createTempDirectory("twophase-out").toString
      val input = MemoryStream[TxnLogRecord]
      val out = TwoPhaseTxn.applyLog(input.toDS())
      def start() = out.writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).start()

      val q1 = start()
      try {
        input.addData(chunk1.toIndexedSeq)
        q1.processAllAvailable()
      } finally q1.stop()

      // Restart: state (buffered prewrites of transactions straddling the
      // split) must survive via the checkpoint.
      val q2 = start()
      try {
        input.addData(chunk2.toIndexedSeq)
        q2.processAllAvailable()
      } finally q2.stop()

      val got = spark.read.parquet(outDir)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"commit_ts".desc, $"event_id".desc)))
        .filter($"rn" === 1)
        .select($"user_id", $"value", $"commit_ts")
        .as[(Long, Double, Timestamp)].collect().toSet

      val expected = graft.operators.Changelog.q63TxnApply(spark, sf)
        .select($"user_id", $"value", $"commit_ts".cast("timestamp"))
        .as[(Long, Double, Timestamp)].collect().toSet

      assert(got.nonEmpty)
      assert(got === expected)
    }
  }

  test("rollback discards buffered prewrites; late prewrite after commit still emits") {
    withRocksDb {
      val input = MemoryStream[TxnLogRecord]
      val out = TwoPhaseTxn.applyLog(input.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("txn_small").start()
      try {
        // txn 1 commits; txn 2 rolls back; txn 3's commit arrives BEFORE a
        // straggler prewrite (retained-outcome path).
        input.addData(
          TxnLogRecord(1L, PREWRITE, 10L, 100L, 1.0, ts("2024-01-01 10:00:00")),
          TxnLogRecord(2L, PREWRITE, 11L, 200L, 2.0, ts("2024-01-01 10:00:01")),
          TxnLogRecord(1L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 10:00:02")),
          TxnLogRecord(2L, ROLLBACK, 0L, 0L, 0.0, ts("2024-01-01 10:00:03")),
          TxnLogRecord(3L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 10:00:04")))
        q.processAllAvailable()
        input.addData(
          TxnLogRecord(3L, PREWRITE, 12L, 300L, 3.0, ts("2024-01-01 10:00:05")),
          TxnLogRecord(2L, PREWRITE, 13L, 400L, 4.0, ts("2024-01-01 10:00:05")))
        q.processAllAvailable()
        val got = spark.table("txn_small")
          .select($"txn_id", $"event_id", $"user_id", $"value", $"commit_ts")
          .as[(Long, Long, Long, Double, Timestamp)].collect().toSet
        assert(got === Set(
          (1L, 10L, 100L, 1.0, ts("2024-01-01 10:00:02")),
          // late prewrite of txn 3 stamped with the retained commit_ts:
          (3L, 12L, 300L, 3.0, ts("2024-01-01 10:00:04"))))
      } finally q.stop()
    }
  }

  test("resolvedRetention shorter than the disorder window is rejected") {
    val input = MemoryStream[TxnLogRecord]
    // dedup state evicted inside the watermark window would silently
    // re-emit late duplicates — refuse the configuration up front
    val ex = intercept[IllegalArgumentException] {
      TwoPhaseTxn.applyLog(input.toDS(), watermarkDelay = "2 hours",
        resolvedRetention = java.time.Duration.ofMinutes(30))
    }
    assert(ex.getMessage.contains("resolvedRetention"))
    // the boundary case (retention == delay) and larger are both fine
    TwoPhaseTxn.applyLog(input.toDS(), watermarkDelay = "30 minutes",
      resolvedRetention = java.time.Duration.ofMinutes(30))
    TwoPhaseTxn.applyLog(input.toDS(), watermarkDelay = "1 day 1 hour",
      resolvedRetention = java.time.Duration.ofHours(26))
  }

  test("at-least-once redelivery: each prewrite surfaces exactly once") {
    withRocksDb {
      val input = MemoryStream[TxnLogRecord]
      val out = TwoPhaseTxn.applyLog(input.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("txn_dup").start()
      try {
        // Duplicate PREWRITE before the outcome: overwrites its buffered slot.
        input.addData(
          TxnLogRecord(1L, PREWRITE, 10L, 100L, 1.0, ts("2024-01-01 10:00:00")),
          TxnLogRecord(1L, PREWRITE, 10L, 100L, 1.0, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        input.addData(
          TxnLogRecord(1L, PREWRITE, 10L, 100L, 1.0, ts("2024-01-01 10:00:00")),
          TxnLogRecord(1L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 10:00:01")))
        q.processAllAvailable()
        // Duplicate PREWRITE after the COMMIT: already released, must not
        // re-emit. A genuinely new late prewrite (e11) still emits — once —
        // and its own redelivery is also absorbed.
        input.addData(
          TxnLogRecord(1L, PREWRITE, 10L, 100L, 1.0, ts("2024-01-01 10:00:00")),
          TxnLogRecord(1L, PREWRITE, 11L, 110L, 1.1, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        input.addData(
          TxnLogRecord(1L, PREWRITE, 11L, 110L, 1.1, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        val got = spark.table("txn_dup")
          .select($"event_id", $"user_id", $"value", $"commit_ts")
          .as[(Long, Long, Double, Timestamp)].collect()
        assert(got.length === 2) // exactly-once despite 6 prewrite deliveries
        assert(got.toSet === Set(
          (10L, 100L, 1.0, ts("2024-01-01 10:00:01")),
          (11L, 110L, 1.1, ts("2024-01-01 10:00:01"))))
      } finally q.stop()
    }
  }

  test("resolved-txn dedup state evicts on the shorter retention horizon") {
    withRocksDb {
      val input = MemoryStream[TxnLogRecord]
      val out = TwoPhaseTxn.applyLog(input.toDS(),
        watermarkDelay = "0 seconds",
        ttl = java.time.Duration.ofHours(24),
        resolvedRetention = java.time.Duration.ofSeconds(1))
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("txn_res_evict").start()
      try {
        input.addData(
          TxnLogRecord(9L, PREWRITE, 90L, 900L, 9.0, ts("2024-01-01 10:00:00")),
          TxnLogRecord(9L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 10:00:01")))
        q.processAllAvailable()
        // advance the watermark far past resolvedRetention: txn 9's retained
        // outcome is evicted even though ttl (24h) is nowhere near over
        input.addData(TxnLogRecord(10L, PREWRITE, 100L, 1000L, 10.0, ts("2024-01-01 12:00:00")))
        q.processAllAvailable()
        // a prewrite for the long-resolved txn (fresh event time, so it
        // clears the watermark) finds no retained outcome: it buffers as an
        // open txn and never surfaces — the reference's past-resolved-ts
        // lock behavior, not a late emit
        input.addData(TxnLogRecord(9L, PREWRITE, 91L, 910L, 9.1, ts("2024-01-01 12:00:01")))
        q.processAllAvailable()
        val got = spark.table("txn_res_evict")
          .select($"event_id").as[Long].collect().toSet
        assert(got === Set(90L))
      } finally q.stop()
    }
  }

  test("abandoned transaction is evicted by the event-time timer") {
    withRocksDb {
      val input = MemoryStream[TxnLogRecord]
      val out = TwoPhaseTxn.applyLog(input.toDS(),
        watermarkDelay = "0 seconds", ttl = java.time.Duration.ofSeconds(1))
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("txn_evict").start()
      try {
        input.addData(TxnLogRecord(7L, PREWRITE, 70L, 700L, 7.0, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        // Advance the watermark far past txn 7's ttl; its timer fires and
        // clears the buffered prewrite.
        input.addData(TxnLogRecord(8L, PREWRITE, 80L, 800L, 8.0, ts("2024-01-01 12:00:00")))
        q.processAllAvailable()
        input.addData(TxnLogRecord(8L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 12:00:01")))
        q.processAllAvailable()
        // A commit for the evicted txn finds no buffered prewrites: nothing
        // may surface for txn 7.
        input.addData(TxnLogRecord(7L, COMMIT, 0L, 0L, 0.0, ts("2024-01-01 12:00:02")))
        q.processAllAvailable()
        val got = spark.table("txn_evict")
          .select($"txn_id", $"event_id").as[(Long, Long)].collect().toSet
        assert(got === Set((8L, 80L)))
      } finally q.stop()
    }
  }
}
