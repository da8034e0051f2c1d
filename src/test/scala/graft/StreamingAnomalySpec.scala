package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAnomaly

/** Streaming z-score detector (q129's continuous twin): replaying the
  * events table IN ORDER through the processor must reproduce the batch
  * detector bit-for-bit — same flagged events, same mu/sd/z doubles —
  * across micro-batch boundaries and a mid-feed restart (state rides the
  * checkpoint, not the JVM). */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  // (user_id, event_id, us, value, cents) with cents from the PLAN-side
  // decimal cast — the same rounding the batch operator applies
  private def observations(): Array[StreamingAnomaly.Obs] =
    sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"value",
        ($"value".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[StreamingAnomaly.Obs].collect()
      .sortBy(o => (o._3, o._2)) // global event order

  private def batchExpected(): Map[Long, (Double, Double, Double)] =
    operators.Relational.q129ZscoreAnomaly(spark, sf)
      .select($"event_id", $"mu", $"sd", $"z")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("in-order replay reproduces batch q129 bit-for-bit") { withRocksDb {
    val obs = observations()
    val chunks = obs.grouped(math.max(1, obs.length / 4 + 1)).toSeq
    val input = MemoryStream[StreamingAnomaly.Obs]
    val out = collection.mutable.ArrayBuffer.empty[streaming.AnomalyAlert]
    val q = StreamingAnomaly.detect(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[streaming.AnomalyAlert], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      chunks.foreach { part => input.addData(part.toSeq); q.processAllAvailable() }
      val got = out.synchronized(out.toList)
        .map(a => a.event_id -> ((a.mu, a.sd, a.z))).toMap
      val expect = batchExpected()
      assert(got.keySet === expect.keySet)
      // bit-equality, not tolerance: the processor replays the plan's ops
      got.foreach { case (eid, v) => assert(v === expect(eid), s"event $eid") }
      assert(got.nonEmpty, "sf data must produce anomalies")
    } finally q.stop()
  }}

  test("sums stay exact past Long c*c and 2^53 (BigInt/BigDecimal path)") { withRocksDb {
    // cents ≈ 4e9 → c² ≈ 1.6e19 > Long.MaxValue: a Long accumulator wraps
    // negative; the BigDecimal conversion must match the plan's
    // decimal→double single rounding computed here independently
    val big = 4000000000L // $40M in cents
    val obs: Seq[StreamingAnomaly.Obs] = (1 to 12).map { i =>
      val cents = big + i * 1000000L
      (7L, i.toLong, i.toLong * 1000000L, cents.toDouble / 100.0, cents)
    }
    val input = MemoryStream[StreamingAnomaly.Obs]
    val out = collection.mutable.ArrayBuffer.empty[streaming.AnomalyAlert]
    val q = StreamingAnomaly.detect(input.toDS(), zThresh = 0.0)
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[streaming.AnomalyAlert], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      input.addData(obs); q.processAllAvailable()
      val alerts = out.synchronized(out.toList)
      assert(alerts.nonEmpty, "zThresh=0 must fire once priors exist")
      alerts.foreach { a =>
        val prior = obs.filter(_._2 < a.event_id).map(_._5)
        val n = prior.length
        val s1 = new java.math.BigDecimal(
          prior.foldLeft(BigInt(0))(_ + _).bigInteger, 2).doubleValue
        val s2 = new java.math.BigDecimal(
          prior.foldLeft(BigInt(0))((x, c) => x + BigInt(c) * BigInt(c))
            .bigInteger, 4).doubleValue
        val mu = s1 / n
        val sd = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1d), 0d))
        assert(a.mu === mu && a.sd === sd, s"event ${a.event_id}")
        assert(!a.z.isNaN && !a.z.isInfinite)
      }
    } finally q.stop()
  }}

  test("state survives a mid-feed restart from the checkpoint") { withRocksDb {
    val obs = observations()
    val (first, second) = obs.splitAt(obs.length / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("anomaly-ckpt").toString
    val out = collection.mutable.ArrayBuffer.empty[streaming.AnomalyAlert]

    val input1 = MemoryStream[StreamingAnomaly.Obs]
    val q1 = StreamingAnomaly.detect(input1.toDS())
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[streaming.AnomalyAlert], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      input1.addData(first.toSeq); q1.processAllAvailable()
    } finally q1.stop()

    // new source, same checkpoint: rings must resume, not restart —
    // MemoryStream offsets restart at 0, so replay the first half as
    // batch 0 again; the committed batch is NOT re-processed, only the
    // new data after it is
    val input2 = MemoryStream[StreamingAnomaly.Obs]
    input2.addData(first.toSeq)
    val q2 = StreamingAnomaly.detect(input2.toDS())
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[streaming.AnomalyAlert], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      input2.addData(second.toSeq); q2.processAllAvailable()
      val got = out.synchronized(out.toList)
        .map(a => a.event_id -> ((a.mu, a.sd, a.z))).toMap
      val expect = batchExpected()
      assert(got.keySet === expect.keySet)
      got.foreach { case (eid, v) => assert(v === expect(eid), s"event $eid") }
    } finally q2.stop()
  }}
}
