package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel

/** Streaming funnel (A36's continuous twin): replaying the events table as
  * an OUT-OF-ORDER stream in several batches must converge to the batch
  * q82 answer exactly — late views re-qualify earlier clicks. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream replay of the events table converges to the batch funnel") { withRocksDb {
    // deterministic scramble: order by a hash, so views often arrive AFTER
    // clicks they qualify — the exact hazard the processor must absorb
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, String, Long)].collect()
      .sortBy { case (u, t, us) => (us * 2654435761L + u) % 1000003 }
    val thirds = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq

    val input = MemoryStream[(Long, String, Long)]
    // collect (batchId, row): "latest emission per user" needs an explicit
    // batch order — last() over the memory-sink table has none and can
    // surface a stale pre-refinement row
    val out = collection.mutable.ArrayBuffer.empty[(Long, StreamingFunnel.FunnelRow)]
    val q = StreamingFunnel.funnelTws(input.toDS())
      .writeStream.outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingFunnel.FunnelRow], id: Long) =>
          out.synchronized { out ++= df.collect().map(id -> _) }; ()
      }
      .start()
    try {
      thirds.foreach { part => input.addData(part.toSeq); q.processAllAvailable() }
      val got = out.synchronized(out.toList)
        .groupBy(_._2.user_id).view.mapValues { rows =>
          val r = rows.maxBy(_._1)._2
          (r.first_view_us, r.first_click_us, r.first_purchase_us, r.stage)
        }.toMap
      val expect = graft.operators.Relational.q82Funnel(spark, sf)
        .select($"user_id",
          coalesce(unix_micros($"first_view".cast("timestamp")), lit(-1L)),
          coalesce(unix_micros($"first_click".cast("timestamp")), lit(-1L)),
          coalesce(unix_micros($"first_purchase".cast("timestamp")), lit(-1L)),
          $"stage")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      assert(got === expect)
    } finally q.stop()
  } }

  test("funnel state survives a checkpointed restart") { withRocksDb {
    val base = java.nio.file.Files.createTempDirectory("funnelckpt").toString
    val input = MemoryStream[(Long, String, Long)]
    val out = collection.mutable.ArrayBuffer.empty[StreamingFunnel.FunnelRow]
    // memory sink refuses checkpoint recovery — foreachBatch supports it
    def start() = StreamingFunnel.funnelTws(input.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingFunnel.FunnelRow], _: Long) =>
          out.synchronized { out ++= df.collect() }; ()
      }
      .start()

    val q1 = start()
    input.addData((3L, "view", 100L))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: the stored first_view must qualify the
    // click/purchase arriving after the restart
    val q2 = start()
    try {
      input.addData((3L, "click", 200L), (3L, "purchase", 300L))
      q2.processAllAvailable()
      assert(out.synchronized(out.last) ===
        StreamingFunnel.FunnelRow(3L, 100L, 200L, 300L, 3L))
    } finally q2.stop()
  } }

  test("a late earlier view re-qualifies a click seen before it") { withRocksDb {
    val input = MemoryStream[(Long, String, Long)]
    val out = collection.mutable.ArrayBuffer.empty[(Long, StreamingFunnel.FunnelRow)]
    val q = StreamingFunnel.funnelTws(input.toDS())
      .writeStream.outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamingFunnel.FunnelRow], id: Long) =>
          out.synchronized { out ++= df.collect().map(id -> _) }; ()
      }
      .start()
    def latest = out.synchronized(out.maxBy(_._1)._2)
    try {
      // click at t=5, view at t=10: click precedes the view → stage 1
      input.addData((7L, "click", 5L), (7L, "view", 10L))
      q.processAllAvailable()
      val mid = latest
      assert(mid.stage === 1L && mid.first_click_us === -1L)
      // late view at t=1 arrives: the t=5 click NOW follows a view; then a
      // purchase at t=6 completes the funnel
      input.addData((7L, "view", 1L), (7L, "purchase", 6L))
      q.processAllAvailable()
      val fin = latest
      assert(fin === StreamingFunnel.FunnelRow(7L, 1L, 5L, 6L, 3L))
    } finally q.stop()
  } }
}
