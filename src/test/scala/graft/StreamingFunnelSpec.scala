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
    val q = StreamingFunnel.funnelTws(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_tws").start()
    try {
      thirds.foreach { part => input.addData(part.toSeq); q.processAllAvailable() }
      // last emission per user (update mode re-emits on refinement)
      val got = spark.table("funnel_tws")
        .groupBy($"user_id")
        .agg(last($"first_view_us").as("v"), last($"first_click_us").as("c"),
          last($"first_purchase_us").as("p"), last($"stage").as("s"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
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
    val q = StreamingFunnel.funnelTws(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_late").start()
    try {
      // click at t=5, view at t=10: click precedes the view → stage 1
      input.addData((7L, "click", 5L), (7L, "view", 10L))
      q.processAllAvailable()
      val mid = spark.table("funnel_late").orderBy($"first_view_us")
        .as[StreamingFunnel.FunnelRow].collect().last
      assert(mid.stage === 1L && mid.first_click_us === -1L)
      // late view at t=1 arrives: the t=5 click NOW follows a view; then a
      // purchase at t=6 completes the funnel
      input.addData((7L, "view", 1L), (7L, "purchase", 6L))
      q.processAllAvailable()
      val fin = spark.table("funnel_late")
        .groupBy($"user_id").agg(last($"first_view_us"), last($"first_click_us"),
          last($"first_purchase_us"), last($"stage"))
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(fin === ((7L, 1L, 5L, 6L, 3L)))
    } finally q.stop()
  } }
}
