package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingTopK

/** Continuous Misra-Gries heavy hitters ([[graft.streaming.StreamingTopK]]):
  * the MG survival/undercount guarantees must hold on the FINAL state
  * across micro-batches, with per-bucket state bounded by cap. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val cap = 8
  private val buckets = 4

  test("planted heavy tokens survive batches; state and bounds hold") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[String]
    val out = StreamingTopK.track(input.toDS(), cap, buckets)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("topk_stream").start()
    try {
      // batch 1: one hot token among distinct noise; batch 2: a second
      // hot token plus more of the first — survival must span batches
      val batch1 = Seq.fill(60)("hot1") ++ (1 to 80).map(i => s"rare$i")
      val batch2 = Seq.fill(40)("hot1") ++ Seq.fill(50)("hot2") ++
        (81 to 140).map(i => s"rare$i")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()

      // reconstruct the current candidate set: per bucket, rows at the
      // high-water n_bucket (the contract consumers are told to apply)
      val rows = spark.table("topk_stream")
        .as[(Int, String, Long, Long)].collect()
      val hwm = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      val current = rows
        .filter { case (b, t, _, n) => n == hwm(b) && t != null }

      // per-bucket state bound: ≤ cap candidates
      current.groupBy(_._1).foreach { case (b, cs) =>
        assert(cs.length <= cap, s"bucket $b exceeded cap: ${cs.length}")
      }

      // exact per-token/per-bucket truth from the fed data
      val fed = batch1 ++ batch2
      val trueCount = fed.groupBy(identity).view.mapValues(_.size.toLong)
      val nBucket = fed.groupBy(StreamingTopK.bucketOf(_, buckets))
        .view.mapValues(_.size.toLong).toMap
      // n_bucket stamped on emissions must equal the true bucket feed
      hwm.foreach { case (b, n) => assert(n === nBucket(b), s"bucket $b n") }

      // MG survival: every token above its bucket's threshold is present
      val present = current.map(c => c._2 -> c._3).toMap
      for ((t, c) <- trueCount) {
        val b = StreamingTopK.bucketOf(t, buckets)
        if (c > nBucket(b) / (cap + 1))
          assert(present.contains(t), s"$t (count $c) must survive")
      }
      assert(present.contains("hot1") && present.contains("hot2"))

      // undercount bound: lb ≤ true, true − lb ≤ n_bucket/(cap+1)
      for ((t, lb) <- present) {
        val b = StreamingTopK.bucketOf(t, buckets)
        assert(lb <= trueCount(t), s"$t lower bound exceeds truth")
        assert(trueCount(t) - lb <= nBucket(b) / (cap + 1),
          s"$t undercount too large: $lb vs ${trueCount(t)}")
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
