package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Corpus
import graft.streaming.StreamingSample

/** Continuous per-source uniform sample ([[graft.streaming.StreamingSample]]):
  * the maintained sample must be BIT-EQUAL to the batch draw (q132) over
  * the same rows, no matter how the stream is sliced or ordered. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream sample equals the batch q132 draw bit-for-bit") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val k = 10
    val docs = sources.Tables.documents(spark, sf)
      .select($"source", $"doc_id").as[(String, Long)].collect()
    // adversarial slicing: reverse order, uneven batches
    val shuffled = docs.sortBy { case (_, id) => -id }
    val (b1, rest) = shuffled.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val input = MemoryStream[(String, Long)]
    val q = StreamingSample.sample(input.toDS(), k)
      .writeStream.outputMode("update")
      .format("memory").queryName("sample_stream").start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("sample_stream")
        .as[(String, Long, String, Long, Long)].collect()
      val hwm = rows.groupBy(_._1).view.mapValues(_.map(_._5).max).toMap
      val got = rows
        .filter { case (s, _, _, _, n) => n == hwm(s) }
        .map { case (s, id, pri, rk, _) => (s, id, pri, rk) }.toSet

      val want = Corpus.q132UniformSample(spark, sf, k)
        .select($"source", $"doc_id", $"pri", $"rk")
        .as[(String, Long, String, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
      // every source's high-water mark covers its full feed (nothing lost)
      val perSource = docs.groupBy(_._1).view.mapValues(_.length.toLong)
      perSource.foreach { case (s, n) => assert(hwm(s) === n, s"source $s") }
    } finally q.stop()
  }
}
