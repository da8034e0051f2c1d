package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{NearDupCandidate, StreamingNearDup}

/** Streaming MinHash-LSH near-dup (batch C2/q41's continuous twin):
  * replaying the documents table as a stream must flag exactly the batch
  * `lshCandidates` pair set (same kernels, same banding — the stateful
  * layer only remembers), with the signature-slot estimate replayable from
  * the batch signatures. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream replay flags exactly the batch LSH candidate pairs") { withRocksDb {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy(_._1)
    val chunks = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq

    val input = MemoryStream[(Long, String)]
    val out = collection.mutable.ArrayBuffer.empty[NearDupCandidate]
    val q = StreamingNearDup.detect(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[NearDupCandidate], _: Long) =>
        out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      chunks.foreach { part => input.addData(part.toSeq); q.processAllAvailable() }
      val gotPairs = out.synchronized(out.toList)
        .map(c => (c.doc_a, c.doc_b)).toSet
      val d = sources.Tables.documents(spark, sf)
        .select($"doc_id",
          graft.functions.TextHashFunctions.minhashSig(
            graft.functions.TextHashFunctions.wordShingleHashes($"text", 3),
            64).as("sig"))
      val wantPairs = operators.Dedup
        .lshCandidates(d, "doc_id", "sig", bands = 16)
        .as[(Long, Long)].collect().toSet
      assert(gotPairs === wantPairs)
      assert(gotPairs.nonEmpty, "sf corpus must contain LSH collisions")

      // the estimate replays from the batch signatures: matching slots / 64
      val sigs = d.as[(Long, Seq[Long])].collect().toMap
      out.synchronized(out.toList).foreach { c =>
        val eq = sigs(c.doc_a).iterator.zip(sigs(c.doc_b).iterator)
          .count { case (a, b) => a == b }
        assert(c.est_jaccard === eq.toDouble / 64.0, s"pair $c")
      }
    } finally q.stop()
  }}

  test("a bucket at cap stops admitting and emitting (no quadratic blowup)") { withRocksDb {
    // identical texts → identical signatures → every band bucket collides
    val clones = (1L to 10L).map(i => (i, "alpha beta gamma delta epsilon"))
    val input = MemoryStream[(Long, String)]
    val out = collection.mutable.ArrayBuffer.empty[NearDupCandidate]
    val q = StreamingNearDup.detect(input.toDS(), cap = 4)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[NearDupCandidate], _: Long) =>
        out.synchronized { out ++= df.collect() }; ()
      }
      .start()
    try {
      input.addData(clones); q.processAllAvailable()
      val pairs = out.synchronized(out.toList).map(c => (c.doc_a, c.doc_b)).toSet
      // only the first `cap` docs per bucket pair up: C(4,2) distinct pairs
      assert(pairs === (for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)).toSet)
      out.synchronized(out.toList).foreach(c => assert(c.est_jaccard === 1.0))
    } finally q.stop()
  }}
}
