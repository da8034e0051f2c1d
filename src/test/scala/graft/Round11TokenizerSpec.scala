package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{Corpus, Similarity}
import graft.streaming.{QuotaAdmit, StreamingQuota}

/** Semantic checks for the tokenizer/rerank/streaming-quota batch
  * (q172, q173, StreamingQuota): exact in-memory replays at sf0.001 plus
  * the streaming quota's cross-batch and restart contracts. */
class Round11TokenizerSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  // --- q172 BPE merges -------------------------------------------------

  test("q172 equals an in-memory BPE training replay") {
    val words = sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .as[String].collect()
    var vocab = words.groupBy(identity).map { case (w, ws) =>
      (w.split("").toVector, ws.length.toLong)
    }.toVector
    val want = collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (round <- 1 to 8) {
      val counts = collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((x, y), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        want += ((round.toLong, x, y, x + y, c))
        vocab = vocab.map { case (syms, f) =>
          val acc = collection.mutable.ArrayBuffer[String]()
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == x && s == y)
              acc(acc.length - 1) = x + y
            else acc += s
          }
          (acc.toVector, f)
        }
      }
    }
    val got = Corpus.q172BpeMerges(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got === want.toSeq)
    assert(got.length === 8)
    // later merges can stack on earlier ones: with enough rounds some
    // merged symbol is longer than 2 chars on this corpus
    assert(got.exists(_._4.length > 2))
  }

  // --- q173 MMR rerank -------------------------------------------------

  test("q173 equals an independent greedy MMR replay and actually diversifies") {
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0
      for (i <- a.indices) d += a(i) * b(i)
      d
    }
    val dv = vecs.map { case (id, e) => (id, e.map(_.toDouble)) }
    val norms = dv.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val embOf = dv.toMap
    val q = embOf(0L)
    val rel = dv.filter(_._1 != 0L).map { case (id, e) =>
      (id, dot(q, e) / (norms(0L) * norms(id)))
    }
    val shortlist = rel.sortBy { case (id, r) => (-r, id) }.take(50)
    val lambda = 0.7
    val sel = collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val rem = collection.mutable.ArrayBuffer(shortlist: _*)
    while (sel.length < 10 && rem.nonEmpty) {
      val (score, c) = rem.map { case (id, r) =>
        val div = if (sel.isEmpty) 0.0
          else sel.map { case (sid, _, _) =>
            dot(embOf(id), embOf(sid)) / (norms(id) * norms(sid))
          }.max
        (lambda * r - (1 - lambda) * div, (id, r))
      }.minBy { case (s, (id, _)) => (-s, id) }
      sel += ((c._1, c._2, score))
      rem -= c
    }
    val want = sel.zipWithIndex.map { case ((id, r, s), i) =>
      (i + 1L, id, r, s)
    }.toSeq
    val got = Similarity.q173MmrRerank(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got === want)
    // rank 1 is the pure-relevance argmax
    assert(got.head._2 === shortlist.head._1)
    // diversification witness: MMR's selection differs from plain top-k
    val plainTopK = shortlist.take(10).map(_._1).toSet
    assert(got.map(_._2).toSet !== plainTopK,
      "MMR should reorder vs pure relevance on this corpus")
  }

  // --- StreamingQuota --------------------------------------------------

  test("streaming quota admits exactly the first n per source across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long)]
    val out = StreamingQuota.admit(input.toDS(), quota = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quota_stream").start()
    try {
      input.addData(("a", 2L), ("a", 1L), ("b", 10L))
      q.processAllAvailable()
      input.addData(("a", 3L), ("a", 4L), ("b", 11L), ("c", 100L))
      q.processAllAvailable()
      input.addData(("a", 5L), ("b", 12L), ("b", 13L))
      q.processAllAvailable()
      val got = spark.table("quota_stream")
        .as[(String, Long, Long)].collect().toSet
      // source a: batch1 admits 1,2 (doc_id order within batch); batch2
      // admits 3 and hits the cap — 4 and the batch-3 5 are dropped
      // source b: 10, 11, 12 admitted (13 loses the within-batch tie? no:
      // batch3 admits in doc_id order 12 then 13, but only one slot left)
      val want = Set(
        ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
        ("b", 10L, 1L), ("b", 11L, 2L), ("b", 12L, 3L),
        ("c", 100L, 1L))
      assert(got === want)
    } finally q.stop()
  }

  test("streaming quota rejects a non-positive quota at construction") {
    val input = MemoryStream[(String, Long)]
    val e = intercept[IllegalArgumentException] {
      StreamingQuota.admit(input.toDS(), quota = 0)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("streaming quota state survives a checkpointed restart") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = java.nio.file.Files.createTempDirectory("quota-ckpt").toString
    val out = collection.mutable.ArrayBuffer.empty[QuotaAdmit]
    def start(in: MemoryStream[(String, Long)]) =
      StreamingQuota.admit(in.toDS(), quota = 2).writeStream
        .outputMode("append").option("checkpointLocation", dir)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[QuotaAdmit], _: Long) =>
            out.synchronized { out ++= df.collect() }; ()
        }
        .start()
    val input1 = MemoryStream[(String, Long)]
    val q1 = start(input1)
    try {
      input1.addData(("s", 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    // new source, same checkpoint: MemoryStream offsets restart at 0, so
    // replay batch 0 (it is NOT re-processed — committed); the admitted
    // counter must carry over, so only ONE more admission fits
    val input2 = MemoryStream[(String, Long)]
    input2.addData(("s", 1L))
    val q2 = start(input2)
    try {
      input2.addData(("s", 2L), ("s", 3L))
      q2.processAllAvailable()
      val got = out.synchronized(out.toSet)
      assert(got.contains(QuotaAdmit("s", 1L, 1L)))
      assert(got.contains(QuotaAdmit("s", 2L, 2L)))
      assert(!got.exists(_.doc_id == 3L), "quota must not reset on restart")
    } finally q2.stop()
  }
}
