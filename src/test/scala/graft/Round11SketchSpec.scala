package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{Corpus, Relational, TextAnalysis}
import graft.streaming.StreamingAttribution

/** Semantic checks for the sketch/RAKE/streaming-attribution batch
  * (q174, q175, q176, StreamingAttribution): approximation priced against
  * exact ground truth with the published bounds, exact replays where the
  * operator is exact, and stream-equals-batch for the streaming twin. */
class Round11SketchSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  // --- q174 approx quantiles -------------------------------------------

  test("q174 approx percentiles respect the GK rank-error bound and are deterministic") {
    val accuracy = 10000
    val got = Relational.q174ApproxQuantiles(spark, sf, accuracy)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val values = sources.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (typ, n, p50, p90, p99) =>
      val vs = values(typ)
      assert(n === vs.length.toLong)
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
        // GK: the estimate's RANK is within n/accuracy of the target rank
        val lo = math.max(0, math.ceil(q * vs.length).toInt - 1 -
          vs.length / accuracy - 1)
        val hi = math.min(vs.length - 1, math.ceil(q * vs.length).toInt - 1 +
          vs.length / accuracy + 1)
        assert(est >= vs(lo) && est <= vs(hi),
          s"$typ p$q=$est outside rank band [${vs(lo)}, ${vs(hi)}]")
      }
    }
    val again = Relational.q174ApproxQuantiles(spark, sf, accuracy)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq,
      "repeat run must be deterministic")
  }

  // --- q175 HLL union --------------------------------------------------

  test("q175 estimates match exact distincts within the HLL error bound") {
    val got = Corpus.q175HllUnion(spark, sf)
      .as[(String, Double)].collect().toMap
    val words = sources.Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("word"))
      .as[(String, String)].collect()
    val exactBySource = words.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length).toMap
    val exactAll = words.map(_._2).distinct.length
    // rse at lgK=12 ≈ 1.6%; 5σ tolerance
    val tol = 5 * 1.04 / math.sqrt(1 << 12)
    exactBySource.foreach { case (s, n) =>
      assert(math.abs(got(s) - n) <= math.max(2.0, tol * n),
        s"source $s: est ${got(s)} vs exact $n")
    }
    assert(math.abs(got("__all__") - exactAll) <=
      math.max(2.0, tol * exactAll))
    // the union is a true merge: every source estimate ≤ the union's
    assert(exactBySource.keys.forall(s => got(s) <= got("__all__") + 1.0))
  }

  // --- q176 RAKE keywords ----------------------------------------------

  test("q176 equals an in-memory RAKE replay") {
    // tie-break like Spark/DuckDB: UTF-8 binary collation (q119's rule —
    // Scala's UTF-16 compare diverges on supplementary-plane chars)
    implicit val utf8: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compare(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stops = Set("a", "the")
    // phrases per (doc, seg); word freq/deg over phrase occurrences
    val phrases = collection.mutable.ArrayBuffer[Vector[String]]()
    docs.foreach { case (_, t) =>
      var cur = Vector.empty[String]
      t.split(" ", -1).foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) phrases += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) phrases += cur
    }
    val freq = collection.mutable.Map[String, Long]()
    val deg = collection.mutable.Map[String, Long]()
    phrases.foreach { p =>
      p.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1
        deg(w) = deg.getOrElse(w, 0L) + p.length
      }
    }
    val byPhrase = phrases.groupBy(_.mkString(" ")).map { case (ph, occ) =>
      val words = occ.head
      val sd = words.map(deg).sum
      val sF = words.map(freq).sum
      (ph, occ.length.toLong, sd, sF, sd.toDouble / sF.toDouble)
    }.toSeq
    val want = byPhrase.sortBy { case (ph, n, _, _, s) => (-s, -n, ph) }
      .take(20).zipWithIndex
      .map { case ((ph, n, sd, sF, s), i) => (i + 1L, ph, n, sd, sF, s) }
    val got = TextAnalysis.q176RakeKeywords(spark, sf)
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(got === want)
    // multi-word phrases must actually surface (the point of RAKE)
    assert(got.exists(_._2.contains(" ")))
  }

  // --- StreamingAttribution --------------------------------------------

  test("streaming attribution equals batch q169 over the same feed") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evs = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"),
        ($"value".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[StreamingAttribution.Ev].collect()
      .sortBy(e => (e.us, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val out = collection.mutable.ArrayBuffer.empty[graft.streaming.AttributedPurchase]
    val input = MemoryStream[StreamingAttribution.Ev]
    val q = StreamingAttribution.attribute(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.streaming.AttributedPurchase],
         _: Long) => out.synchronized { out ++= df.collect() }; ()
      }.start()
    try {
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    val gotByChannel = out.synchronized(out.toList).groupBy(_.channel)
      .map { case (ch, as) => (ch, as.length.toLong, as.map(_.cents).sum) }
      .toSet
    val want = Relational.q169Attribution(spark, sf)
      .as[(String, Long, Double)].collect()
      .map { case (ch, n, rev) => (ch, n, math.round(rev * 100)) }.toSet
    assert(gotByChannel === want)
    assert(gotByChannel.nonEmpty)
  }
}
