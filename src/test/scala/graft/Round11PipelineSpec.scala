package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Relational}
import graft.functions.BloomFilters

/** Semantic checks for the round-11 batch-2 operators (q129-q134) — each
  * result re-derived brute-force from collected rows at sf0.001,
  * independent of the DataFrame plan under test. Oracle parity for
  * q129-q133 runs separately at sf0.01; q134 is rows-only there, so THIS
  * suite is its correctness gate.
  */
class Round11PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, user_id, us, event_type, value) per user, time-ordered. */
  private lazy val byUser: Map[Long, Seq[(Long, Long, Long, String, Double)]] =
    graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"), $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().toSeq
      .groupBy(_._2).view.mapValues(_.sortBy(e => (e._3, e._1))).toMap

  /** Exact cents of a 2-decimal double (the DECIMAL(14,2) the ops use). */
  private def cents(v: Double): Long = math.round(v * 100d)

  // --- q129 rolling z-score anomaly ------------------------------------

  test("q129 flags exactly the brute-force trailing-window outliers") {
    val got = Relational.q129ZscoreAnomaly(spark, sf)
      .select($"event_id", $"z").as[(Long, Double)].collect().toMap
    val want = scala.collection.mutable.Map.empty[Long, Double]
    for ((_, es) <- byUser; idx <- es.indices) {
      val frame = es.slice(math.max(0, idx - 20), idx)
      if (frame.length >= 10) {
        // decimal-exact frame sums (cents / 10⁻⁴), then the identical
        // IEEE expression the operator and its oracle evaluate
        val n = frame.length.toDouble
        val s1 = java.math.BigDecimal
          .valueOf(frame.map(e => cents(e._5)).sum, 2).doubleValue
        val s2 = java.math.BigDecimal.valueOf(frame.map { e =>
          val c = cents(e._5); c * c
        }.sum, 4).doubleValue
        val mu = s1 / n
        val sd = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1d), 0d))
        val z = (es(idx)._5 - mu) / sd
        if (sd > 0d && math.abs(z) > 2.5) want(es(idx)._1) = z
      }
    }
    assert(got.keySet === want.keySet)
    assert(want.nonEmpty, "data must exercise anomalies")
    got.foreach { case (id, z) => assert(math.abs(z - want(id)) < 1e-12) }
  }

  // --- q130 linearly-weighted moving average ---------------------------

  test("q130 equals the brute-force WMA-10 on full frames only") {
    val got = Relational.q130WeightedMa(spark, sf)
      .select($"event_id", $"wma").as[(Long, Double)].collect().toMap
    val want = scala.collection.mutable.Map.empty[Long, Double]
    for ((_, es) <- byUser; idx <- es.indices if idx >= 9) {
      val rn = idx + 1L
      val frame = es.slice(idx - 9, idx + 1).zipWithIndex
      val s0 = java.math.BigDecimal
        .valueOf(frame.map { case (e, _) => cents(e._5) }.sum, 2).doubleValue
      val s1 = java.math.BigDecimal.valueOf(frame.map { case (e, j) =>
        cents(e._5) * (rn - 9 + j)
      }.sum, 2).doubleValue
      want(es(idx)._1) = ((10L - rn).toDouble * s0 + s1) / 55d
    }
    assert(got.keySet === want.keySet)
    assert(got.nonEmpty, "data must produce full frames")
    got.foreach { case (id, w) => assert(math.abs(w - want(id)) < 1e-12) }
    // direct-form cross-check on one frame: Σ v·w / 55 with w = 1..10
    val (u, es) = byUser.maxBy(_._2.length)
    val direct = es.slice(0, 10).zipWithIndex
      .map { case (e, j) => e._5 * (j + 1) }.sum / 55d
    assert(math.abs(want(es(9)._1) - direct) < 1e-9, s"user $u frame 10")
  }

  // --- q131 top session paths ------------------------------------------

  test("q131 equals the brute-force sessionized path ranking") {
    val gapUs = 30L * 60L * 1000000L
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((_, es) <- byUser) {
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var lastUs = Long.MinValue
      for (e <- es) {
        if (lastUs == Long.MinValue || e._3 - lastUs > gapUs) {
          if (cur.nonEmpty) paths += cur.take(8).mkString(">")
          cur = scala.collection.mutable.ArrayBuffer.empty[String]
        }
        cur += e._4
        lastUs = e._3
      }
      if (cur.nonEmpty) paths += cur.take(8).mkString(">")
    }
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(20).zipWithIndex
      .map { case ((p, n), i) => (p, n, i + 1L) }.toSet
    val got = Relational.q131TopPaths(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q132 deterministic uniform sample -------------------------------

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("q132 draws exactly the k smallest hash priorities per source") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"doc_id").as[(String, Long)].collect().toSeq
    val want = docs.map { case (s, id) => (s, id, md5hex(s"smpl:$id")) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(10).zipWithIndex
          .map { case ((s, id, pri), i) => (s, id, pri, i + 1L) }
      }.toSet
    val got = Corpus.q132UniformSample(spark, sf)
      .as[(String, Long, String, Long)].collect().toSet
    assert(got === want)
    val perSource = got.groupBy(_._1).view.mapValues(_.size)
    assert(perSource.values.forall(_ == 10), s"k per source: $perSource")
  }

  test("q132 rank filter compiles to partial+final WindowGroupLimit") {
    val p = Corpus.q132UniformSample(spark, sf)
      .queryExecution.executedPlan.toString
    val partial = p.indexOf("WindowGroupLimit")
    assert(partial >= 0, s"no WindowGroupLimit in:\n$p")
    assert(p.indexOf("WindowGroupLimit", partial + 1) > partial,
      s"expected Partial AND Final WindowGroupLimit in:\n$p")
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(exchange >= 0 && p.lastIndexOf("WindowGroupLimit") > exchange,
      "expected the partial limit BELOW (after, in tree print) the exchange")
  }

  // --- BloomFilters + q133 ---------------------------------------------

  test("bloom probe has no false negatives and stays selective") {
    val build = spark.range(1000).select(xxhash64($"id").as("h"))
    val probe = BloomFilters.buildProbe(build, col("h"), 4096).get
    val present = spark.range(1000).select(xxhash64($"id").as("h"))
      .filter(probe).count()
    assert(present === 1000L, "a bloom can NEVER drop an inserted value")
    val absent = spark.range(1000000, 1010000)
      .select(xxhash64($"id").as("h")).filter(probe).count()
    assert(absent < 2000L, s"saturated sketch: $absent/10000 false positives")
  }

  test("buildProbe on an empty build side returns None") {
    val empty = spark.range(0).select(xxhash64($"id").as("h"))
    assert(BloomFilters.buildProbe(empty, col("h"), 64).isEmpty)
  }

  private def decontamWant(benchMod: Int,
      minShared: Int): Map[Long, (Long, Boolean)] = {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val grams = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    }
    val bench = grams.filter(_._1 % benchMod == 0).flatMap(_._2).toSet
    grams.filter(_._1 % benchMod != 0)
      .map { case (id, g) => id -> (g.count(bench), ()) }
      .collect { case (id, (n, _)) if n > 0 =>
        id -> (n.toLong, n >= minShared)
      }.toMap
  }

  test("q133 equals the exact decontamination despite the bloom prefilter") {
    val got = Corpus.q133BloomDecontam(spark, sf)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = decontamWant(41, 2)
    assert(want.nonEmpty, "data must exercise contamination")
    assert(got === want)
  }

  test("q133 stays exact even when the bloom is saturated (tiny sketch)") {
    val got = Corpus.q133BloomDecontam(spark, sf, expectedItems = 8)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === decontamWant(41, 2))
  }

  // --- q135 hybrid RRF retrieval ---------------------------------------

  test("q135 RRF fusion equals a replay from its two input rankings") {
    // lexical side: q74's output (its own spec + oracle gate it)
    val lex = graft.operators.Corpus.q74Bm25(spark, sf, k = 100)
      .as[(Long, Double, Long)].collect()
    // quality side: replay q121's integer fold + global rank
    val qRank = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ", -1).map(w => (w.length * 7) % 13 - 6L).sum
      }
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, s), i) => id -> (s, i + 1L) }.toMap
    val want = lex.map { case (id, bm, rl) =>
        val (qs, rq) = qRank(id)
        (id, bm, rl, qs, rq, 1.0 / (60.0 + rl) + 1.0 / (60.0 + rq))
      }
      .sortBy { case (id, _, _, _, _, rrf) => (-rrf, id) }.take(20).zipWithIndex
      .map { case ((id, bm, rl, qs, rq, rrf), i) =>
        (id, bm, rl, qs, rq, rrf, i + 1L)
      }.toSet
    val got = Corpus.q135HybridRrf(spark, sf)
      .as[(Long, Double, Long, Long, Long, Double, Long)].collect().toSet
    assert(got === want)
    // the quality prior must genuinely re-rank, or the fusion is a no-op
    val fusedOrder = got.toSeq.sortBy(_._7).map(_._1)
    val lexOrder = lex.sortBy(_._3).map(_._1).take(20).toSeq
    assert(fusedOrder !== lexOrder, "data must exercise re-ranking")
  }

  // --- q134 PageRank ---------------------------------------------------

  test("q134 equals an in-memory power iteration within 1e-9") {
    val edges = Dedup.q43NgramJaccard(spark, sf, 0.6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet
    assert(nodes.nonEmpty, "data must produce a near-dup graph")
    val n = nodes.size.toDouble
    var ranks = nodes.map(_ -> 1d / n).toMap
    for (_ <- 1 to 10) {
      val in = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0d)
      for ((u, vs) <- adj; v <- vs) in(v) += ranks(u) / vs.length
      ranks = nodes.map(v => v -> ((1d - 0.85) / n + 0.85 * in(v))).toMap
    }
    val got = Corpus.q134PageRank(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === nodes)
    got.foreach { case (id, r) =>
      assert(math.abs(r - ranks(id)) < 1e-9, s"doc $id: $r vs ${ranks(id)}")
    }
    // no dangling mass on a symmetric graph: total rank stays 1
    assert(math.abs(got.values.sum - 1d) < 1e-6)
  }
}
