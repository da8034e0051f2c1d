package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Relational, Similarity}

/** Semantic checks for the round-11 late widening batch (q160-q165):
  * results re-derived brute-force from collected rows at sf0.001,
  * independent of the DataFrame plan under test, plus plan-shape
  * assertions for each operator's scale claim. Oracle parity runs
  * separately at sf0.01.
  */
class Round11LateSpec extends SparkSpec {
  import spark.implicits._

  private def levenshtein(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val curr = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      curr(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
      }
      Array.copy(curr, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  // --- q160 sorted neighborhood ----------------------------------------

  test("q160 equals a brute-force sorted-window scan") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ranked = docs.sortBy { case (id, t) => (t.take(24), id) }
    val want = (for {
      i <- ranked.indices
      j <- (i + 1) to math.min(i + 5, ranked.length - 1)
      d = levenshtein(ranked(i)._2, ranked(j)._2) if d <= 20
    } yield (ranked(i)._1, ranked(j)._1, d.toLong)).toSet
    val got = Dedup.q160SortedNeighborhood(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q160 plans no single-partition window and no cartesian/range join") {
    val p = Dedup.q160SortedNeighborhood(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"one-task window:\n$p")
    assert(!p.contains("Cartesian"), s"cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"nested-loop join:\n$p")
  }

  // --- q161 hard negatives ---------------------------------------------

  test("q161 equals brute-force other-label cosine top-k") {
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        transform($"embedding", _.cast("double")).as("emb"))
      .as[(Long, Int, Seq[Double])].collect()
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val want = vecs.filter(_._1 < 5).flatMap { case (aid, al, ae) =>
      val an = math.sqrt(dot(ae, ae))
      vecs.filter(_._2 != al)
        .map { case (nid, _, ne) =>
          (nid, dot(ae, ne) / (an * math.sqrt(dot(ne, ne)))) }
        .filter(_._2 < 0.95)
        .sortBy { case (nid, s) => (-s, nid) }
        .take(10).zipWithIndex
        .map { case ((nid, _), i) => (aid, (i + 1).toLong, nid) }
    }.toSet
    val got = Similarity.q161HardNegatives(spark, sf)
      .select($"anchor_id", $"rank", $"negative_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 50)
  }

  test("q161 every negative has a different label than its anchor") {
    val labels = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val pairs = Similarity.q161HardNegatives(spark, sf)
      .select($"anchor_id", $"negative_id").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, n) => labels(a) != labels(n) })
  }

  // --- q162 RFM --------------------------------------------------------

  test("q162 quintiles equal a sequential NTILE replay") {
    val base = sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(
        unix_micros(max($"o_orderdate").cast("timestamp")).as("lo"),
        count(lit(1)).as("f"),
        sum($"o_totalprice".cast("decimal(14,2)")).as("m"))
      .as[(Long, Long, Long, BigDecimal)].collect()
    def ntile5[K: Ordering](xs: Array[(Long, K)]): Map[Long, Long] = {
      val n = xs.length; val q = n / 5; val r = n % 5
      xs.sortBy(_._2).zipWithIndex.map { case ((ck, _), i) =>
        // SQL NTILE: first r buckets take q+1 rows
        val b = if (i < r * (q + 1)) i / (q + 1) else r + (i - r * (q + 1)) / q
        ck -> (b + 1).toLong
      }.toMap
    }
    val rW = ntile5(base.map { case (ck, lo, _, _) => ck -> ((-lo, ck)) })
    val fW = ntile5(base.map { case (ck, _, f, _) => ck -> ((-f, ck)) })
    val mW = ntile5(base.map { case (ck, _, _, m) => ck -> ((-m, ck)) })
    val got = Relational.q162Rfm(spark, sf)
      .select($"custkey", $"r_score", $"f_score", $"m_score")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === base.length)
    got.foreach { case (ck, r, f, m) =>
      assert(r === rW(ck), s"r_score for $ck")
      assert(f === fW(ck), s"f_score for $ck")
      assert(m === mW(ck), s"m_score for $ck")
    }
  }

  test("q162 plans no single-partition window (Rank.ntile throughout)") {
    val p = Relational.q162Rfm(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"one-task ntile:\n$p")
  }

  // --- q163 chi-squared drift ------------------------------------------

  test("q163 equals a per-week-pair chi-squared replay") {
    val counts = sources.Tables.events(spark, sf)
      .select(expr("unix_micros(cast(ts as timestamp)) div 604800000000")
        .as("w"), $"event_type")
      .as[(Long, String)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val weeks = counts.keys.map(_._1).toSeq.distinct.sorted
    val types = counts.keys.map(_._2).toSet
    val totals = weeks.map(w => w ->
      types.toSeq.map(t => counts.getOrElse((w, t), 0L)).sum).toMap
    val want = (for {
      w <- weeks if totals.contains(w - 1) && weeks.contains(w - 1)
      t <- types
      cur = counts.getOrElse((w, t), 0L)
      ref = counts.getOrElse((w - 1, t), 0L)
      if cur > 0 || ref > 0
    } yield {
      val expected = ref.toDouble * totals(w).toDouble / totals(w - 1).toDouble
      val contrib = if (expected > 0)
        (cur.toDouble - expected) * (cur.toDouble - expected) / expected
      else cur.toDouble
      (w, t) -> ((ref, cur, contrib, contrib > 25.0))
    }).toMap
    val got = Relational.q163DriftChi2(spark, sf)
      .select($"week", $"event_type", $"ref_n", $"cur_n", $"contrib",
        $"drifted")
      .as[(Long, String, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q164 skip-gram counts -------------------------------------------

  test("q164 equals brute-force windowed pair counting") {
    val texts = sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val counts = texts.map(_.split(" ")).filter(_.length >= 2).flatMap { ws =>
      for {
        i <- ws.indices.dropRight(1)
        j <- (i + 1) to math.min(i + 3, ws.length - 1)
      } yield (ws(i), ws(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq.filter(_._2 >= 5)
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(100)
      .zipWithIndex
      .map { case (((w1, w2), c), i) => (w1, w2, c, (i + 1).toLong) }.toSet
    val got = Corpus.q164SkipgramCounts(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q164 ranks after a TakeOrdered top-k, never a global sort") {
    val p = Corpus.q164SkipgramCounts(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"missing top-k:\n$p")
  }

  // --- q165 largest-remainder allocation -------------------------------

  test("q165 quotas sum exactly to the budget and match Hamilton's method") {
    val rows = Corpus.q165BudgetAllocation(spark, sf)
      .select($"source", $"n_s", $"quota", $"pos")
      .as[(String, Long, Long, Long)].collect()
    val quotas = rows.map(r => (r._1, r._2, r._3)).distinct
    assert(quotas.map(_._3).sum === 100L)
    // replay Hamilton: floor allocation + largest remainders
    val n = quotas.map(_._2).sum
    val base = quotas.map { case (s, ns, _) => (s, ns, 100L * ns / n,
      100L * ns % n) }
    val extra = (100L - base.map(_._3).sum).toInt
    val bumped = base.sortBy { case (s, _, _, rem) => (-rem, s) }
      .zipWithIndex
      .map { case ((s, _, b, _), i) => s -> (b + (if (i < extra) 1 else 0)) }
      .toMap
    quotas.foreach { case (s, _, q) => assert(q === bumped(s), s"quota $s") }
    // exactly quota docs selected per source, positions contiguous from 1
    rows.groupBy(_._1).foreach { case (s, rs) =>
      val q = rs.head._3
      assert(rs.length.toLong === q, s"selected count for $s")
      assert(rs.map(_._4).sorted.toSeq === (1L to q).toSeq, s"positions $s")
    }
  }

  test("q165 selection is deterministic across runs") {
    val a = Corpus.q165BudgetAllocation(spark, sf)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Corpus.q165BudgetAllocation(spark, sf)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }
}
