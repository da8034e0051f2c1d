package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Relational, TextAnalysis}

/** Semantic witnesses for the round-12 growth batch (q207-q217): exact
  * in-memory replays, algebraic invariants, and plan-shape assertions —
  * alongside each query's exact DuckDB oracle. */
class Round12GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("q209 pushes both OR-envelopes into the scans") {
    val p = Relational.q209DisjunctiveRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    // the lineitem scan must carry the quantity envelope, the part scan the
    // brand/size disjunction — neither side reads the table unfiltered
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity envelope not pushed:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), Or(Or(And(EqualTo(p_brand"),
      s"brand/size envelope not pushed:\n$p")
  }

  test("q211 gini equals a sorted in-memory replay and sits in [0, 1)") {
    val revs = sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(14,2)")).as("rev"))
      .select($"o_custkey", $"rev".cast("string"))
      .as[(Long, String)].collect()
      .map { case (k, r) => (k, BigDecimal(r)) }
    val sorted = revs.sortBy { case (k, r) => (r, k) }
    val n = sorted.length
    val total = sorted.map(_._2).sum
    val weighted = sorted.zipWithIndex
      .map { case ((_, r), i) => r * (i + 1) }.sum
    val want = 2.0 * weighted.toDouble / (n.toDouble * total.toDouble) -
      (n + 1).toDouble / n.toDouble
    val got = Relational.q211Gini(spark, sf)
      .select($"n", $"gini").as[(Long, Double)].head()
    assert(got._1 === n.toLong)
    assert(got._2 === want)
    assert(got._2 >= 0.0 && got._2 < 1.0)
  }

  test("q212 U statistic equals an in-memory rank replay") {
    val rows = sources.Tables.orders(spark, sf)
      .join(sources.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"o_orderkey", $"c_mktsegment",
        $"o_totalprice".cast("decimal(14,2)").cast("string"))
      .as[(Long, String, String)].collect()
      .map { case (k, s, v) => (k, s, BigDecimal(v)) }
    val ranked = rows.sortBy { case (k, _, v) => (v, k) }.zipWithIndex
    val nA = rows.count(_._2 == "BUILDING").toLong
    val nB = rows.count(_._2 == "MACHINERY").toLong
    val rankSumA = ranked
      .collect { case ((_, "BUILDING", _), i) => i + 1L }.sum
    val u = rankSumA - nA * (nA + 1) / 2
    val got = Relational.q212MannWhitney(spark, sf)
      .select($"n_a", $"n_b", $"u", $"z")
      .as[(Long, Long, Long, Double)].head()
    assert((got._1, got._2, got._3) === ((nA, nB, u)))
    // z is U standardized under H0 — finite and sane for real data
    assert(math.abs(got._4) < 50.0)
  }

  test("q213 benford shares sum to 1 over all orders, chi2 terms >= 0") {
    val got = Relational.q213Benford(spark, sf)
      .select($"digit", $"cnt", $"share", $"benford", $"chi2_term")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === (1 to 9))
    assert(got.map(_._2).sum === sources.Tables.orders(spark, sf).count())
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    assert(got.forall(_._5 >= 0.0))
  }

  test("q214 acf equals an in-memory lagged-Pearson replay") {
    val counts = sources.Tables.events(spark, sf)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000L"))
      .as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = (1 to 7).map { k =>
      val pairs = counts.toSeq.flatMap { case (d, x) =>
        counts.get(d + k).map(y => (x, y)) }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      k.toLong -> ((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)))
    }.toMap
    val got = Relational.q214Acf(spark, sf)
      .select($"lag", $"acf").as[(Long, Double)].collect().toMap
    assert(got === want)
    assert(got.values.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
  }

  test("q215 longest runs equal a linear-scan replay") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      var best = (0L, "")
      var i = 0
      while (i < ws.length) {
        var j = i
        while (j < ws.length && ws(j) == ws(i)) j += 1
        val run = (j - i).toLong
        if (run > best._1 || (run == best._1 && ws(i) < best._2))
          best = (run, ws(i))
        i = j
      }
      (id, best._1, best._2)
    }.toSet
    val got = TextAnalysis.q215TokenRuns(spark, sf)
      .as[(Long, Long, String)].collect().toSet
    assert(got === want)
  }

  test("q216 weights sum to 1 and smooth toward the tail") {
    val got = Corpus.q216TemperatureMix(spark, sf)
      .select($"source", $"p", $"weight", $"boost")
      .as[(String, Double, Double, Double)].collect()
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-12)
    // α = 1/2 upweights below-average sources, downweights the head, and
    // the boost ordering is the inverse of the share ordering
    val byP = got.sortBy(_._2)
    assert(byP.head._4 >= byP.last._4)
    assert(byP.map(_._4).reverse.sameElements(byP.map(_._4).reverse.sorted))
  }

  test("q219 whale brackets nest monotonically and top-1% leads") {
    val got = Relational.q219WhaleShare(spark, sf)
      .select($"pct", $"n_customers", $"share")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1, 5, 10, 25))
    // brackets nest: counts and shares are non-decreasing in pct
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    // a bracket can never hold more than its share of customers would at
    // uniform revenue... but always at least pct% by count construction
    val n = sources.Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    got.foreach { case (pct, cnt, share) =>
      assert(cnt === pct.toLong * n / 100, s"pct $pct count")
      assert(share >= pct / 100.0 - 1e-9, s"top $pct% below uniform share")
      assert(share <= 1.0 + 1e-12)
    }
  }

  test("q220 BPE encode equals an in-memory replay of the learned merges") {
    val merges = Corpus.q172BpeMerges(spark, sf)
      .orderBy($"round")
      .select($"s1", $"s2", $"merged").as[(String, String, String)].collect()
    def applyMerge(syms: Vector[String], x: String, y: String,
        xy: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == x && s == y)
          acc.init :+ xy
        else acc :+ s
      }
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)]
      .collect()
    val want = docs.map { case (id, text, nc) =>
      val words = text.split(" ", -1).filter(_.nonEmpty)
      val counts = words.map { w =>
        merges.foldLeft(w.split("").toVector) {
          case (s, (x, y, xy)) => applyMerge(s, x, y, xy)
        }.length.toLong
      }
      (id, words.length.toLong, counts.sum,
        nc.toDouble / counts.sum.toDouble)
    }.toSet
    val got = Corpus.q220BpeEncode(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    // merges really compress: total BPE tokens < total characters
    val totalChars = docs.map(_._3).sum
    assert(got.toSeq.map(_._3).sum < totalChars)
  }

  test("q221 ablation recalls are valid and improve with dimensions") {
    val got = graft.operators.Similarity.q221DimAblation(spark, sf)
      .select($"dim", $"query_id", $"n_overlap", $"recall")
      .as[(Int, Long, Long, Double)].collect()
    assert(got.map(_._1).distinct.sorted.toSeq === Seq(4, 8, 16))
    assert(got.groupBy(_._1).values.forall(_.length == 20))
    got.foreach { case (_, _, ov, r) =>
      assert(ov >= 0 && ov <= 10)
      assert(r === ov / 10.0)
    }
    // deterministic data: more dimensions recover more of the full top-k
    val mean = got.groupBy(_._1).view.mapValues(
      rs => rs.map(_._4).sum / rs.length).toMap
    assert(mean(16) >= mean(4), s"recall did not improve: $mean")
  }

  test("q223 IVF balance report partitions the corpus exactly") {
    val got = graft.operators.Similarity.q223IvfBalance(spark, sf)
      .select($"cell", $"n_vectors", $"share", $"ratio_to_mean",
        $"cum_share_if_probed_first", $"sample_fraction")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    val n = sources.Tables.embeddings(spark, sf).count()
    assert(got.map(_._2).sum === n, "cells must partition the corpus")
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
    assert(got.forall(_._4 > 0.0))
    // cumulative column is the prefix sum over cells sorted by size desc
    val sorted = got.sortBy(r => (-r._2, r._1))
    val prefix = sorted.scanLeft(0.0)(_ + _._3.toDouble).tail
    sorted.map(_._5).zip(prefix).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9)
    }
    assert(sorted.last._5 > 1.0 - 1e-9)
    // the quantizer's training rate rides the report: min(1, budget/n),
    // identical on every row — the knob a 100 TB operator reads next to
    // the skew columns
    val want = math.min(1.0,
      graft.operators.IvfIndex.DefaultFitSampleSize.toDouble / n)
    assert(got.forall(r => math.abs(r._6 - want) < 1e-12),
      s"sample_fraction must be $want")
  }

  test("r12 text operators keep every window doc-partitioned") {
    for (df <- Seq(TextAnalysis.q215TokenRuns(spark, sf),
        TextAnalysis.q217Winnowing(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("SinglePartition"), s"one-task window:\n$p")
    }
  }

  test("q226 pushes every predicate into the scan and joins nothing") {
    val df = Relational.q226Tpch6(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"),
      s"predicates not pushed:\n$p")
    assert(!p.contains("Join"), s"Q6 must be join-free:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"no map-side partial aggregation:\n$p")
    assert(df.count() === 1)
  }

  test("q227 returns every supplier tied at the max, decimal-exact") {
    val got = Relational.q227Tpch15(spark, sf)
      .select($"s_suppkey", $"total_revenue").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._2).distinct.length === 1, "all rows share the max")
    // replay: the max over the same pre-aggregated view
    val rev = sources.Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice".cast("decimal(14,2)") *
        (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
        .as("r"))
      .select($"l_suppkey", $"r".cast("string")).as[(Long, String)].collect()
      .map { case (k, r) => (k, BigDecimal(r)) }
    val mx = rev.map(_._2).max
    assert(got.map(_._1).toSet === rev.filter(_._2 == mx).map(_._1).toSet)
  }

  test("q229 head coverage equals a sorted-vocabulary replay") {
    val words = sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, f) => (-f, w) }
    val total = freq.map(_._2).sum
    val cums = freq.scanLeft(0L)(_ + _._2).tail
    val want = Seq(50, 90, 99).map { pct =>
      val idx = cums.indexWhere(c => c * 100 >= pct * total)
      (pct, idx + 1L, cums(idx).toDouble / total.toDouble)
    }.toSet
    val got = Corpus.q229HeadCoverage(spark, sf)
      .as[(Int, Long, Double)].collect().toSet
    assert(got === want)
    // the curve is monotone: higher coverage needs a larger head
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.map(_._2) === sorted.map(_._2).sorted)
  }

  test("q217 fingerprints satisfy the winnowing coverage guarantee") {
    // the algorithm's defining invariant: EVERY w-window of k-grams
    // contributes a fingerprint, so any match of length >= w+k-1 tokens is
    // caught; verify per document against the gram counts
    val k = 3; val w = 4
    val fps = TextAnalysis.q217Winnowing(spark, sf, k, w)
      .select($"doc_id", $"fp_pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ", -1)).as("n"))
      .as[(Long, Int)].collect()
      .filter(_._2 >= k + w - 1)
    assert(docs.nonEmpty)
    docs.foreach { case (id, n) =>
      val nGrams = n - k + 1
      val sel = fps.getOrElse(id, Set.empty)
      assert(sel.nonEmpty, s"doc $id has no fingerprints")
      (0 to nGrams - w).foreach { s =>
        assert((s until s + w).exists(p => sel.contains(p.toLong)),
          s"doc $id window at $s uncovered")
      }
    }
    // and fingerprints are a strict sparsification (expected density 2/(w+1))
    val totalGrams = docs.map(d => d._2 - k + 1L).sum
    val totalFps = docs.map(d => fps.getOrElse(d._1, Set.empty).size.toLong).sum
    assert(totalFps < totalGrams, "winnowing selected every gram")
  }
}
