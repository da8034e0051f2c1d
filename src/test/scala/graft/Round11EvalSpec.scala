package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Relational, Similarity, TextAnalysis}

/** Semantic checks for the model-eval and monitoring batch (q183-q189,
  * q194-q197): exact in-memory replays plus plan-shape assertions. */
class Round11EvalSpec extends SparkSpec {
  import spark.implicits._

  test("q183 equals a brute-force leave-one-out kNN vote") {
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.map { q =>
      val top = vecs.filter(_._1 != q._1)
        .map(c => (cos(q._3, c._3), c._1, c._2))
        .sortBy { case (s, id, _) => (-s, id) }.take(5)
      val votes = top.groupBy(_._3).view.mapValues(_.length).toMap
      val (pred, n) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      (q._1, q._2, pred, n.toLong, pred == q._2)
    }.toSet
    val got = Similarity.q183KnnClassify(spark, sf)
      .as[(Long, Int, Int, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q184 confusion matrix row-shares sum to 1 and count every document") {
    val got = TextAnalysis.q184LangConfusion(spark, sf)
      .as[(String, String, Long, Double, Boolean)].collect()
    val total = sources.Tables.documents(spark, sf).count()
    assert(got.map(_._3).sum === total)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, s"lang $lang")
    }
    // the hit flag is consistent with the labels
    got.foreach { case (l, p, _, _, hit) => assert(hit === (l == p)) }
    // replay from q47's own output
    val pred = TextAnalysis.q47LangId(spark, sf)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    val truth = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val want = truth.groupBy(d => (d._2, pred(d._1))).view
      .mapValues(_.length.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === want)
  }

  test("q185 equals a sorted-merge KS replay over every source pair") {
    val scores = Corpus.q121QualityClassifier(spark, sf)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val bySource = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(d => scores(d._1)).sorted).toMap
    val allScores = scores.values.toSeq.distinct.sorted
    val want = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
    } yield {
      val (xa, xb) = (bySource(a), bySource(b))
      val d = allScores.map { s =>
        math.abs(xa.count(_ <= s).toDouble / xa.length -
          xb.count(_ <= s).toDouble / xb.length)
      }.max
      val thr = 1.358 * math.sqrt((xa.length + xb.length).toDouble /
        (xa.length.toLong * xb.length).toDouble)
      (a, b, xa.length.toLong, xb.length.toLong, d, thr, d > thr)
    }).toSet
    val got = Corpus.q185KsTest(spark, sf)
      .as[(String, String, Long, Long, Double, Double, Boolean)]
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q186 equals a brute-force unique-gram count and complements q75") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val gramDocs = collection.mutable.Map[String, collection.mutable.Set[Long]]()
    docs.foreach { case (id, t) =>
      val ws = t.split(" ", -1)
      for (i <- 0 to ws.length - 3)
        gramDocs.getOrElseUpdate(ws.slice(i, i + 3).mkString(" "),
          collection.mutable.Set[Long]()) += id
    }
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val gs = (for (i <- 0 to ws.length - 3)
        yield ws.slice(i, i + 3).mkString(" ")).distinct
      if (gs.isEmpty) (id, 0L, 0L, None)
      else {
        val u = gs.count(g => gramDocs(g).size == 1)
        (id, gs.length.toLong, u.toLong, Some(u.toDouble / gs.length))
      }
    }.toSet
    val got = Corpus.q186NgramNovelty(spark, sf)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(got === want)
    // the corpus has both original and templated text
    assert(got.exists(_._4.exists(_ > 0.0)))
    assert(got.exists(_._4.exists(_ < 1.0)))
  }

  test("q187 equals a brute-force rule-mining replay with correct lift") {
    val rows = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .distinct
    val nBaskets = rows.map(_._1).distinct.length.toLong
    val itemN = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = rows.groupBy(_._1).values.toSeq.flatMap { basket =>
      val items = basket.map(_._2).toSeq
      for (a <- items; b <- items if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = pairN.collect {
      case ((a, b), nab)
          if nab >= 2 && nab.toDouble / itemN(a) >= 0.1 =>
        (a, b, nab, itemN(a), itemN(b),
          nab.toDouble / nBaskets, nab.toDouble / itemN(a),
          (nab.toDouble / itemN(a)) / (itemN(b).toDouble / nBaskets))
    }.toSet
    val got = Relational.q187AssocRules(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // lift discriminates: the report contains both >1 and ≤1 rules, so
    // confidence alone would have ranked popular-but-unrelated pairs
    assert(got.exists(_._8 > 1.0))
  }

  test("q188 equals a sequential Welch replay over the deterministic cohorts") {
    val purchases = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", ($"value".cast("decimal(14,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val perUser = purchases.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val groups = perUser.toSeq.groupBy { case (u, _) =>
      if (md5hex(s"ab:$u").head < '8') "A" else "B"
    }
    def stats(g: String) = {
      val xs = groups(g).map(_._2)
      val n = xs.length.toLong
      val s = xs.sum.toDouble
      val ss = xs.map(x => x * x).sum.toDouble
      (n, s, ss)
    }
    val (na, sa, ssa) = stats("A")
    val (nb, sb, ssb) = stats("B")
    val meanA = sa / na / 100.0
    val meanB = sb / nb / 100.0
    val varA = (ssa - sa * sa / na) / (na - 1.0) / 10000.0
    val varB = (ssb - sb * sb / nb) / (nb - 1.0) / 10000.0
    val t = (meanA - meanB) / math.sqrt(varA / na + varB / nb)
    val Array((gNa, gNb, gMa, gMb, gT, gSig)) =
      Relational.q188AbTest(spark, sf)
        .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    assert((gNa, gNb) === ((na, nb)))
    assert(gMa === meanA && gMb === meanB)
    assert(math.abs(gT - t) < 1e-12)
    assert(gSig === (math.abs(t) > 1.96))
    // the hash split actually produced two real cohorts
    assert(na > 1 && nb > 1)
  }

  test("q194 equals a week-shifted bucket replay; first week is never charged") {
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 3600000000L"))
      .as[(String, Long)].collect()
    val buckets = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val scored = buckets.toSeq.flatMap { case ((t, h), actual) =>
      buckets.get((t, h - 168L)).map(f => (t, actual, f))
    }
    val want = scored.groupBy(_._1).map { case (t, xs) =>
      val n = xs.length.toLong
      (t, n,
        xs.map(x => math.abs(x._2 - x._3)).sum.toDouble / n,
        xs.map(x => x._2 - x._3).sum.toDouble / n)
    }.toSet
    val got = Relational.q194SeasonalNaive(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the first week can't be forecast: scored buckets < total buckets
    assert(scored.length < buckets.size)
  }

  test("q195 retrieval metrics equal a brute-force per-query replay") {
    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.filter(_._1 < 20).map { q =>
      val top = vecs.filter(_._1 != q._1)
        .map(c => (cos(q._3, c._3), c._1, c._2))
        .sortBy { case (s, id, _) => (-s, id) }.take(10)
      val nRel = top.count(_._3 == q._2).toLong
      val first = top.zipWithIndex.collectFirst {
        case ((_, _, l), i) if l == q._2 => i + 1L
      }
      (q._1, top.length.toLong, nRel, nRel.toDouble / top.length,
        first, first.map(1.0 / _))
    }.toSet
    val got = Similarity.q195RetrievalEval(spark, sf)
      .as[(Long, Long, Long, Double, Option[Long], Option[Double])]
      .collect().toSet
    assert(got === want)
    assert(got.size === 20)
  }

  test("q196 equals the sequential CUSUM recurrence it re-expresses") {
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 604800000000L"))
      .as[(String, Long)].collect()
    val weekly = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = weekly.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val weeks = weekly.keys.filter(_._1 == t).map(_._2).toSeq.sorted
      val n = weeks.length.toLong
      val s = weeks.map(w => weekly((t, w))).sum
      var c = 0L
      weeks.map { w =>
        val x = weekly((t, w))
        // the recurrence ITSELF — the operator computes this via the
        // max-plus identity, never sequentially
        c = math.max(0L, c + (n * x - s))
        (t, w, x, c, c * 2 > s)
      }
    }.toSet
    val got = Relational.q196CusumChangepoint(spark, sf)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q197 equals an in-memory winsorization replay") {
    val ev = sources.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    // DISCRETE percentile (percentile_disc): the smallest value whose CDF
    // ≥ q — an actual data value, so the replay compares bit-exact (the
    // interpolated form's cross-engine ulp on tie blocks is why q197
    // switched; see the operator's scaladoc)
    def pct(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      s(math.max(0, math.ceil(q * s.length).toInt - 1))
    }
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val lo = pct(vs, 0.05); val hi = pct(vs, 0.95)
      val nLo = vs.count(_ < lo).toLong
      val nHi = vs.count(_ > hi).toLong
      val inlier = vs.filter(v => v >= lo && v <= hi)
        .map(v => math.round(v * 100)).sum / 100.0
      (t, vs.length.toLong, lo, hi, nLo, nHi,
        (inlier + nLo * lo + nHi * hi) / vs.length)
    }.toSet
    val got = Relational.q197Winsorize(spark, sf)
      .as[(String, Long, Double, Double, Long, Long, Double)].collect().toSet
    val wantM = want.map(w => (w._1) -> w).toMap
    assert(got.map(_._1) === wantM.keySet)
    got.foreach { case (t, n, lo, hi, nLo, nHi, m) =>
      val w = wantM(t)
      assert(n === w._2 && nLo === w._5 && nHi === w._6, t)
      // discrete bounds are actual data values — bit-exact, no tolerance
      assert(lo === w._3 && hi === w._4, t)
      // the assembled mean is one fixed-order fp expression per engine;
      // the replay's inlier sum may associate differently — tolerance
      assert(math.abs(m - w._7) < 1e-9, t)
    }
    // winsorization actually clipped something
    assert(got.exists(r => r._5 > 0 || r._6 > 0))
  }

  test("the round's relational additions plan without cartesian products") {
    val plans = Seq(
      "q187" -> Relational.q187AssocRules(spark, sf),
      "q188" -> Relational.q188AbTest(spark, sf),
      "q190" -> Relational.q190Tpch17(spark, sf),
      "q191" -> Relational.q191Tpch18(spark, sf),
      "q192" -> Relational.q192Tpch22(spark, sf),
      "q194" -> Relational.q194SeasonalNaive(spark, sf),
      "q196" -> Relational.q196CusumChangepoint(spark, sf),
      "q197" -> Relational.q197Winsorize(spark, sf))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
    // the claimed broadcasts are real: q190's brand-filtered part dim and
    // q197's ≤|types| bounds frame build sides
    assert(Relational.q190Tpch17(spark, sf).queryExecution.executedPlan
      .toString.contains("BroadcastHashJoin"))
    assert(Relational.q197Winsorize(spark, sf).queryExecution.executedPlan
      .toString.contains("BroadcastHashJoin"))
  }

  test("q203 soft-dedup weights are consistent with q59's clusters and sum to the dedup count") {
    val got = Corpus.q203SoftDedup(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(got.length === nDocs.toInt)
    // sizes agree with the labels and the weight is exactly 1/size
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.forall(_._3 === rows.length.toLong), s"cluster $c")
      rows.foreach(r => assert(r._4 === 1.0 / r._3))
    }
    // Σ weights = number of clusters = what hard dedup would keep
    val nClusters = got.map(_._2).distinct.length
    assert(math.abs(got.map(_._4).sum - nClusters) < 1e-9)
    // duplicates exist and are down-weighted
    assert(got.exists(_._3 > 1))
  }

  test("q204 risk report equals a direct equivalence-class census") {
    val classes = sources.Tables.events(spark, sf)
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000L"),
        expr("cast(cast(value as decimal(14,2)) * 100 as bigint) div 1000"))
      .as[(String, Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = classes.groupBy(_._1._1).map { case (t, cs) =>
      val risky = cs.filter(_._2 < 5)
      (t, cs.size.toLong, risky.size.toLong,
        cs.values.sum, risky.values.sum,
        risky.values.sum.toDouble / cs.values.sum)
    }.toSet
    val got = Relational.q204KAnonRisk(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the audit finds real risk on this sparse QI grid
    assert(got.exists(_._5 > 0))
  }

  test("q205 equals a sequential sessionization replay") {
    val ev = sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val gap = 30L * 60L * 1000000L
    val sessions = ev.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val out = collection.mutable.ArrayBuffer[
        collection.mutable.ArrayBuffer[(Long, Long, String, Long)]]()
      sorted.foreach { e =>
        if (out.isEmpty || e._4 - out.last.last._4 > gap)
          out += collection.mutable.ArrayBuffer(e)
        else out.last += e
      }
      out
    }.toSeq
    val want = sessions.groupBy(_.head._4 / 604800000000L).map {
      case (w, ss) =>
        (w, ss.length.toLong,
          ss.count(_.exists(_._3 == "purchase")).toLong,
          ss.count(_.length == 1).toLong,
          ss.count(_.exists(_._3 == "purchase")).toDouble / ss.length,
          ss.count(_.length == 1).toDouble / ss.length)
    }.toSet
    val got = Relational.q205SessionOutcomes(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // both outcome classes occur on this corpus
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
  }

  test("q189 funnel counts are consistent with the underlying dedup operators") {
    val got = Dedup.q189DedupFunnel(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set("exact_doc", "shared_segment", "dup_span"))
    // shared_segment agrees with q118's own per-doc removals
    val line = operators.Corpus.q118LineDedup(spark, sf)
      .select($"doc_id", $"kept_text", $"n_segs", $"n_removed")
      .as[(Long, String, Long, Long)].collect()
    val lineDocs = line.count(_._4 > 0).toLong
    val lineSegs = line.map(_._4).sum
    assert(got("shared_segment")._1 === lineDocs)
    assert(got("shared_segment")._2 === lineSegs)
    // dup_span agrees with q170's per-doc removals
    val span = Dedup.q170SpanDedup(spark, sf)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect()
    assert(got("dup_span")._1 === span.count(_._2 > 0).toLong)
    assert(got("dup_span")._2 === span.map(_._2).sum)
    assert(got("dup_span")._3 === span.map(_._2).sum)
    // exact stage agrees with a direct text groupBy
    val texts = sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val dups = texts.groupBy(identity).values.map(_.length)
      .filter(_ > 1)
    assert(got("exact_doc")._2 === dups.map(_ - 1).sum.toLong)
  }
}
