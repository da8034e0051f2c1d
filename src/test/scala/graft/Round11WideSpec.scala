package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Relational, TextAnalysis}

/** Semantic checks for the round-11 widening batch (q137-q142): results
  * re-derived brute-force from collected rows at sf0.001, independent of the
  * DataFrame plan under test, plus plan-shape assertions for each operator's
  * scale claim. Oracle parity runs separately at sf0.01.
  */
class Round11WideSpec extends SparkSpec {
  import spark.implicits._

  // events with the SAME decimal cast the operators use, so replays test
  // the operator logic, not double→decimal rounding
  private lazy val ev: Array[(Long, Long, Long, BigDecimal)] =
    sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"value".cast("decimal(14,2)").as("v"))
      .as[(Long, Long, Long, BigDecimal)].collect()

  // --- q137 OHLC --------------------------------------------------------

  test("q137 equals a per-bucket sorted replay") {
    val want = ev.groupBy(e => (e._1, e._3 / 300000000L)).map {
      case ((u, b), rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val vs = rows.map(_._4)
        (u, b) -> ((sorted.head._4.toDouble, vs.max.toDouble, vs.min.toDouble,
          sorted.last._4.toDouble, rows.length.toLong, vs.sum.toDouble))
    }
    val got = Relational.q137OhlcBars(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8)))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q137 plan is one aggregation — no window, no join") {
    val plan = Relational.q137OhlcBars(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  // --- q138 co-purchase -------------------------------------------------

  test("q138 equals a brute-force per-order pair count") {
    val li = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .distinct
    val counts = li.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- i + 1 until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(100)
      .zipWithIndex
      .map { case (((a, b), n), i) => (a, b, n, i + 1L) }.toSet
    val got = Relational.q138Copurchase(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 100)
  }

  test("q138 ranks after a TakeOrdered top-k, never a global sort") {
    val plan = Relational.q138Copurchase(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k:\n$plan")
  }

  // --- q139 posting lists -----------------------------------------------

  test("q139 equals a brute-force inverted index") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tf = docs.flatMap { case (d, t) => t.split(" ", -1).map((_, d)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byTok = tf.groupBy(_._1._1)
    val want = byTok.collect { case (tok, posts) if posts.size >= 5 =>
      val df = posts.size.toLong
      val cf = posts.values.sum
      posts.toSeq.map { case ((_, d), c) => (d, c) }
        .sortBy { case (d, c) => (-c, d) }.take(3).zipWithIndex
        .map { case ((d, c), i) => (tok, df, cf, d, c, i + 1L) }
    }.flatten.toSet
    val got = Corpus.q139PostingLists(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q139's per-token cap compiles to WindowGroupLimit") {
    val plan = Corpus.q139PostingLists(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not compile to a group limit:\n$plan")
  }

  // --- q140 concentration -----------------------------------------------

  test("q140 equals the direct minimal-m scan over sorted sizes") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val want = docs.groupBy(_._1).flatMap { case (src, rows) =>
      val sizes = rows.map(_._2).sortBy(-_)
      val total = sizes.sum
      if (total <= 0) Nil
      else Seq(50L, 80L, 90L).map { pct =>
        // minimal m with (sum of m largest)*100 >= pct*total
        var cum = 0L
        var m = 0L
        while (cum * 100 < pct * total) { cum += sizes(m.toInt); m += 1 }
        (src, pct, m, sizes.length.toLong, total)
      }
    }.toSet
    val got = Corpus.q140Concentration(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q141 Simpson diversity -------------------------------------------

  test("q141 equals explode-and-count Simpson") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (d, t) =>
      val cs = t.split(" ", -1).groupBy(identity).values.map(_.length.toLong)
      val n = cs.sum
      val sumsq = cs.map(c => c * c).sum
      d -> ((n, cs.size.toLong, sumsq,
        (n * n - sumsq).toDouble / (n * n).toDouble))
    }.toMap
    val got = TextAnalysis.q141SimpsonDiversity(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === want)
    assert(want.values.exists(_._4 > 0), "corpus must have diverse docs")
  }

  test("q141 is zero-shuffle: no Exchange in the plan") {
    val plan = TextAnalysis.q141SimpsonDiversity(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // --- q142 peak concurrency --------------------------------------------

  test("q142 equals an in-memory sweep line") {
    val hold = 300000000L
    val deltas = ev.flatMap(e => Seq((e._3, 1L), (e._3 + hold, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1)
    var cur = 0L
    var peak = Long.MinValue
    var at = 0L
    deltas.foreach { case (pt, d) =>
      cur += d
      if (cur > peak) { peak = cur; at = pt }
    }
    val Array((gotPeak, gotAt)) = Relational.q142PeakConcurrency(spark, sf)
      .as[(Long, Long)].collect()
    assert((gotPeak, gotAt) === ((peak, at)))
    assert(gotPeak > 1, "events must actually overlap at sf0.001")
  }

  test("q142's running sum never uses an unpartitioned window") {
    val plan = Relational.q142PeakConcurrency(spark, sf)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window in plan: $l")
    }
  }

  // --- q143 profile -----------------------------------------------------

  test("q143 equals per-column brute-force stats") {
    val rows = sources.Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
      .as[(Double, Double, Double, Double)].collect()
    val byCol = Map(
      "l_quantity" -> rows.map(_._1), "l_extendedprice" -> rows.map(_._2),
      "l_discount" -> rows.map(_._3), "l_tax" -> rows.map(_._4))
    val want = byCol.map { case (c, vs) =>
      c -> ((vs.length.toLong, 0L, vs.distinct.length.toLong,
        vs.min, vs.max,
        vs.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }
    val got = Relational.q143Profile(spark, sf)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got === want)
  }

  test("q143 profiles via single-distinct branches: no Expand, one pruned column per scan") {
    // r19: four countDistincts in ONE aggregate compiled through Expand —
    // ×5 every row into a mixed-grouping hash aggregate (~7 s CPU at
    // sf0.1, the query's whole cost). One branch per column keeps each
    // countDistinct a plain two-phase aggregate; the contract now is NO
    // Expand anywhere and each scan column-pruned to exactly its column.
    val plan = Relational.q143Profile(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 4, s"expected one pruned scan per column, got $scans:\n$plan")
    assert(!plan.contains("Expand"),
      s"single-distinct branches must not compile to Expand:\n$plan")
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { c =>
      assert(plan.contains(s"ReadSchema: struct<$c:"),
        s"scan for $c not pruned to exactly that column:\n$plan")
    }
  }

  // --- q144 MAD ---------------------------------------------------------

  test("q144 equals a direct robust-stats replay") {
    // Spark `percentile`: index p·(n−1) into the sorted values, linear
    // interpolation between the straddling pair
    def pct50(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (idx - idx.toInt) * (hi - lo)
    }
    val rows = sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
    val want = rows.groupBy(_._1).map { case (f, rs) =>
      val vs = rs.map(_._2).toSeq
      val med = pct50(vs)
      val adev = vs.map(v => math.abs(v - med))
      val mad = pct50(adev)
      val out = adev.count(_ > 3.0 * mad).toLong
      f -> ((med, mad, vs.length.toLong, out,
        out.toDouble / vs.length.toDouble))
    }
    val got = Relational.q144Mad(spark, sf)
      .as[(String, Double, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q147 grouping sets -----------------------------------------------

  test("q147 grains are internally consistent and flags disambiguate") {
    val rows = Relational.q147GroupingSets(spark, sf)
      .as[(Option[String], Option[String], Long, Double, Long, Long)]
      .collect()
    val fine = rows.filter(r => r._5 == 0 && r._6 == 0)
    val mid = rows.filter(r => r._5 == 0 && r._6 == 1)
    val top = rows.filter(r => r._5 == 1 && r._6 == 1)
    assert(fine.nonEmpty && mid.nonEmpty && top.length === 1)
    assert(rows.length === fine.length + mid.length + top.length,
      "exactly the three requested grains, no cube extras")
    // counts roll up exactly across grains
    assert(fine.map(_._3).sum === top.head._3)
    assert(mid.map(_._3).sum === top.head._3)
    mid.foreach { m =>
      assert(fine.filter(_._1 == m._1).map(_._3).sum === m._3,
        s"status ${m._1} rollup")
    }
    // grouping() flags, not NULL-ness, are the grain marker
    assert(mid.forall(_._2.isEmpty) && top.head._1.isEmpty)
  }

  // --- q148 prefix join -------------------------------------------------

  test("q148 equals the exact quadratic Jaccard definition (zero false negatives)") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> t.split(" ", -1).toSet }
    val want = (for {
      i <- docs.indices; j <- i + 1 until docs.length
      (da, sa) = docs(i); (db, sb) = docs(j)
      inter = (sa & sb).size.toLong
      jac = inter.toDouble / (sa.size + sb.size - inter).toDouble
      if jac >= 0.9
    } yield {
      val (x, y) = if (da < db) (da, db) else (db, da)
      (x, y, inter, (if (da < db) sa else sb).size.toLong,
        (if (da < db) sb else sa).size.toLong, jac)
    }).toSet
    val got = operators.Dedup.q148PrefixJoin(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "sf corpus must contain near-duplicate pairs")
  }

  // --- q149 bag ops -----------------------------------------------------

  test("q149 equals the multiset identities max(0, a−b) and min(a, b)") {
    val rows = sources.Tables.orders(spark, sf)
      .select($"o_orderstatus", $"o_orderpriority", $"o_totalprice")
      .as[(String, String, Double)].collect()
    val ca = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.length.toLong)
    val cb = rows.filter(_._3 > 150000.0)
      .groupBy(r => (r._1, r._2)).view.mapValues(_.length.toLong)
    val want = (ca.keys.map { k =>
      ("except_all", k._1, k._2, ca(k) - cb.getOrElse(k, 0L))
    }.filter(_._4 > 0) ++ ca.keys.map { k =>
      ("intersect_all", k._1, k._2, math.min(ca(k), cb.getOrElse(k, 0L)))
    }.filter(_._4 > 0)).toSet
    val got = Relational.q149BagOps(spark, sf)
      .as[(String, String, String, Long)].collect().toSet
    assert(got === want)
    assert(got.exists(_._1 == "except_all") && got.exists(_._1 == "intersect_all"))
  }

  // --- q150 WoW delta ---------------------------------------------------

  test("q150 equals a per-type weekly replay incl. null first weeks") {
    val byTypeWeek = sources.Tables.events(spark, sf)
      .select($"event_type", unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(String, Long)].collect()
      .groupBy(e => (e._1, e._2 / 604800000000L)).view
      .mapValues(_.length.toLong).toMap
    val want = byTypeWeek.map { case ((t, w), n) =>
      val prev = byTypeWeek.keys.filter(k => k._1 == t && k._2 < w)
        .map(_._2).maxOption.flatMap { pw =>
          // lag(1) over consecutive ROWS: previous existing week's count
          Some(byTypeWeek((t, pw)))
        }
      (t, w) -> ((n, prev, prev.map(p => n - p),
        prev.map(p => (n - p).toDouble / p.toDouble)))
    }
    val got = Relational.q150WowDelta(spark, sf)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got === want)
    assert(want.values.exists(_._2.isEmpty), "first weeks must be null")
    assert(want.values.exists(_._2.nonEmpty))
  }

  test("q148 prefix length survives FP-hostile thresholds (0.55·20 = 11+ε)") {
    // regression: ceil(0.55 * 20) = 12 in doubles; the integer ceil must
    // give 11 or the prefix loses a token and pairs go missing
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> t.split(" ", -1).toSet }
    val t = 0.55
    val want = (for {
      i <- docs.indices; j <- i + 1 until docs.length
      (da, sa) = docs(i); (db, sb) = docs(j)
      inter = (sa & sb).size.toLong
      jac = inter.toDouble / (sa.size + sb.size - inter).toDouble
      if jac >= t
    } yield (math.min(da, db), math.max(da, db))).toSet
    val got = operators.Dedup.q148PrefixJoin(spark, sf, threshold = t)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(docs.exists(_._2.size % 20 == 0) || got.nonEmpty)
  }

  // --- q152 item CF -----------------------------------------------------

  test("q152 equals a brute-force cosine-over-co-occurrence ranking") {
    val li = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().distinct
    val support = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = li.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- i + 1 until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val directed = co.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n)) }
    val want = directed.groupBy(_._1).flatMap { case (item, cands) =>
      cands.map { case (_, rec, nAb) =>
        val sim = nAb.toDouble /
          math.sqrt((support(item) * support(rec)).toDouble)
        (rec, nAb, sim)
      }.sortBy { case (rec, _, sim) => (-sim, rec) }.take(3).zipWithIndex
        .map { case ((rec, nAb, sim), i) =>
          (item, i + 1L, rec, nAb, support(item), support(rec), sim) }
    }.toSet
    val got = Relational.q152ItemCf(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q153 clamped balance ---------------------------------------------

  test("q153's prefix-aggregate identity equals the sequential recurrence") {
    val deltas = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        when($"event_type" === "purchase",
          -($"value".cast("decimal(14,2)") * 100).cast("long"))
          .otherwise(($"value".cast("decimal(14,2)") * 100).cast("long"))
          .as("delta"))
      .as[(Long, Long, Long, Long)].collect()
    val want = deltas.groupBy(_._1).map { case (u, rows) =>
      // the DEFINITION: b_t = max(0, b_{t-1} + d_t), replayed sequentially
      val bs = rows.sortBy(r => (r._3, r._2))
        .scanLeft(0L) { case (b, (_, _, _, d)) => math.max(0L, b + d) }
        .drop(1)
      u -> ((rows.length.toLong, bs.last, bs.max,
        bs.count(_ == 0L).toLong))
    }
    val got = Relational.q153ClampedBalance(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === want)
    assert(want.values.exists(_._4 > 0), "some user must hit zero")
  }

  // --- q155 quantile normalize ------------------------------------------

  test("q155 pctile equals count(score' <= score)/N and no one-task window") {
    val scores = operators.Corpus.q121QualityClassifier(spark, sf)
      .select($"doc_id", $"score").as[(Long, Long)].collect()
    val n = scores.length
    val want = scores.map { case (d, s) =>
      d -> ((s, scores.count(_._2 <= s).toDouble / n.toDouble))
    }.toMap
    val df = operators.Corpus.q155QuantileNormalize(spark, sf)
    val got = df.as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window in plan: $l")
    }
  }

  // --- q156 constraints -------------------------------------------------

  test("q156 equals per-row brute-force counts and runs in ONE scan") {
    val rows = sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_discount", $"l_returnflag",
        $"l_quantity")
      .as[(Long, Int, Double, String, Double)].collect()
    val n = rows.length.toLong
    val want = Map(
      "not_null" -> 0L,
      "range_0_to_0.1" -> rows.count(r => r._3 < 0.0 || r._3 > 0.1).toLong,
      "accepted_values" -> rows.count(r => !Set("A", "N", "R")(r._4)).toLong,
      "unique_key" -> (n - rows.map(r => (r._1, r._2)).distinct.length),
      "positive" -> rows.count(_._5 <= 0.0).toLong)
    val df = Relational.q156Constraints(spark, sf)
    val got = df.as[(String, String, Long, Long, Boolean)].collect()
    assert(got.map(r => r._1 -> r._3).toMap === want)
    got.foreach { r => assert(r._4 === n && r._5 === (r._3 == 0L)) }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) === 1,
      s"constraint battery must run in one scan:\n$plan")
  }

  // --- q158 conversion lag ----------------------------------------------

  test("q158 equals the staged first-purchase-AFTER-signup replay") {
    val events = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = events.groupBy(_._1)
    val lags = byUser.values.flatMap { es =>
      es.filter(_._2 == "signup").map(_._3).minOption.flatMap { s0 =>
        // q82's staged semantics: a pre-signup purchase does NOT
        // disqualify — the first purchase AT OR AFTER s0 counts
        es.filter(e => e._2 == "purchase" && e._3 >= s0).map(_._3)
          .minOption.map(p0 => (p0 - s0) / 3600000000L)
      }
    }.toSeq
    val want = lags.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.q158ConversionLag(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty)
    // the regression that motivated the staged form: at least one user
    // with a pre-signup purchase still converts afterwards
    assert(byUser.values.exists { es =>
      val s0 = es.filter(_._2 == "signup").map(_._3).minOption
      s0.exists(s => es.exists(e => e._2 == "purchase" && e._3 < s) &&
        es.exists(e => e._2 == "purchase" && e._3 >= s))
    }, "corpus must exercise the pre-signup-purchase case")
  }

  // --- q159 growth accounting -------------------------------------------

  test("q159 equals a per-user week-walk and flows are conserved") {
    val uw = sources.Tables.events(spark, sf)
      .select($"user_id",
        expr("unix_micros(cast(ts as timestamp)) div 604800000000").as("w"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val flows = collection.mutable.Map.empty[(Long, String), Long]
      .withDefaultValue(0L)
    val maxWeek = uw.values.flatten.max
    uw.values.foreach { weeks =>
      weeks.zipWithIndex.foreach { case (w, i) =>
        val st =
          if (i == 0) "new"
          else if (weeks(i - 1) == w - 1) "retained"
          else "resurrected"
        flows((w, st)) += 1
        // right-censored: the dataset ending is not churn evidence
        if ((i == weeks.length - 1 || weeks(i + 1) != w + 1) && w < maxWeek)
          flows((w + 1, "churned")) += 1
      }
    }
    val got = Relational.q159GrowthAccounting(spark, sf)
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === flows.toMap)
    assert(!got.keys.exists(_._1 > maxWeek),
      "no phantom post-observation week may appear")
    // conservation over the FULL observed range:
    // active(w) = active(w-1) + new + resurrected - churned
    val weeks = got.keys.map(_._1)
    def active(w: Long) = uw.values.count(_.contains(w)).toLong
    (weeks.min + 1 to maxWeek).foreach { w =>
      assert(active(w) === active(w - 1)
        + got.getOrElse((w, "new"), 0L)
        + got.getOrElse((w, "resurrected"), 0L)
        - got.getOrElse((w, "churned"), 0L), s"week $w flow conservation")
    }
  }

  // --- q151 decile lift -------------------------------------------------

  test("q151 equals a sorted-scan decile replay") {
    val scored = operators.Corpus.q121QualityClassifier(spark, sf)
      .select($"doc_id", $"score", $"keep")
      .as[(Long, Long, Boolean)].collect()
      .sortBy(r => (-r._2, r._1))
    val n = scored.length
    val q = n / 10; val r = n % 10
    // SQL NTILE: first r buckets get q+1 rows
    val deciles = scored.zipWithIndex.map { case (row, i) =>
      val b = if (i < r * (q + 1)) i / (q + 1) + 1
      else r + (i - r * (q + 1)) / q + 1
      (b.toLong, row._3)
    }
    val per = deciles.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.count(_._2).toLong)
    }.toMap
    val totalKeep = per.values.map(_._2).sum
    val overall = totalKeep.toDouble / n.toDouble
    val want = per.map { case (d, (nd, nk)) =>
      val rate = nk.toDouble / nd.toDouble
      d -> ((nd, nk, rate, rate / overall))
    }
    val got = operators.Corpus.q151DecileLift(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    assert(got === want)
    // the stand-in classifier must actually separate: top decile all-keep
    assert(got(1L)._3 === 1.0)
  }

  // --- q145 seasonality -------------------------------------------------

  test("q145 equals brute-force epoch arithmetic cells") {
    val want = ev.groupBy { e =>
      ((e._3 / 86400000000L + 4) % 7, (e._3 / 3600000000L) % 24)
    }.map { case ((dow, hod), rows) =>
      (dow, hod) -> ((rows.length.toLong,
        rows.map(_._1).distinct.length.toLong,
        rows.map(_._4).sum.toDouble))
    }
    val got = Relational.q145Seasonality(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
