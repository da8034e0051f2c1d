package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Relational}

/** Round-9 curation/analytics operators, each checked against an
  * independent re-derivation (not the operator's own arithmetic): hash-mix
  * rate semantics, triangle closure, token-rank formula, budget greediness,
  * rolling-frame membership. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("corpus mix: rate semantics — src0 complete, src3 empty, default ≈ rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val perSource = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val kept = Corpus.q84CorpusMix(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(kept("src0") === perSource("src0")) // rate 1.0 keeps everything
    assert(!kept.contains("src3"))             // rate 0.0 keeps nothing
    // md5 is uniform: the aggregate default-rate sources (16×25 docs)
    // should land near 50% — loose bound, deterministic data so no flake
    val defSources = perSource.keys.toSeq.filterNot(Set("src0", "src1", "src2", "src3"))
    val defKept = defSources.map(s => kept.getOrElse(s, 0L)).sum.toDouble
    val defTotal = defSources.map(perSource).sum.toDouble
    assert(math.abs(defKept / defTotal - 0.5) < 0.15)
  }

  test("corpus mix: deterministic — two runs produce the identical id set") {
    val a = Corpus.q84CorpusMix(spark, sf).select($"doc_id").as[Long].collect().toSet
    val b = Corpus.q84CorpusMix(spark, sf).select($"doc_id").as[Long].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("triangles: every emitted triple is closed, and none is missed") {
    val edges = Dedup.q44DedupEmbedding(spark, sf, threshold = 0.2)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val got = Corpus.q85DupTriangles(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    got.foreach { case (a, b, c) =>
      assert(a < b && b < c)
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)))
    }
    // independent brute force over the collected edge set
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = for {
      (a, bs) <- adj.toSet; b <- bs
      c <- adj.getOrElse(b, Set.empty) if edges((a, c))
    } yield (a, b, c)
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("token rank: rank 1 is the corpus-most-frequent word; formula checks") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", explode(split($"text", " ", -1)).as("word"))
    val freq = toks.groupBy($"word").count().as[(String, Long)].collect()
    val ranked = freq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((w, _), i) => w -> (i + 1L) }.toMap
    val someDoc = toks.filter($"doc_id" === 0L).as[(Long, String)].collect()
    val expMean = someDoc.map(t => ranked(t._2)).sum.toDouble / someDoc.length
    val got = Corpus.q86TokenRank(spark, sf)
      .filter($"doc_id" === 0L).select($"mean_rank").as[Double].head()
    assert(got === expMean)
  }

  test("budget select: within budget, quality-greedy, and maximal per source") {
    val rows = Corpus.q87BudgetSelect(spark, sf, budget = 600L)
      .select($"source", $"quality_score", $"words", $"cum_tokens")
      .as[(String, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(-_._2)
      assert(sorted.map(_._3).sum === sorted.last._4) // cum is the running sum
      assert(sorted.last._4 <= 600L)
    }
    // maximality: the highest-quality EXCLUDED doc would have burst the budget
    val all = Corpus.q87BudgetSelect(spark, sf, budget = Long.MaxValue)
      .as[(Long, String, Double, Long, Long)].collect()
    val keptIds = rows.length
    val perSourceKept = Corpus.q87BudgetSelect(spark, sf, budget = 600L)
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    all.groupBy(_._2).foreach { case (src, docs) =>
      val inOrder = docs.sortBy(d => (-d._3, d._1))
      val kept = perSourceKept.getOrElse(src, Set.empty)
      var cum = 0L
      inOrder.foreach { d =>
        cum += d._4
        assert(kept(d._1) === (cum <= 600L),
          s"greedy prefix mismatch at $src/doc ${d._1}")
      }
    }
    assert(keptIds > 0)
  }

  test("budget select pre-prunes: partial WindowGroupLimit below the shuffle") {
    val p = Corpus.q87BudgetSelect(spark, sf, budget = 600L)
      .queryExecution.executedPlan.toString
    // the lossless rank cap must compile to WindowGroupLimit twice —
    // Partial (map-side, BEFORE the exchange) and Final — so each task
    // forwards at most `budget` rows per source instead of the whole corpus
    val partial = p.indexOf("WindowGroupLimit")
    assert(partial >= 0, s"no WindowGroupLimit in:\n$p")
    assert(p.indexOf("WindowGroupLimit", partial + 1) > partial,
      s"expected Partial AND Final WindowGroupLimit in:\n$p")
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(exchange >= 0 && p.lastIndexOf("WindowGroupLimit") > exchange,
      "expected the partial limit to sit BELOW (after, in tree print) the exchange")
  }

  test("sessionize: session_seq equals a brute-force gap scan per user") {
    val gapUs = 30L * 60L * 1000000L
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long, Long)].collect()
    val got = Relational.q89Sessionize(spark, sf)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(got.size === e.length)
    e.groupBy(_._2).foreach { case (_, evs) =>
      val sorted = evs.sortBy(x => (x._3, x._1))
      var seq = 0L; var prev = Long.MinValue
      sorted.foreach { case (eid, _, us) =>
        if (prev == Long.MinValue || us - prev > gapUs) seq += 1
        prev = us
        assert(got(eid) === seq, s"session_seq mismatch at event $eid")
      }
    }
  }

  test("interval join: banded pairs equal the brute-force band self-join") {
    val winUs = 5L * 60L * 1000000L
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long, Long)].collect()
    val expected = (for {
      (_, evs) <- e.groupBy(_._2).toSeq
      a <- evs.toSeq; b <- evs.toSeq
      if a._1 < b._1 && math.abs(a._3 - b._3) <= winUs
    } yield (a._1, b._1)).toSet
    val got = Relational.q90IntervalJoin(spark, sf)
      .select($"event_a", $"event_b").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length) // bucketing emits no dup pairs
    assert(got.toSet === expected)
    assert(got.nonEmpty)
  }

  test("split assign: total partition, rough fractions, growth-stable labels") {
    val small = Corpus.q91SplitAssign(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(small.size.toLong === total) // every doc got exactly one label
    val frac = small.values.groupBy(identity).view.mapValues(_.size.toDouble / small.size)
    assert(math.abs(frac("test") - 0.1) < 0.06)
    assert(math.abs(frac("val") - 0.1) < 0.06)
    assert(frac("train") > 0.7)
    // a document's label is a pure function of doc_id: the same id keeps
    // its split in a bigger corpus (no migration as data grows)
    val big = Corpus.q91SplitAssign(spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    small.keys.filter(big.contains).foreach(id => assert(small(id) === big(id)))
  }

  test("group concat: sorted, complete member list per nation") {
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_nationkey".cast("long"), $"c_name").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.mkString(",")).toMap
    val got = Relational.q92GroupConcat(spark, sf)
      .select($"c_nationkey".cast("long"), $"names").as[(Long, String)].collect().toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("moment stats: integer sums and fp moments match a direct computation") {
    val qs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity".cast("long")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Relational.q93MomentStats(spark, sf)
      .select($"l_returnflag", $"n", $"s1", $"s2", $"s3", $"var_qty", $"skew_qty")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (flag, n, s1, s2, s3, varQ, skewQ) =>
      val v = qs(flag)
      assert(n === v.length.toLong)
      assert(s1 === v.sum)
      assert(s2 === v.map(x => x * x).sum)
      assert(s3 === v.map(x => x * x * x).sum)
      val mean = v.sum.toDouble / v.length
      val m2 = v.map(x => (x - mean) * (x - mean)).sum / v.length
      val m3 = v.map(x => (x - mean) * (x - mean) * (x - mean)).sum / v.length
      assert(math.abs(varQ - m2) < 1e-9 * m2)
      assert(math.abs(skewQ - m3 / math.pow(m2, 1.5)) < 1e-9)
    }
  }

  test("scd2 intervals: contiguous non-overlapping chain, one current row per key") {
    import graft.operators.Changelog
    val rows = Changelog.q94Scd2Intervals(spark, sf)
      .select($"user_id", $"event_id",
        unix_micros($"valid_from".cast("timestamp")).as("f"),
        unix_micros($"valid_to".cast("timestamp")).as("t"),
        $"is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val chain = ivs.sortBy(x => (x._3, x._2))
      assert(chain.count(_._5) === 1, s"user $u: exactly one current row")
      assert(chain.last._5 && chain.last._4.isEmpty)
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u: next valid_from closes the interval")
        case _ => ()
      }
      // as-of semantics: a probe inside interval i resolves to exactly row i
      chain.init.foreach { iv =>
        val probe = iv._3 // probe AT valid_from: [from, to) contains it
        val hits = chain.filter(c => c._3 <= probe && c._4.forall(_ > probe))
        assert(hits.map(_._2).toSeq === Seq(iv._2)
          || chain.exists(c => c._3 == probe && c._2 != iv._2), // ts-tie rows share an instant
          s"user $u: probe $probe resolves ambiguously")
      }
    }
  }

  test("rolling events: frame equals the brute-force trailing hour for a user") {
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val user = e.groupBy(_._2).maxBy(_._2.length)._1 // busiest user
    val mine = e.filter(_._2 == user)
    val got = Relational.q88RollingEvents(spark, sf)
      .filter($"user_id" === user)
      .select($"event_id", $"cnt_1h", $"sum_1h")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mine.nonEmpty && got.size === mine.length)
    val hourUs = 3600L * 1000000L
    mine.foreach { case (eid, _, us, _) =>
      val frame = mine.filter(x => x._3 >= us - hourUs && x._3 <= us)
      // the operator's DECIMAL(14,2) convention: round each value exactly
      val expSum = frame.map(x =>
        BigDecimal(x._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (gc, gs) = got(eid)
      assert(gc === frame.length.toLong, s"cnt mismatch at event $eid")
      assert(gs === expSum, s"sum mismatch at event $eid")
    }
  }
}
