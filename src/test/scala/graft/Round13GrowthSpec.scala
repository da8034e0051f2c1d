package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Relational, Similarity, TextAnalysis}

/** Semantic checks for the round-13 additions (q248-q255): internal
  * consistency the oracle equality can't see (it would agree with a
  * shared misreading), plus the plan shapes the scale story rests on. */
class Round13GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("q248 verdict is exactly the conjunction of its named rules") {
    val rows = TextAnalysis.q248GopherRules(spark, sf)
      .select($"keep", $"ok_word_count", $"ok_mean_word_len",
        $"ok_alpha_share", $"ok_stopwords", $"mean_word_len", $"alpha_share")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (keep, a, b, c, d, mwl, alpha) =>
      assert(keep === (a && b && c && d))
      assert(mwl >= 1.0 && alpha >= 0.0 && alpha <= 1.0)
    }
  }

  test("q249 histogram partitions the corpus words; shares sum to 1 per lang") {
    val hist = Corpus.q249WordlenHist(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val totalWords = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(split($"text", " ", -1)).cast("long")))
      .head().getLong(0)
    assert(hist.map(_._3).sum === totalWords)
    hist.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("q250 every emitted row really contains the term where it says") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = TextAnalysis.q250Kwic(spark, sf)
      .select($"doc_id", $"n_hits", $"first_pos", $"context")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, hits, pos, ctx) =>
      assert(hits >= 1)
      assert(ctx.contains("spark"))
      // 1-based offset points at the word start in the ORIGINAL text
      assert(texts(id).startsWith("spark", (pos - 1).toInt))
    }
  }

  test("q251 clean testdata has zero orphans; nation edges broadcast") {
    val audit = Relational.q251OrphanAudit(spark, sf)
    val rows = audit.as[(String, Long, Long, Double)].collect()
    assert(rows.length === 4)
    rows.foreach { case (_, total, orphans, share) =>
      assert(total > 0); assert(orphans === 0L); assert(share === 0.0)
    }
    val lp = audit.queryExecution.optimizedPlan.toString
    assert("strategy=broadcast".r.findAllIn(lp).length === 2,
      s"expected exactly the two nation parents hinted:\n$lp")
  }

  test("q252 groups are real multi-order days with a coherent cent range") {
    val rows = Relational.q252DupOrders(spark, sf)
      .as[(Long, java.time.LocalDateTime, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, lo, hi) =>
      assert(n >= 2); assert(lo <= hi)
    }
  }

  test("q253 Lorenz curve is a proper monotone curve ending at exactly 1.0") {
    val rows = Relational.q253Lorenz(spark, sf)
      .orderBy($"decile").as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (0 to 9))
    // customers partition across deciles
    val n = graft.sources.Tables.orders(spark, sf)
      .select(countDistinct($"o_custkey")).head().getLong(0)
    assert(rows.map(_._2).sum === n)
    // cumulative share strictly nondecreasing, last EXACTLY total/total
    rows.map(_._4).toSeq.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
    assert(rows.last._4 === 1.0)
    // revenue-ascending deciles ⇒ nondecreasing mean revenue per customer
    val means = rows.map(r => r._3 / r._2)
    means.toSeq.sliding(2).foreach { case Seq(a, b) => assert(a <= b + 1e-9) }
  }

  test("q254 HHI is bounded by [1/n, 1] and conserves order counts") {
    val rows = Relational.q254NationHhi(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nCust, _, hhi) =>
      assert(hhi >= 1.0 / nCust - 1e-12 && hhi <= 1.0 + 1e-12)
    }
    val totalOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_._3).sum === totalOrders)
  }

  test("q256 TVD is bounded, covers every source pair, and replays in memory") {
    val rows = Corpus.q256SourceTvd(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val nSrc = graft.sources.Tables.documents(spark, sf)
      .select(countDistinct($"source")).head().getLong(0).toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    rows.foreach { case (a, b, n, tvd) =>
      assert(a < b); assert(n > 0)
      assert(tvd >= 0.0 && tvd <= 1.0 + 1e-12)
    }
    // sequential replay for one pair (the definition, no Spark)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val (sa, sb) = (rows.head._1, rows.head._2)
    def dist(s: String): Map[String, Double] = {
      val ws = docs.filter(_._1 == s).flatMap(_._2.split(" ", -1))
      val tot = ws.length.toDouble
      ws.groupBy(identity).map { case (w, g) => w -> g.length / tot }
    }
    val (pa, pb) = (dist(sa), dist(sb))
    val want = (pa.keySet ++ pb.keySet).toSeq.sorted
      .map(w => math.abs(pa.getOrElse(w, 0.0) - pb.getOrElse(w, 0.0)))
      .sum / 2.0
    val got = rows.find(r => r._1 == sa && r._2 == sb).get._4
    assert(math.abs(got - want) < 1e-12)
  }

  test("q255 per-label norm profile brackets the mean and covers the corpus") {
    val rows = Similarity.q255NormProfile(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, lo, hi, mean) =>
      assert(n > 0); assert(lo <= mean + 1e-12 && mean <= hi + 1e-12)
    }
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === total)
  }
}
