package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Rank, Relational}

/** Semantic checks for the round-11 operators (q123-q126): results
  * re-derived brute-force from collected rows at sf0.001, independent of
  * the DataFrame plan under test. Oracle parity runs separately at sf0.01.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Rank.prefixMax ---------------------------------------------------

  test("prefixMax equals the unpartitioned running-max window, incl. ties") {
    // ties in the sort key exercise the STRICTLY-BEFORE frame semantics
    val df = Seq((1, 10), (2, 5), (2, 50), (3, 7), (3, 7), (4, 1), (5, 99))
      .toDF("k", "v")
    val got = Rank.prefixMax(df, Seq($"k".asc, $"v".desc), $"v", "pm")
      .select($"k", $"v", $"pm")
      .as[(Int, Int, Option[Int])].collect().toSet
    val w = Window.orderBy($"k".asc, $"v".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm", max($"v").over(w))
      .as[(Int, Int, Option[Int])].collect().toSet
    assert(got === want)
    assert(want.exists(_._3.isEmpty), "global first row must be null")
  }

  test("prefixMax plan has no unpartitioned Window") {
    val df = (1 to 100).map(i => (i, i * 7 % 31)).toDF("k", "v")
    val plan = Rank.prefixMax(df, Seq($"k".asc), $"v", "pm")
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec (__pid); an
    // unpartitioned one would funnel the data frame through one task
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window in plan: $l")
    }
  }

  // --- q123 skyline -----------------------------------------------------

  test("q123 equals the quadratic dominance definition") {
    val base = sources.Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice".cast("double"), $"p_size")
      .as[(Long, Double, Int)].collect()
    val want = base.filter { case (_, pr, sz) =>
      !base.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = Relational.q123Skyline(spark, sf)
      .select($"p_partkey", $"p_retailprice".cast("double"), $"p_size")
      .as[(Long, Double, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < base.length, "frontier must prune")
  }

  // --- q124 transitions -------------------------------------------------

  test("q124 probabilities sum to 1 per from_type and counts are exact") {
    val rows = Relational.q124Transitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val p = ts.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-9, s"P(.|$from) sums to $p")
      // prob is exactly cnt / total as ONE IEEE division
      val total = ts.map(_._3).sum
      ts.foreach(t => assert(t._4 === t._3.toDouble / total.toDouble))
    }
    // brute-force the counts from the raw events
    val want = sources.Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("timestamp").cast("long"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._2, e._3)).map(_._4).toList.sliding(2).toList
          .collect { case List(a, b) => (a, b) }
      }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === want)
  }

  // --- q125 histogram ---------------------------------------------------

  test("q125 bins partition the quantity domain exactly") {
    val rows = Relational.q125Histogram(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, bin, lo, hi, cnt, qmin, qmax) =>
      assert(lo === bin * 5 + 1 && hi === bin * 5 + 5)
      assert(cnt > 0 && qmin >= lo && qmax <= hi)
    }
    val total = sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_._5).sum === total, "bins cover every row exactly once")
  }

  // --- Rank.ntile / q127 ------------------------------------------------

  test("ntile matches SQL NTILE for sizes around the bucket-count boundary") {
    // N < n, N = n, N not divisible by n, N divisible by n
    for (nRows <- Seq(3, 10, 23, 40); n = 10) {
      val df = (1 to nRows).map(i => (i * 13 % 97, i)).toDF("v", "id")
      val got = Rank.ntile(df, Seq($"v".asc, $"id".asc), n)
        .select($"id", $"bucket").as[(Int, Int)].collect().toMap
      val want = df.withColumn("bucket",
          ntile(n).over(Window.orderBy($"v".asc, $"id".asc)))
        .select($"id", $"bucket").as[(Int, Int)].collect().toMap
      assert(got === want, s"nRows=$nRows")
    }
  }

  test("ntile plan has no unpartitioned Window") {
    val df = (1 to 100).map(i => (i * 13 % 97, i)).toDF("v", "id")
    val plan = Rank.ntile(df, Seq($"v".asc, $"id".asc), 10)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window in plan: $l")
    }
  }

  // --- Rank.prefixSumAndTotal / q128 ------------------------------------

  test("prefixSumAndTotal equals the running-sum window and exact total") {
    val df = Seq((5, 2L), (1, 7L), (3, 1L), (9, 4L), (2, 6L)).toDF("k", "c")
    val (got, total) = Rank.prefixSumAndTotal(df, Seq($"k".asc), $"c", "cum")
    assert(total === 20L)
    val w = Window.orderBy($"k".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum($"c").over(w))
      .as[(Int, Long, Long)].collect().toSet
    assert(got.as[(Int, Long, Long)].collect().toSet === want)
  }

  test("q128 CDF endpoints and monotonicity") {
    val rows = Relational.q128Cdf(spark, sf)
      .select($"p_retailprice".cast("double"), $"cnt", $"cume_dist",
        $"percent_rank")
      .as[(Double, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.last._3 === 1.0, "cume_dist of the max value is exactly 1")
    assert(rows.head._4 === 0.0, "percent_rank of the min value is exactly 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._3 && a._4 < b._4, "strictly increasing over values")
    }
    val n = rows.map(_._2).sum
    rows.foldLeft(0L) { case (cum, (_, cnt, cd, pr)) =>
      assert(cd === (cum + cnt).toDouble / n.toDouble)
      assert(pr === cum.toDouble / (n - 1).toDouble)
      cum + cnt
    }
  }

  // --- q126 char classes ------------------------------------------------

  test("q126 class counts re-derived per-document match") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      val ts = ds.map(_._2)
      val c = ts.map(_.length.toLong).sum
      val l = ts.map(_.count(ch => ch.isLetter).toLong).sum
      val d = ts.map(_.count(ch => ch.isDigit).toLong).sum
      val s = ts.map(_.count(_ == ' ').toLong).sum
      (c, l, d, s, c - l - d - s, l.toDouble / c.toDouble)
    }.toMap
    val got = operators.TextAnalysis.q126CharClasses(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got === want)
  }

  // --- q136 TWAP --------------------------------------------------------

  test("q136 equals a per-user brute-force replay of the hold intervals") {
    // cents come from the SAME decimal cast the operator uses, so this
    // replay tests the interval/windowing logic, not double→decimal rounding
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id",
        unix_micros($"ts".cast("timestamp")).as("us"),
        $"event_id",
        ($"value".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val holds = rows.sortBy(r => (r._2, r._3)).toSeq.sliding(2).collect {
        case Seq(a, b) => (a._4, b._2 - a._2) // (cents held, gap µs)
      }.toSeq
      val span = holds.map(_._2).sum
      if (holds.isEmpty || span <= 0) None
      else Some(u -> ((holds.size.toLong, span,
        holds.map(h => h._1 * h._2).sum.toDouble / (span * 100).toDouble)))
    }
    val got = Relational.q136Twap(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q136 plan shares ONE user_id exchange between window and agg") {
    val plan = Relational.q136Twap(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange "))
    assert(exchanges === 1,
      s"expected the lead window and the groupBy to reuse one user_id " +
        s"hash exchange, plan had $exchanges:\n$plan")
  }
}
