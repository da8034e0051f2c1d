package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

import graft.operators.{Changelog, Corpus, Relational}

/** Semantic checks for the round-9 operators (q95-q103): each result is
  * re-derived brute-force from collected rows at sf0.001 — independent of
  * the DataFrame plan under test. Oracle parity runs separately at sf0.01.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def events =
    graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSeq

  test("q95 full outer join preserves unmatched buckets on both sides") {
    val cust = graft.sources.Tables.customer(spark, sf)
      .select($"c_acctbal").as[Double].collect()
      .groupBy(b => math.floor(b / 100.0).toLong).view.mapValues(_.length.toLong).toMap
    val supp = graft.sources.Tables.supplier(spark, sf)
      .select($"s_acctbal").as[Double].collect()
      .groupBy(b => math.floor(b / 100.0).toLong).view.mapValues(_.length.toLong).toMap
    val got = Relational.q95FullOuter(spark, sf)
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === (cust.keySet ++ supp.keySet))
    got.foreach { case (b, (nc, ns)) =>
      assert(nc === cust.get(b), s"bucket $b customer count")
      assert(ns === supp.get(b), s"bucket $b supplier count")
    }
    // the join must be genuinely outer: some bucket exists on one side only
    assert(got.exists(_._2._1.isEmpty) || got.exists(_._2._2.isEmpty),
      "data must exercise at least one unmatched bucket")
  }

  test("q96 pivot cells equal per-(user,type) counts; absent cells are 0") {
    val expect = events.groupBy(e => (e._3, e._4)).view.mapValues(_.size.toLong).toMap
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rows = Relational.q96Pivot(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      types.foreach { t =>
        assert(r.getLong(r.fieldIndex(s"n_$t")) === expect.getOrElse((u, t), 0L),
          s"user $u type $t")
      }
    }
    assert(rows.map(_.getLong(0)).toSet ===
      events.map(_._3).toSet, "one row per user")
  }

  test("q97 unpivot emits one (measure, amount) row per wide cell") {
    val wide = Relational.q97Unpivot(spark, sf)
      .as[(String, String, Double)].collect()
    val flags = wide.map(_._1).distinct
    assert(wide.length === flags.length * 3)
    flags.foreach { f =>
      val ms = wide.filter(_._1 == f).map(_._2).sorted
      assert(ms === Array("sum_disc", "sum_price", "sum_tax"))
    }
    // melt must be lossless: sum_price per flag equals the decimal-exact sum
    val prices = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(r => BigDecimal(r._2).setScale(2)).sum.toDouble).toMap
    wide.filter(_._2 == "sum_price").foreach { case (f, _, a) =>
      assert(a === prices(f), s"flag $f melted sum_price")
    }
  }

  test("q98 regression matches direct least-squares from exact sums") {
    val xy = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity", $"l_discount")
      .as[(String, Double, Double)].collect()
    val got = Relational.q98Regression(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    xy.groupBy(_._1).foreach { case (flag, rows) =>
      val n = rows.length.toDouble
      val x = rows.map(_._2.toLong)
      val y = rows.map(r => BigDecimal(r._3).setScale(2))
      val sx = x.sum.toDouble
      val sy = y.sum.toDouble
      val sxy = x.zip(y).map { case (a, b) => b * BigDecimal(a) }.sum.toDouble
      val sxx = x.map(a => a * a).sum.toDouble
      val syy = y.map(b => b * b).sum.toDouble
      val cov = n * sxy - sx * sy
      val varx = n * sxx - sx * sx
      val (_, gn, gs, gi, gr) = got(flag)
      assert(gn === rows.length.toLong)
      assert(math.abs(gs - cov / varx) < 1e-12, s"$flag slope")
      assert(math.abs(gi - (sy - (cov / varx) * sx) / n) < 1e-9, s"$flag intercept")
      assert(math.abs(gr - cov / (math.sqrt(varx) * math.sqrt(n * syy - sy * sy))) < 1e-12,
        s"$flag pearson")
    }
  }

  test("q99 NOT IN excludes big spenders and plans null-aware") {
    val big = graft.sources.Tables.orders(spark, sf)
      .filter($"o_totalprice" > 300000).select($"o_custkey").as[Long].collect().toSet
    val all = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey").as[Long].collect().toSet
    val df = Relational.q99NotIn(spark, sf)
    val got = df.select($"c_custkey").as[Long].collect().toSet
    assert(got === (all -- big))
    // BroadcastHashJoinExec's last argument is isNullAwareAntiJoin — the
    // executed-plan string renders it as a bare `true` after BuildRight
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"statically-nullable NOT IN must plan a null-aware anti join, got:\n$p")
  }

  test("NOT IN over a list containing NULL returns no rows (3VL semantics)") {
    val n = spark.sql(
      "SELECT * FROM VALUES (1),(2) t(x) WHERE x NOT IN (SELECT y FROM VALUES (1),(CAST(NULL AS INT)) s(y))")
      .count()
    assert(n === 0L)
  }

  test("q100 mode picks the max-count type with deterministic ties") {
    val counts = events.groupBy(e => (e._3, e._4)).view.mapValues(_.size.toLong).toMap
    val expect = counts.groupBy(_._1._1).map { case (u, m) =>
      val best = m.toSeq.map { case ((_, t), c) => (t, c) }
        .minBy { case (t, c) => (-c, t) }
      u -> (best._1, best._2, m.size.toLong)
    }
    val got = Relational.q100Mode(spark, sf)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expect)
  }

  test("q101 diff applied to the old state reproduces the new state") {
    def state(cut: String) = {
      val c = java.sql.Timestamp.valueOf(cut)
      events.filter(!_._2.after(c))
        .groupBy(_._3).view
        .mapValues(_.maxBy(e => (e._2.getTime, e._1)))
        .filter(_._2._4 != "error")
        .mapValues(_._1).toMap // user -> latest event_id
    }
    val oldS = state("2024-01-15 00:00:00")
    val newS = state("2024-01-25 00:00:00")
    val diff = Changelog.q101MvDiff(spark, sf)
      .select($"user_id", $"op", $"new_event_id")
      .as[(Long, String, Option[Long])].collect()
    // applying the diff transforms oldS into newS exactly
    val applied = diff.foldLeft(oldS) { case (s, (u, op, nev)) =>
      op match {
        case "D" => assert(s.contains(u), s"delete of absent key $u"); s - u
        case "I" => assert(!s.contains(u), s"insert of present key $u"); s + (u -> nev.get)
        case "U" => assert(s.contains(u), s"update of absent key $u"); s + (u -> nev.get)
      }
    }
    assert(applied === newS)
    // and the diff is minimal: no no-op rows
    diff.foreach { case (u, op, nev) =>
      if (op == "U") assert(oldS.get(u) !== nev, s"no-op update for $u")
    }
  }

  test("q102 temporal join resolves each click to the purchase in effect") {
    val purchases = events.filter(_._4 == "purchase")
      .groupBy(_._3).view.mapValues(_.sortBy(e => (e._2.getTime, e._1))).toMap
    val expect = events.filter(_._4 == "click").flatMap { c =>
      purchases.getOrElse(c._3, Seq.empty)
        .takeWhile(p => !p._2.after(c._2)) // purchases at ts <= click ts
        .lastOption.map(p => (c._1, p._1)) // click -> version in effect
    }.toMap
    val got = Changelog.q102TemporalJoin(spark, sf)
      .select($"event_id", $"dim_event_id").as[(Long, Long)].collect()
    assert(got.length === got.map(_._1).distinct.length,
      "interval containment must match at most one version per click")
    assert(got.toMap === expect)
  }

  test("q103 prefix clusters match a direct first-k-words grouping") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val expect = docs.groupBy(d => d._3.split(" ", -1).take(8).mkString(" "))
      .filter(_._2.length >= 2)
      .map { case (p, ds) =>
        p -> (ds.length.toLong, ds.map(_._2).distinct.length.toLong, ds.map(_._1).min)
      }
    val got = Corpus.q103PrefixCluster(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expect)
    assert(got.nonEmpty, "sf0.001 must contain at least one shared prefix")
  }

  test("q108 lateral decorrelates to a ranked join, never per-row re-execution") {
    val df = Relational.q108Lateral(spark, sf)
    // semantics: per-nation top-2 by (acctbal desc, name)
    val cust = graft.sources.Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_name", $"c_acctbal")
      .as[(Int, String, Double)].collect()
    val nations = graft.sources.Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
    val expect = cust.groupBy(_._1).toSeq.flatMap { case (nk, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).toSeq
        .map(r => (nations(nk), r._2, r._3))
    }.toSet
    assert(df.as[(String, String, Double)].collect().toSet === expect)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "decorrelated lateral must rank with a bounded group limit")
    assert(!p.contains("CartesianProduct"), "no per-outer-row nested loop")
  }

  test("q114 forward-fills every spine hour with the last observed value") {
    val rows = Relational.q114GapFill(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // dense spine: consecutive hour indexes, starts observed
      assert(sorted.map(_._2).toSeq ===
        (sorted.head._2 to sorted.last._2).toSeq, s"user $u spine not dense")
      assert(sorted.head._4, s"user $u first spine hour must be observed")
      // fill semantics: unobserved hours carry the previous hour's value
      sorted.sliding(2).foreach {
        case Array(prev, cur) if !cur._4 =>
          assert(cur._3 === prev._3, s"user $u hour ${cur._2} fill")
        case _ => ()
      }
    }
    assert(rows.exists(!_._4), "data must exercise at least one filled gap")
  }

  test("zorderKey interleaves bits exactly and is invertible") {
    val rows = Relational.q112Zorder(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, s, z) =>
      (0 until 16).foreach { j =>
        assert(((z >> (2 * j)) & 1L) === ((p >> j) & 1L), s"p bit $j of ($p,$s)")
        assert(((z >> (2 * j + 1)) & 1L) === ((s >> j) & 1L), s"s bit $j of ($p,$s)")
      }
    }
    // invertible → distinct pairs get distinct keys
    assert(rows.map(_._3).distinct.length === rows.length)
  }

  test("q96 pivot shuffles only aggregated rows, no key-discovery job") {
    val p = Relational.q96Pivot(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // formatted mode prints each node twice (tree + detail) — count the
    // numbered detail headers, and only shuffle exchanges (not broadcasts)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges === 2, s"declared-values pivot = exactly two chained aggs, got:\n$p")
    // both shuffles must sit above a partial aggregation — raw events are
    // never exchanged, and no distinct pass runs to discover pivot keys
    assert(p.contains("partial_count"), "count agg must be map-side partial")
    assert(p.contains("partial_pivotfirst"), "pivot agg must be map-side partial")
  }
}
