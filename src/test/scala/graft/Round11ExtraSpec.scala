package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational, Similarity}

/** Semantic checks for the round-11 extra batch (q166-q171, q190-q192): results
  * re-derived brute-force from collected rows at sf0.001, independent of
  * the DataFrame plan under test, plus plan-shape assertions for each
  * operator's scale claim. Oracle parity runs separately at sf0.01.
  */
class Round11ExtraSpec extends SparkSpec {
  import spark.implicits._

  // --- q166 market share -----------------------------------------------

  test("q166 share is the conditional/total ratio and respects the region filter") {
    val rows = Relational.q166MarketShare(spark, sf)
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, natVol, totVol, share) =>
      assert(natVol >= 0.0 && natVol <= totVol)
      assert(share === natVol / totVol)
    }
    // independent SQL formulation over temp views (correlated-subquery
    // style, a different plan than the operator's semi-join)
    val dir = sf
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(s"v_$t")
    }
    val want = spark.sql(
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_volume
        |FROM v_lineitem
        |JOIN v_part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN v_orders ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey
        |JOIN v_nation ON s_nationkey = n_nationkey
        |WHERE o_custkey IN (SELECT c_custkey FROM v_customer
        |  JOIN v_nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN v_region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA')
        |GROUP BY 1""".stripMargin)
      .as[(Long, Double, Double)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._3)).toSet === want)
  }

  test("q166 broadcasts every dimension side") {
    val p = Relational.q166MarketShare(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("Cartesian"), s"cartesian product:\n$p")
  }

  // --- q167 value share ------------------------------------------------

  test("q167 equals a brute-force per-part share computation") {
    val li = sources.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_extendedprice").as[(Long, Double)].collect()
    val cents = li.groupBy(_._1).view.mapValues(
      _.map(r => math.round(r._2 * 100)).sum).toMap
    val total = cents.values.sum
    val want = cents.collect {
      case (pk, v) if (v / 100.0) / (total / 100.0) > 0.0005 =>
        (pk, v / 100.0, (v / 100.0) / (total / 100.0))
    }.toSet
    val got = Relational.q167ValueShare(spark, sf)
      .as[(Long, Double, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q167 plans the global total as a broadcast, not a second scan join") {
    val p = Relational.q167ValueShare(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"global scalar not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  // --- q168 waiting suppliers ------------------------------------------

  test("q168 equals the exists/not-exists definition replayed brute-force") {
    val li = sources.Tables.lineitem(spark, sf)
      .join(sources.Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        (unix_micros($"l_shipdate".cast("timestamp")) -
          unix_micros($"o_orderdate".cast("timestamp")) >
          60L * 86400000000L).as("late"))
      .as[(Long, Long, Boolean)].collect()
    val byOrder = li.groupBy(_._1)
    val counts = collection.mutable.Map[Long, Long]()
    byOrder.foreach { case (_, ls) =>
      val perSupp = ls.groupBy(_._2).view.mapValues(_.exists(_._3)).toMap
      val supps = perSupp.keySet
      val lateSupps = perSupp.collect { case (s, true) => s }.toSet
      if (supps.size >= 2 && lateSupps.size == 1)
        counts(lateSupps.head) = counts.getOrElse(lateSupps.head, 0L) + 1L
    }
    val suppName = sources.Tables.supplier(spark, sf)
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap
    val want = counts.map { case (s, n) => (suppName(s), s, n) }.toSet
    val got = Relational.q168WaitingSuppliers(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q169 attribution ------------------------------------------------

  test("q169 equals a sequential per-user last-touch replay") {
    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long, String, Double, Long)].collect()
    val window = 7L * 86400000000L
    val conv = collection.mutable.Map[String, (Long, Long)]() // n, cents
    ev.groupBy(_._1).foreach { case (_, es) =>
      var lastTouch: Option[(Long, String)] = None
      es.sortBy(e => (e._5, e._2)).foreach { case (_, _, typ, v, us) =>
        if (typ == "purchase") {
          val ch = lastTouch match {
            case Some((tus, ttyp)) if us - tus <= window => ttyp
            case _ => "direct"
          }
          val (n, c) = conv.getOrElse(ch, (0L, 0L))
          conv(ch) = (n + 1, c + math.round(v * 100))
        }
        if (typ == "click" || typ == "view") lastTouch = Some((us, typ))
      }
    }
    val want = conv.map { case (ch, (n, c)) => (ch, n, c / 100.0) }.toSet
    val got = Relational.q169Attribution(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    // the purchase rows all land somewhere: conversions sum = purchase count
    val purchases = ev.count(_._3 == "purchase")
    assert(got.toSeq.map(_._2).sum === purchases)
  }

  test("q169 shares one user_id exchange between window and rollup") {
    val p = Relational.q169Attribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"one-task window:\n$p")
  }

  // --- q170 span dedup -------------------------------------------------

  test("q170 equals a brute-force overlapping-window span-union replay") {
    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val w = 5
    val grams = collection.mutable.Map[String, collection.mutable.Set[Long]]()
    docs.foreach { case (id, t) =>
      val ws = t.split(" ", -1)
      for (i <- 0 to ws.length - w)
        grams.getOrElseUpdate(ws.slice(i, i + w).mkString(" "),
          collection.mutable.Set[Long]()) += id
    }
    val dup = grams.collect { case (g, ids) if ids.size > 1 => g }.toSet
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val covered = collection.mutable.Set[Int]()
      for (i <- 0 to ws.length - w
           if dup(ws.slice(i, i + w).mkString(" ")); j <- i until i + w)
        covered += j
      val kept = ws.indices.filterNot(covered).map(ws).mkString(" ")
      (id, kept, ws.length.toLong, covered.size.toLong)
    }.toSet
    val got = Dedup.q170SpanDedup(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === want)
    // dedup actually fires on this corpus
    assert(got.exists(_._4 > 0))
    // overlap semantics beat q118's aligned segments: a removed span is
    // always >= w tokens long in the union (each flagged window covers w)
    assert(got.filter(_._4 > 0).forall(_._4 >= w))
  }

  test("q170 joins the dup-gram set with a shuffle, not a broadcast") {
    val p = Dedup.q170SpanDedup(spark, sf)
      .queryExecution.executedPlan.toString
    // the left-semi membership join keys on the data-dependent gram set
    assert(!p.contains("BroadcastNestedLoop"), s"nested loop:\n$p")
    assert(!p.contains("Cartesian"), s"cartesian:\n$p")
  }

  // --- q190-q192 TPC-H Q17/Q18/Q22 shapes ------------------------------

  test("q190 small-order revenue equals a per-part-average replay") {
    val li = sources.Tables.lineitem(spark, sf)
      .join(sources.Tables.part(spark, sf).filter($"p_brand" === "Brand#1"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect()
    val byPart = li.groupBy(_._1)
    var n = 0L
    var cents = 0L
    byPart.values.foreach { ls =>
      val avg = ls.map(l => math.round(l._2 * 100)).sum.toDouble / 100.0 /
        ls.length
      ls.foreach { l =>
        if (l._2 < avg * 0.2) { n += 1; cents += math.round(l._3 * 100) }
      }
    }
    val Array((gN, gRev)) = Relational.q190Tpch17(spark, sf)
      .as[(Long, Double)].collect()
    assert(gN === n)
    assert(gRev === cents / 100.0)
    assert(n > 0)
  }

  test("q191 keeps exactly the orders above the quantity threshold") {
    val totals = sources.Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      .as[(Long, Double)].collect().toMap
    val got = Relational.q191Tpch18(spark, sf)
      .select($"o_orderkey", $"total_qty").as[(Long, Double)].collect()
    assert(got.map(_._1).toSet === totals.filter(_._2 > 150.0).keySet)
    got.foreach { case (o, q) => assert(q === totals(o)) }
    assert(got.nonEmpty)
  }

  test("q192 dormant set is the anti-join of the above-average balances") {
    val cust = sources.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .as[(Long, Int, Double)].collect()
    val pos = cust.filter(_._3 > 0.0)
    val avg = pos.map(c => math.round(c._3 * 100)).sum.toDouble / 100.0 /
      pos.length
    val recent = sources.Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey").as[Long].collect().toSet
    val want = cust.filter(c => c._3 > avg && !recent(c._1))
      .groupBy(_._2).map { case (nk, cs) =>
        (nk, cs.length.toLong,
          cs.map(c => math.round(c._3 * 100)).sum / 100.0)
      }.toSet
    val got = Relational.q192Tpch22(spark, sf)
      .as[(Int, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  // --- q201 share of parent --------------------------------------------

  test("q201 shares are consistent: nations sum to their region, regions to 1") {
    val got = Relational.q201ShareOfParent(spark, sf)
      .as[(String, String, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    // within each region, nation shares sum to 1 and revenues to the
    // region total (exact decimal sums → exact doubles)
    got.groupBy(_._1).foreach { case (r, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9, s"region $r")
      assert(math.abs(rows.map(_._3).sum - rows.head._4) < 1e-6, s"region $r")
    }
    // region shares of total sum to 1 (one row per region)
    val regionShares = got.groupBy(_._1).map(_._2.head._6)
    assert(math.abs(regionShares.sum - 1.0) < 1e-9)
    // independent replay of one nation's share from raw tables
    val perNation = sources.Tables.orders(spark, sf)
      .join(sources.Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(sources.Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"o_totalprice".cast("decimal(14,2)")).as("rev"))
      .as[(String, java.math.BigDecimal)].collect().toMap
    got.foreach { case (_, n, rev, _, _, _) =>
      assert(rev === perNation(n).doubleValue, n)
    }
  }

  // --- q171 bitext MNN -------------------------------------------------

  test("q171 equals brute-force mutual top-1 and each vector pairs at most once") {
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
    val aSide = vecs.filter(v => v._2 % 2 == 0)
    val bSide = vecs.filter(v => v._2 % 2 != 0)
    def best(from: Array[(Long, Int, Array[Float])],
        to: Array[(Long, Int, Array[Float])]): Map[Long, Long] =
      from.map { f =>
        val b = to.map(t => (cos(f._3, t._3), t._1)).max
        f._1 -> b._2
      }.toMap
    val fwd = best(aSide, bSide)
    val bwd = best(bSide, aSide)
    val want = fwd.collect {
      case (a, b) if bwd(b) == a => (a, b)
    }.toSet
    val got = Similarity.q171BitextMnn(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2)).toSet === want)
    assert(got.nonEmpty)
    // mutuality kills hubs: every id appears at most once per side
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.map(_._2).distinct.length === got.length)
  }
}
