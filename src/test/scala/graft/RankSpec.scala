package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, concat, lit, spark_partition_id, when}

import graft.operators.{Corpus, Rank, Relational}

/** Distributed global ranking: exact parity with the single-window rank,
  * without the all-rows-through-one-reducer sort. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-window rank under a total order") {
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 97L).as("k"), col("id"))
    val got = Rank.globalRowNumber(df, Seq(col("k"), col("id")))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val expect = df.select($"k", $"id").as[(Long, Long)].collect()
      .sortBy(identity).map(_._2).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got === expect)
  }

  test("globalRowNumber never plans a single-partition window, even on a shuffle-rooted input") {
    // a groupBy-derived input is the hazard case: AQE re-plans its shuffle,
    // which is why the util materializes the ranged frame before counting
    val df = spark.range(0, 1000)
      .groupBy((col("id") % 97).as("k")).count()
    val out = Rank.globalRowNumber(df, Seq(col("count"), col("k")))
    val p = out.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("SinglePartition"),
      s"no single-partition global window allowed:\n$p")
    val got = out.select($"k", $"rn").as[(Long, Long)].collect()
    val expect = df.select($"count", $"k").as[(Long, Long)].collect()
      .sortBy(identity).map(_._2).zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got.toMap === expect)
  }

  test("kthSmallest selects the exact order statistic (median, extremes, ties)") {
    // hashed-scatter values with deliberate duplicates: ties across the
    // TakeOrdered boundary must still yield the k-th VALUE
    val df = spark.range(0, 1001).select(
      (col("id") * 2654435761L % 101L).as("v"))
    val sorted = df.select($"v").as[Long].collect().sorted
    for (kf <- Seq[Long => Long](n => (n + 1) / 2, _ => 1L, n => n)) {
      val (kth, total) = Rank.kthSmallest(df, col("v"), kf)
      assert(total === 1001L)
      val got = kth.as[Long].head()
      assert(got === sorted((kf(total) - 1).toInt),
        s"rank ${kf(total)} of $total")
    }
  }

  test("kthSmallest rejects out-of-range ranks loudly") {
    val df = spark.range(0, 10).select(col("id").as("v"))
    intercept[IllegalArgumentException] {
      Rank.kthSmallest(df, col("v"), _ => 0L)
    }
    intercept[IllegalArgumentException] {
      Rank.kthSmallest(df, col("v"), n => n + 1)
    }
  }

  test("groupRowNumberAndTotal equals the per-group window rank + count") {
    // a dominant group (the q293 shape: one segment ≈ most rows) plus
    // small ones, keys scattered so ranges interleave groups
    val df = spark.range(0, 2000).select(
      (when(col("id") % 10 < 7, "big").when(col("id") % 10 < 9, "mid")
        .otherwise("small")).as("g"),
      (col("id") * 2654435761L % 1009L).as("v"), col("id"))
    val got = Rank.groupRowNumberAndTotal(df, Seq("g"),
        Seq(col("v"), col("id")), "rk", "n")
      .select($"g", $"id", $"rk", $"n")
      .as[(String, Long, Long, Long)].collect()
    val rows = df.select($"g", $"v", $"id")
      .as[(String, Long, Long)].collect()
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) =>
        (g, r._3) -> ((i + 1L, rs.length.toLong))
      }
    }.toMap
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap === expect)
  }

  test("groupRowNumberAndTotal keeps NULL groups (PARTITION BY semantics)") {
    // a nullable group column must rank as its own group, not silently
    // vanish through a null-unsafe join — SQL window semantics
    val df = spark.range(0, 100).select(
      when(col("id") % 3 === 0, "g").otherwise(lit(null)).as("g"),
      col("id"))
    val got = Rank.groupRowNumberAndTotal(df, Seq("g"),
        Seq(col("id")), "rk", "n")
      .select($"g", $"id", $"rk", $"n")
      .as[(Option[String], Long, Long, Long)].collect()
    assert(got.length === 100, "no row may vanish")
    val nulls = got.filter(_._1.isEmpty)
    assert(nulls.length === 66 && nulls.forall(_._4 === 66L))
    assert(nulls.sortBy(_._2).map(_._3).toSeq === (1L to 66L))
    val gs = got.filter(_._1.contains("g"))
    assert(gs.length === 34 && gs.forall(_._4 === 34L))
    assert(gs.sortBy(_._2).map(_._3).toSeq === (1L to 34L))
  }

  test("a mega-group provably spans range partitions; ranks stay continuous across the seam") {
    // The r15 cliff cure's reason to exist: ONE group holding most rows
    // must have its sort SPREAD across range partitions (else the device
    // degenerates back into the entity-sized single task), and the
    // stitched ranks must be seamless across every partition boundary
    // inside the group. The plan pins (Round15PlanSpec) prove the shape;
    // this proves the DATA property — the fixture plants a group large
    // enough that spanning is asserted, not incidental.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val df = spark.range(0, 3200).select(
      when(col("id") < 3000, "mega")
        .otherwise(concat(lit("s"), col("id") % 3)).as("g"),
      (col("id") % 13).as("v"), // heavy ties: boundaries land MID-tie
      col("id"))
    // the exact exchange the skeleton performs: the mega group must span
    // ≥2 of its range partitions or this fixture tests no seam at all
    val spanned = df.repartitionByRange(parts, col("g"), col("v"), col("id"))
      .where(col("g") === "mega")
      .select(spark_partition_id()).distinct().count()
    assert(spanned >= 2,
      s"fixture failure: mega group landed in $spanned partition(s) over " +
        s"$parts — grow it until it provably spans a boundary")

    val rows = df.select($"g", $"v", $"id").as[(String, Long, Long)].collect()

    val got = Rank.groupRowNumberAndTotal(df, Seq("g"),
        Seq(col("v"), col("id")), "rk", "n")
      .select($"g", $"id", $"rk", $"n")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === rows.length, "no row may vanish or duplicate")
    got.groupBy(_._1).foreach { case (g, rs) =>
      val want = rows.filter(_._1 == g).sortBy(r => (r._2, r._3)).map(_._3)
      assert(rs.forall(_._4 == want.length.toLong), s"group $g total")
      // ranks are exactly 1..n in (v, id) order — a seam bug (an offset
      // dropped or double-counted at a boundary) breaks the permutation
      assert(rs.map(_._3).sorted.toSeq === (1L to want.length.toLong),
        s"group $g rank continuity across the seam")
      assert(rs.sortBy(_._3).map(_._2).toSeq === want.toSeq,
        s"group $g rank order")
    }

    // the prefix-sum twin over the same spanning fixture: exclusive
    // per-group running sums must equal the sequential scan exactly
    val ps = Rank.groupPrefixSum(df, Seq("g"), Seq(col("v"), col("id")),
        col("id") % 7, "ps")
      .select($"g", $"id", $"ps").as[(String, Long, Long)].collect()
    val expectPs = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      sorted.map(_._3).toSeq
        .zip(sorted.map(r => r._3 % 7).scanLeft(0L)(_ + _).init)
        .map { case (id, s) => (g, id) -> s }
    }.toMap
    assert(ps.map(r => (r._1, r._2) -> r._3).toMap === expectPs)
  }

  test("descending sort keys rank correctly (q86's vocab ordering)") {
    val df = Seq(("the", 50L), ("of", 50L), ("zebra", 1L), ("a", 70L))
      .toDF("word", "c")
    val got = Rank.globalRowNumber(df, Seq(col("c").desc, col("word").asc),
      rnCol = "rank").select($"word", $"rank").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1L, "of" -> 2L, "the" -> 3L, "zebra" -> 4L))
  }

  test("q105 decile is the exact rank-arithmetic tile") {
    val rows = Relational.q105GlobalRank(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val n = rows.length
    assert(rows.map(_._3).sorted === (1L to n).toArray, "ranks are a permutation")
    rows.foreach { case (_, _, rn, dec) =>
      assert(dec === ((rn - 1) * 10) / n, s"rank $rn tile")
    }
    // ranks follow (n_chars, doc_id) order
    val sorted = rows.sortBy(r => (r._2, r._1))
    assert(sorted.map(_._3).toSeq === (1L to n).toSeq)
  }

  test("q104 degree/triangles/clustering match brute force over the pair graph") {
    val edges = graft.operators.Dedup.q43NgramJaccard(spark, sf, 0.6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Corpus.q104GraphDegree(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === adj.keySet)
    adj.foreach { case (v, ns) =>
      val (deg, tri, cc) = got(v)
      assert(deg === ns.size.toLong, s"degree of $v")
      val closed = ns.toSeq.combinations(2).count {
        case Seq(a, b) => adj(a).contains(b)
        case _ => false
      }
      assert(tri === closed.toLong, s"triangles at $v")
      val expectCc = if (ns.size >= 2)
        2.0 * closed / (ns.size.toDouble * (ns.size - 1)) else 0.0
      assert(math.abs(cc - expectCc) < 1e-15, s"clustering at $v")
    }
  }
}
