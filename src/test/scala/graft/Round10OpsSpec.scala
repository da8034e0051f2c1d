package graft

import graft.operators.{Corpus, Relational, Similarity}

/** Semantic checks for the round-10 operators (q118-q122): each result is
  * re-derived brute-force from collected rows at sf0.001 — independent of
  * the DataFrame plan under test. Oracle parity runs separately at sf0.01
  * (q122 is rows-only there; THIS suite is its correctness gate).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs: Seq[(Long, String)] =
    graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

  // --- q118 line-level dedup -------------------------------------------

  private def segsOf(text: String, segLen: Int = 3): Vector[String] =
    text.split(" ").grouped(segLen).map(_.mkString(" ")).toVector

  test("q118 segmentation is lossless before any removal") {
    docs.foreach { case (id, t) =>
      assert(segsOf(t).mkString(" ") === t, s"doc $id resegmented")
    }
  }

  test("q118 removes exactly the cross-document duplicate segments") {
    val dup = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    assert(dup.nonEmpty, "data must exercise duplicate segments")
    val got = Corpus.q118LineDedup(spark, sf)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === docs.map(_._1).toSet, "every document survives")
    docs.foreach { case (id, t) =>
      val segs = segsOf(t)
      val kept = segs.filterNot(dup)
      val (text, nSegs, nRemoved) = got(id)
      assert(nSegs === segs.length.toLong, s"doc $id n_segs")
      assert(nRemoved === (segs.length - kept.length).toLong, s"doc $id n_removed")
      assert(text === kept.mkString(" "), s"doc $id kept_text order/content")
    }
    // the pass must actually drop something, and never everything everywhere
    assert(got.values.exists(_._3 > 0))
    assert(got.values.exists(v => v._1.nonEmpty))
  }

  // --- q119 PMI collocations -------------------------------------------

  test("q119 lift ranking equals direct PMI computation") {
    // tie-break like Spark/DuckDB do: UTF-8 binary collation, not Scala's
    // UTF-16 code-unit compare (they diverge on supplementary-plane chars)
    implicit val utf8: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compare(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val ws = docs.map(_._2.split(" ").toVector)
    val uc = ws.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = ws.map(_.length).sum.toLong
    val bc = ws.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = bc.toSeq.collect { case ((w1, w2), cxy) if cxy >= 5 =>
      // same double ops as both engines: one IEEE division of exact ints
      val lift = (cxy * n).toDouble / (uc(w1) * uc(w2)).toDouble
      (w1, w2, cxy, uc(w1), uc(w2), lift)
    }.sortBy(r => (-r._6, r._1, r._2)).take(50)
      .zipWithIndex.map { case (r, i) => (r._1, r._2, r._3, r._4, r._5, r._6, i + 1L) }
    val got = Corpus.q119Collocations(spark, sf)
      .as[(String, String, Long, Long, Long, Double, Long)].collect()
      .sortBy(_._7).toSeq
    assert(got === expect)
    // ranking by lift IS ranking by PMI: log is strictly monotone
    val byPmi = got.sortBy(r => (-math.log(r._6), r._1, r._2)).map(_._7)
    assert(byPmi === got.map(_._7), "PMI order equals lift order")
  }

  test("q119 ranks AFTER TakeOrdered: no window sees the pre-limit frame") {
    val p = Corpus.q119Collocations(spark, sf)
      .queryExecution.executedPlan.toString
    val takeOrdered = p.indexOf("TakeOrderedAndProject")
    assert(takeOrdered >= 0, s"no TakeOrderedAndProject in:\n$p")
    // exactly one Window, and it sits ABOVE (before, in tree print) the
    // top-k — so row_number only ever numbers the k survivors, never the
    // full bigram frame (the single-task 100 TB cliff this guards against)
    val win = p.indexOf("Window")
    assert(win >= 0 && win < takeOrdered,
      s"rank window must consume TakeOrdered's output, not the raw frame:\n$p")
    assert(p.indexOf("Window", win + 1) < 0, s"expected exactly one Window:\n$p")
  }

  // --- q120 fuzzy join --------------------------------------------------

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q120 equals the quadratic edit-distance-1 self-join exactly") {
    val names = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_name").as[(Long, String)].collect()
    val expect = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && lev(na, nb) <= 1
    } yield (ka, kb, na, nb, lev(na, nb).toLong)).toSet
    assert(expect.nonEmpty, "data must exercise distance-1 pairs")
    val got = Relational.q120FuzzyJoin(spark, sf)
      .as[(Long, Long, String, String, Long)].collect().toSet
    assert(got === expect)
  }

  test("q120 candidate join shuffles an 8-byte hash, not variant strings") {
    val p = Relational.q120FuzzyJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), s"expected hashed join key in:\n$p")
    // the candidate join keys on the bigint hash column `v` (the `L`
    // suffix IS the 8-byte claim) — whether Catalyst broadcasts it (tiny
    // sf) or shuffles it (at scale), the key through the wire is 8 bytes
    assert("Join \\[v#\\d+L\\], \\[v#\\d+L\\]".r.findFirstIn(p).isDefined,
      s"expected join keyed on the 8-byte hash in:\n$p")
  }

  test("q120 deletion-neighborhood theorem holds on adversarial shapes") {
    // substitution, insertion/deletion, equal, and a distance-2 collision
    assert(lev("abcd", "abxd") === 1) // shares deletion at position 2
    assert(lev("abcd", "abd") === 1)  // one IS the other's deletion
    assert(lev("abx", "ayb") === 2)   // both delete to "ab": candidate, filtered
    def vars(s: String): Set[String] =
      (0 to s.length).map(i => if (i == 0) s
        else s.substring(0, i - 1) + s.substring(i)).toSet
    assert((vars("abcd") & vars("abxd")).nonEmpty)
    assert((vars("abcd") & vars("abd")).nonEmpty)
    assert((vars("abx") & vars("ayb")).nonEmpty) // the FP the verify prices
  }

  // --- q121 model-based quality scoring ---------------------------------

  test("q121 scores equal the direct weight-sum; keep is score > 0") {
    val got = Corpus.q121QualityClassifier(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === docs.map(_._1).toSet)
    docs.foreach { case (id, t) =>
      val words = t.split(" ")
      val score = words.map(w => (w.length * 7) % 13 - 6).map(_.toLong).sum
      val (nTokens, gScore, keep) = got(id)
      assert(nTokens === words.length.toLong, s"doc $id n_tokens")
      assert(gScore === score, s"doc $id score")
      assert(keep === (score > 0), s"doc $id keep")
    }
    // the stand-in weights must split the corpus, not rubber-stamp it
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  // --- q122 semantic dedup ----------------------------------------------

  test("q122 equals the brute-force per-cell SemDeDup replay") {
    val threshold = 0.35
    // same seeded build the operator runs → identical cells
    val idx = graft.operators.IvfIndex.build(
      graft.sources.Tables.embeddings(spark, sf), nCells = 8)
    val cells = idx.assignments
      .select($"vec_id", $"cell", $"emb", $"norm")
      .as[(Long, Int, Seq[Double], Double)].collect()
    val byCell = cells.groupBy(_._2)
    val dup = byCell.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        a = sorted(i); b = sorted(j)
        cos = a._3.zip(b._3).map { case (x, y) => x * y }.sum / (a._4 * b._4)
        if cos >= threshold
      } yield b._1
    }.toSet
    assert(dup.nonEmpty, "data must exercise semantic duplicates")
    val got = Similarity.q122SemanticDedup(spark, sf)
      .as[(Long, Int, Boolean)].collect()
    assert(got.map(_._1).toSet === cells.map(_._1).toSet, "every vector verdicted")
    got.foreach { case (id, cell, isDup) =>
      assert(isDup === dup(id), s"vec $id dup verdict")
    }
    // id-minimal survivors: the smallest id of every cell is never dropped
    byCell.values.foreach { members =>
      val minId = members.map(_._1).min
      assert(!dup(minId), s"cell min id $minId must survive")
    }
  }

  test("q122 over-cap cells verdict NULL (unknown), never a silent false") {
    val idx = graft.operators.IvfIndex.build(
      graft.sources.Tables.embeddings(spark, sf), nCells = 8)
    val sizes = idx.assignments.groupBy($"cell").count()
      .as[(Int, Long)].collect().toMap
    // pick a cap that excludes at least one but not every cell
    val cap = sizes.values.toSeq.sorted.apply(sizes.size / 2).toInt
    val overCells = sizes.filter(_._2 > cap).keySet
    assert(overCells.nonEmpty && overCells.size < sizes.size)
    val got = Similarity.q122SemanticDedup(spark, sf, maxBlock = cap)
      .as[(Long, Int, Option[Boolean])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, cell, verdict) =>
      if (overCells(cell))
        assert(verdict.isEmpty, s"vec $id in dropped cell $cell must be unknown")
      else
        assert(verdict.isDefined, s"vec $id in kept cell $cell must be decided")
    }
  }
}
