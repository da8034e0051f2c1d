package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot/norm built from higher-order functions are exact") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val (d, n, cos) = df.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.l2Norm($"c"),
      VectorFunctions.cosine($"a", $"a")).as[(Double, Double, Double)].head()
    assert(d === 0.0)
    assert(n === 5.0)
    assert(cos === 1.0)
  }

  test("brute-force top-k returns the known nearest neighbor first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toMap
    assert(top(1L) === 1L, "vector 1 must rank first")
  }

  test("LSH ANN: every query gets neighbors and scores are bounded by brute force") {
    val brute = Similarity.q45AnnBruteforce(spark, sf, k = 1)
      .select($"query_id", $"score").as[(Long, Double)].collect().toMap
    val lsh = Similarity.q46AnnLsh(spark, sf, k = 10, nPlanes = 4)
      .select($"query_id", $"score").as[(Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH should return candidates at 4 planes / 16 buckets")
    lsh.foreach { case (q, s) =>
      assert(s <= brute(q) + 1e-12, s"LSH score can never beat the exact top-1")
    }
  }

  test("multi-probe LSH recall dominates exact-bucket and clears a floor") {
    def recall(lsh: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.q45AnnBruteforce(spark, sf, k = 10)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = lsh.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.keys.toSeq.map(q =>
        got.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size.toDouble / brute(q).size)
      rs.sum / rs.size
    }
    // 4 planes / 16 buckets: the regime where buckets hold enough of this
    // small corpus for recall to be meaningful (8+ planes on ~600 rows
    // leaves ~2 rows/bucket — recall is about corpus size, not the probe)
    val exact = recall(Similarity.q46AnnLsh(spark, sf, k = 10, nPlanes = 4, multiProbe = false))
    val multi = recall(Similarity.q46AnnLsh(spark, sf, k = 10, nPlanes = 4, multiProbe = true))
    assert(multi >= exact,
      s"probing 1-bit-flip buckets can only add candidates ($multi vs $exact)")
    assert(multi >= 0.3, s"multi-probe at 4 planes should clear a recall floor (got $multi, exact-bucket $exact)")
  }

  test("IVF ANN recall against the brute-force baseline") {
    val brute = Similarity.q45AnnBruteforce(spark, sf, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.q51AnnIvf(spark, sf, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.4,
      s"IVF nProbe=4/16 should recover a good share of true top-10 (got $meanRecall)")
  }

  test("quantize8 handles zero vectors and round-trips signs exactly") {
    val v = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),            // zero vector: scale guard
      (2L, Array(1.0f, -1.0f, 0.5f)),
      (3L, Array(-127.0f, 127.0f, 63.5f)))
      .toDF("id", "embedding")
    val got = v.select($"id",
        VectorFunctions.dequantize8(VectorFunctions.quantize8($"embedding")).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) === Seq(0.0, 0.0, 0.0))
    // max-abs symmetric: extremes reconstruct to ±max within fp32 scale
    // rounding; the midpoint stays within the scale/2 quantization bound
    def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol
    assert(close(got(2L)(0), 1.0, 1e-6) && close(got(2L)(1), -1.0, 1e-6))
    assert(close(got(2L)(2), 0.5, (1.0 / 127) / 2 + 1e-6))
    assert(close(got(3L)(0), -127.0, 1e-4) && close(got(3L)(1), 127.0, 1e-4))
  }

  test("int8 quantization bounds element error and keeps brute-force top-k") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    // reconstruction error ≤ scale/2 per element (symmetric max-abs int8)
    val bad = e.select(
        VectorFunctions.quantize8($"embedding").as("qv"), $"embedding")
      .select(aggregate(
        zip_with(VectorFunctions.dequantize8($"qv"),
          VectorFunctions.toDoubles($"embedding"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"),
        ($"qv.scale" / 2.0 + 1e-9).as("bound"))
      .filter($"maxerr" > $"bound").count()
    assert(bad === 0L, "per-element reconstruction error must stay <= scale/2")
    // top-k over the quantized corpus tracks the full-precision baseline
    val exact = Similarity.q45AnnBruteforce(spark, sf, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.q67QuantizedAnn(spark, sf, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet === exact.keySet)
    val overlaps = exact.keys.toSeq.map(q =>
      quant(q).intersect(exact(q)).size.toDouble / exact(q).size)
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.8, s"int8 noise should barely move top-10 (got $mean)")
  }

  test("IVF quantizer fit on a bounded sample keeps recall") {
    import graft.operators.IvfIndex
    val e = graft.sources.Tables.embeddings(spark, sf)
    // force the sampled path: 500-row corpus, 150-point training budget
    val sampled = IvfIndex.build(e, nCells = 8, fitSampleSize = 150)
    assert(sampled.centroids.count() === 8)
    // every corpus row still lands in a cell and cells are non-degenerate
    val cells = sampled.assignments.groupBy($"cell").count()
      .as[(Int, Long)].collect().toMap
    assert(cells.values.sum === e.count())
    assert(cells.size >= 4, s"sampled fit collapsed the cells: $cells")
    val queries = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"),
        VectorFunctions.toDoubles($"embedding").as("q_emb"),
        VectorFunctions.l2Norm($"embedding").as("q_norm"))
    val brute = Similarity.q45AnnBruteforce(spark, sf, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = IvfIndex.query(sampled, queries, k = 10, nProbe = 3, excludeSelf = true)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = got.keys.toSeq.filter(brute.contains).map { q =>
      got(q).intersect(brute(q)).size.toDouble / brute(q).size
    }
    assert(recalls.nonEmpty)
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.3,
      s"sample-fit quantizer should keep IVF recall (got $meanRecall)")
  }

  test("IVF save/load roundtrip: a loaded index answers identically") {
    import graft.operators.IvfIndex
    val e = graft.sources.Tables.embeddings(spark, sf)
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"),
        VectorFunctions.toDoubles($"embedding").as("q_emb"),
        VectorFunctions.l2Norm($"embedding").as("q_norm"))
    val built = IvfIndex.build(e, nCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)
    val a = IvfIndex.query(built, queries, k = 10, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = IvfIndex.query(loaded, queries, k = 10, nProbe = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("native dot_product is bit-identical to the HOF composition") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", VectorFunctions.toDoubles($"embedding").as("d"))
    val both = e.select(
      graft.functions.DotProduct.ofColumns($"d", $"d").as("native"),
      aggregate(zip_with($"d", $"d", _ * _), lit(0.0), _ + _).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n === h) }
  }

  test("hyperplane bucket is deterministic") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(20)
    val b1 = e.select($"vec_id", Similarity.bucketExpr($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toSet
    val b2 = e.select($"vec_id", Similarity.bucketExpr($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toSet
    assert(b1 === b2)
  }

  test("kNN graph: well-formed per-node lists, no self edges, IVF recall") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val n = e.count()
    val k = 5
    val got = Similarity.q106KnnGraph(spark, sf, k = k)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.size === n, "every vector gets a neighbor list")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length), s"ranks at $q")
      assert(rows.length <= k)
      assert(!rows.exists(_._3 == q), s"self edge at $q")
      assert(rows.map(_._3).distinct.length === rows.length,
        s"multi-cell candidate duplicated at $q")
    }
    // recall vs exact top-k over ALL vectors as queries (brute force via
    // the broadcast path — fine at spec scale)
    val brute = Similarity.bruteForceTopK(e, e, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.keys.toSeq.map(q =>
      gotSets.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size.toDouble / brute(q).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4,
      s"nProbe=4/16 graph recall should match q51's lookup regime (got $mean)")
  }

  // --- PQ ANN (C59) -----------------------------------------------------

  test("PQ codes are fixed-width and in codeword range for every vector") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val idx = operators.PqIndex.build(e, dim = 64, m = 8, k = 16)
    val codes = idx.codes.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect()
    assert(codes.length.toLong === e.count())
    codes.foreach { case (id, cs) =>
      assert(cs.length === 8, s"vec $id code width")
      assert(cs.forall(c => c >= 0 && c < 16), s"vec $id codes $cs")
    }
    assert(idx.codebooks.length === 8)
    assert(idx.codebooks.forall(b => b.length === 16 && b.forall(_.length === 8)))
  }

  test("ADC scores replay exactly from the codebooks and codes") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val idx = operators.PqIndex.build(e, dim = 64, m = 8, k = 16)
    val queries = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"),
        graft.functions.VectorFunctions.toDoubles($"embedding").as("q_emb"),
        graft.functions.VectorFunctions.l2Norm($"embedding").as("q_norm"))
    val got = operators.PqIndex.query(idx, queries, topK = 5, excludeSelf = true)
      .select($"query_id", $"neighbor_id", $"score_pq")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val codes = idx.codes.select($"vec_id", $"codes", $"norm")
      .as[(Long, Seq[Int], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val qs = queries.select($"query_id", $"q_emb", $"q_norm")
      .as[(Long, Seq[Double], Double)].collect()
    val cb = idx.codebooks
    got.foreach { case ((qid, nid), score) =>
      val (q, qn) = qs.find(_._1 == qid).map(t => (t._2, t._3)).get
      val (cs, nn) = codes(nid)
      // replay the plan's fold order exactly: lut then Σ lut[mm][code]
      val lut = (0 until 8).map(mm => (0 until 16).map(j =>
        (0 until 8).foldLeft(0.0)((s, d) => s + q(mm * 8 + d) * cb(mm)(j)(d))))
      val adc = (0 until 8).foldLeft(0.0)((s, mm) => s + lut(mm)(cs(mm)))
      assert(score === adc / (qn * nn), s"query $qid neighbor $nid")
    }
    assert(got.nonEmpty)
  }

  test("PQ build refuses a corpus smaller than k (ragged-codebook guard)") {
    val tiny = graft.sources.Tables.embeddings(spark, sf).filter($"vec_id" < 10)
    val e = intercept[IllegalArgumentException] {
      operators.PqIndex.build(tiny, dim = 64, m = 8, k = 16)
    }
    assert(e.getMessage.contains("at least k=16"))
  }

  test("PQ save/load round-trips: loaded index answers identically") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val idx = operators.PqIndex.build(e, dim = 64, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq-idx").toString
    operators.PqIndex.save(idx, dir)
    val loaded = operators.PqIndex.load(spark, dir)
    assert(loaded.codebooks === idx.codebooks)
    assert((loaded.m, loaded.k, loaded.ds) === ((idx.m, idx.k, idx.ds)))
    val queries = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"),
        graft.functions.VectorFunctions.toDoubles($"embedding").as("q_emb"),
        graft.functions.VectorFunctions.l2Norm($"embedding").as("q_norm"))
    def answers(i: operators.PqIndex) =
      operators.PqIndex.query(i, queries, topK = 5, excludeSelf = true)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(answers(loaded) === answers(idx))
  }

  test("PQ ingestBatch appends frozen-codebook codes a loaded index serves") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val old = e.filter($"vec_id" % 2 === 0)
    val fresh = e.filter($"vec_id" % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("pq-ingest").toString
    operators.PqIndex.save(operators.PqIndex.build(old, dim = 64), dir)
    operators.PqIndex.ingestBatch(spark, dir, fresh)
    val after = operators.PqIndex.load(spark, dir)
    assert(after.codes.count() === e.count(),
      "ingest must append, not replace")
    // batch rows encode EXACTLY as the frozen codebooks dictate: re-encode
    // one fresh vector against the loaded codebooks and compare
    val ids = fresh.select($"vec_id").as[Long].collect().toSet
    val gotCodes = after.codes.filter($"vec_id".isin(ids.toSeq: _*))
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val embs = fresh
      .select($"vec_id",
        graft.functions.VectorFunctions.toDoubles($"embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    gotCodes.foreach { case (id, cs) =>
      val v = embs(id)
      val expect = (0 until after.m).map { mm =>
        (0 until after.k).minBy { j =>
          (0 until after.ds).map { d =>
            val diff = v(mm * after.ds + d) - after.codebooks(mm)(j)(d)
            diff * diff
          }.sum
        }
      }
      assert(cs === expect, s"vec $id")
    }
  }

  test("PQ rerank recall dominates pure ADC and clears a floor") {
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.q45AnnBruteforce(spark, sf, k = 10)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = df.select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.keys.toSeq.map(q =>
        got.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size.toDouble
          / brute(q).size)
      rs.sum / rs.size
    }
    val pure = recall(Similarity.q146PqAnn(spark, sf, rerank = 0))
    val reranked = recall(Similarity.q146PqAnn(spark, sf))
    assert(reranked >= pure,
      s"exact rescoring a superset shortlist cannot lose recall " +
        s"($reranked vs $pure)")
    assert(reranked >= 0.5,
      s"m=8/k=16 with 4x rerank should clear a recall floor (got $reranked)")
  }
}
