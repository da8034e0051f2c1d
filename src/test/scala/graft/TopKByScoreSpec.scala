package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore
import graft.operators.{IvfIndex, Similarity}

/** Contract of the bounded top-k heap aggregate that replaced the
  * row_number-window idiom on every pair-stream ranking path (brute-force
  * kNN, IVF probe scan, LSH, PQ/ADC, hard negatives): bit-identical rows
  * to the window form including ranks and ties, no pair-stream sort in
  * the plan, and the candidate-uniqueness argument that let
  * allVectorsTopK drop its pair-dedup shuffle. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random pair stream with DELIBERATE exact score
    * ties (scores quantized to a small grid) so the (score DESC, id ASC)
    * tie-break is actually exercised, plus queries sparse and dense
    * relative to k. */
  private def pairs(nQ: Int, nN: Int, grid: Int) = {
    val rows = for {
      q <- 0 until nQ
      n <- 0 until nN
      // drop a varying suffix per query so some queries have < k pairs
      if n < nN - (q % nN)
    } yield {
      val h = ((q * 2654435761L + n * 40503L) % 1000003L + 1000003L) % 1000003L
      (q.toLong, n.toLong, (h % grid).toDouble / grid)
    }
    rows.toDF("query_id", "neighbor_id", "score")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"neighbor_id".asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"score")
  }

  test("aggregate equals the row_number window bit-for-bit, ties included") {
    // 97 queries spans many hash buckets; grid=7 forces heavy score ties;
    // the (q % nN) dropout leaves some queries with fewer than k pairs
    val df = pairs(nQ = 97, nN = 50, grid = 7)
    val got = TopKByScore.topK(df, $"query_id", $"neighbor_id", $"score", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = windowTopK(df, 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // under-k queries kept every pair they had
    val gotCounts = got.groupBy(_._1).view.mapValues(_.size).toMap
    val haveCounts = df.groupBy($"query_id").count()
      .as[(Long, Long)].collect().toMap
    haveCounts.filter(_._2 < 5).foreach { case (q, c) =>
      assert(gotCounts(q).toLong === c, s"query $q should keep all $c pairs")
    }
  }

  test("special doubles rank like the window: NaN greatest, -0.0 below 0.0") {
    val df = Seq(
      (1L, 10L, Double.NaN),
      (1L, 11L, Double.PositiveInfinity),
      (1L, 12L, 0.0),
      (1L, 13L, -0.0),
      (1L, 14L, Double.NegativeInfinity),
      (1L, 15L, Double.NaN) // NaN tie → id order
    ).toDF("query_id", "neighbor_id", "score")
    val got = TopKByScore.topK(df, $"query_id", $"neighbor_id", $"score", 4)
      .orderBy($"rank").as[(Long, Long, Long, Double)].collect()
    val want = windowTopK(df, 4)
      .orderBy($"rank").as[(Long, Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ===
      want.map(r => (r._1, r._2, r._3)).toSeq)
    // NaNs first (ids 10, 15), then +Inf, then 0.0 before -0.0
    assert(got.map(_._3).toSeq === Seq(10L, 15L, 11L, 12L))
  }

  test("the brute-force plan has no window and no sort on the pair stream") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = Similarity.bruteForceTopK(e, e, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit"),
      s"pair-stream window survived:\n$plan")
    assert(!plan.contains("Window "), s"pair-stream window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"heap aggregate missing (sort-fallback or planning change?):\n$plan")
    // the only sort allowed is none at all: ranking is heap-side
    assert(!plan.contains("Sort "), s"pair-stream sort survived:\n$plan")
  }

  test("partial aggregation runs map-side before the bucket exchange") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.bruteForceTopK(e, e, k = 5)
      .queryExecution.executedPlan.toString
    // two ObjectHashAggregate nodes (partial + final) around one exchange:
    // the pair stream reduces to ≤ k·|queries| entries per partition
    // BEFORE shuffling — the map-side-combine shape the kernel exists for
    assert("ObjectHashAggregate".r.findAllIn(plan).length === 2,
      s"expected partial+final heap aggregate:\n$plan")
  }

  test("allVectorsTopK candidates are pair-unique (the dropped dedup is safe)") {
    // one cell per corpus vector + distinct (query, cell) probes ⇒ a
    // (query, neighbor) pair meets in at most one probed cell — the
    // invariant that let the pair-keyed first-score groupBy go away
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val built = IvfIndex.build(e, nCells = 4)
    assert(built.assignments.groupBy($"vec_id").count()
      .filter($"count" > 1).isEmpty, "an assignment row per vector")
    val topk = Similarity.q106KnnGraph(spark, sf, k = 3, nCells = 4, nProbe = 4)
    val dupPairs = topk.groupBy($"query_id", $"neighbor_id").count()
      .filter($"count" > 1)
    assert(dupPairs.isEmpty, "a ranked pair emitted twice")
  }

  test("full-probe IVF ranking equals brute force (dedup-free path, ranks too)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val nCells = 4
    val graph = Similarity.q106KnnGraph(spark, sf, k = 3,
      nCells = nCells, nProbe = nCells)
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, e, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(graph === brute)
    assert(graph.nonEmpty)
  }

  test("a query batch outgrowing the final-merge parallelism signals loudly") {
    // the final merge holds ~|queries|/B heaps in ONE task (B is capped
    // below the ObjectHashAggregate fallback threshold): plant a wide
    // query set against a lowered bound and witness the guard fire —
    // then confirm the result itself is still exact (the guard warns, it
    // never truncates)
    val df = pairs(nQ = 400, nN = 8, grid = 7)
    TopKByScore.guardSignals.set(0)
    spark.conf.set(TopKByScore.GuardConfKey, "3")
    try {
      val got = TopKByScore.topK(df, $"query_id", $"neighbor_id", $"score", 3)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(TopKByScore.guardSignals.get() > 0,
        "wide query batch must trip the per-bucket heap-count guard")
      val want = windowTopK(df, 3)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === want, "the guard must not change results")
    } finally spark.conf.unset(TopKByScore.GuardConfKey)
    // at the DEFAULT bound the same batch is silent
    TopKByScore.guardSignals.set(0)
    TopKByScore.topK(df, $"query_id", $"neighbor_id", $"score", 3).count()
    assert(TopKByScore.guardSignals.get() === 0,
      "default guard bound must not fire on a small batch")
  }
}
