package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "the quick brown fox jumps over the lazy cat and runs far away home"), // near-dup of 0
    (2L, "spark shuffles partitions across the cluster with hash exchanges"),
    (3L, "completely different words about databases and storage engines here"))
    .toDF("doc_id", "text")

  test("minhash LSH surfaces the planted near-duplicate pair") {
    val withSig = docs
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignature($"sh", 64))
    val cands = Dedup.lshCandidates(withSig, "doc_id", "sig", bands = 16)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L)), s"expected (0,1) in $cands")

    val verified = cands.map { case (a, b) =>
      val j = withSig.as("x").join(withSig.as("y"),
          col("x.doc_id") === a && col("y.doc_id") === b)
        .select(Dedup.jaccard(col("x.sh"), col("y.sh"))).as[Double].head()
      ((a, b), j)
    }.toMap
    assert(verified((0L, 1L)) > 0.5)
  }

  test("lshCandidates bucket cap drops only oversized buckets, with no Window") {
    // 12 docs share one signature (every band collides → one 12-doc bucket);
    // docs 100/101 share a different signature (a healthy 2-doc bucket).
    val sigA = (1L to 64L).toArray
    val sigB = (101L to 164L).toArray
    val rows = (0L until 12L).map(id => (id, sigA)) ++
      Seq((100L, sigB), (101L, sigB))
    val d = rows.toDF("doc_id", "sig")

    val uncapped = Dedup.lshCandidates(d, "doc_id", "sig", bands = 16)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size === 66 + 1) // C(12,2) + the (100,101) pair

    val capped = Dedup.lshCandidates(d, "doc_id", "sig", bands = 16, maxBucket = 10)
    assert(capped.as[(Long, Long)].collect().toSet === Set((100L, 101L)))
    // The cap must be a broadcast anti-join, not a count-window that routes
    // the whole hot bucket through one reducer's sort.
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"count-window cap regressed:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join cap in:\n$plan")
  }

  test("simhash: near-dups are hamming-close, unrelated docs are not") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(3L)))
    assert(hamming(sh(0L), sh(1L)) <= 8)
  }

  test("simhashDf (exploded aggregate form) equals the Column simhash") {
    val viaColumn = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    val viaDf = Dedup.simhashDf(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaDf === viaColumn)
  }

  test("incremental dedup: keep = unseen content, first occurrence in batch") {
    val out = Dedup.q73IncrementalDedup(spark, sf, mod = 5).collect()
    assert(out.nonEmpty)
    // independent recompute from the raw table
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", md5($"text").as("h")).as[(Long, String)].collect()
    val existing = docs.filter(_._1 % 5 != 0).map(_._2).toSet
    val batch = docs.filter(_._1 % 5 == 0).sortBy(_._1)
    assert(out.length === batch.length, "one verdict per batch doc")
    val firstSeen = scala.collection.mutable.Set.empty[String]
    val expected = batch.map { case (id, h) =>
      val isNew = !existing.contains(h)
      val first = firstSeen.add(h)
      id -> ((h, isNew, isNew && first))
    }.toMap
    out.foreach { r =>
      val (h, isNew, keep) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("h") === h)
      assert(r.getAs[Boolean]("is_new") === isNew)
      assert(r.getAs[Boolean]("keep") === keep)
    }
  }

  test("containment surfaces a doc embedded in a larger one that Jaccard misses") {
    val small = "the quick brown fox jumps over the lazy dog"
    val big = small + " and then a very long unrelated continuation follows " +
      "with many additional words padding the larger document body out " +
      "until the small one is only a modest fraction of the whole text"
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    Seq((1L, small, "en", "srcX", small.length.toLong),
        (2L, big, "en", "srcX", big.length.toLong),
        (3L, "entirely disjoint content lives here", "en", "srcX", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.q81Containment(spark, dir, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // independent containment over char-3-gram sets
    def grams(t: String) = t.sliding(3).toSet
    val expected = grams(small).intersect(grams(big)).size.toDouble /
      math.min(grams(small).size, grams(big).size).toDouble
    assert(math.abs(pairs.head._3 - expected) < 1e-12)
    // and the same pair is invisible to q43's Jaccard at its own threshold:
    // containment ~1 but |A∩B|/|A∪B| is small for a 4x size mismatch
    val jac = grams(small).intersect(grams(big)).size.toDouble /
      grams(small).union(grams(big)).size.toDouble
    assert(jac < 0.5 && pairs.head._3 > 0.9)
  }

  test("jaccard of identical shingle sets is 1.0") {
    val j = docs.filter($"doc_id" === 0)
      .select(Dedup.jaccard(Dedup.shingles($"text", 3), Dedup.shingles($"text", 3)))
      .as[Double].head()
    assert(j === 1.0)
  }

  test("rolling min-hash fingerprint is deterministic and content-sensitive") {
    val fp = docs.select($"doc_id", TextAnalysis.rollingMinHash($"text", 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    val fp2 = docs.select($"doc_id", TextAnalysis.rollingMinHash($"text", 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp === fp2)
    assert(fp(2L) !== fp(3L))
  }

  test("wordHits counts non-overlapping whole words") {
    val hits = Seq(("x", "a the the b")).toDF("id", "text")
      .select(TextAnalysis.wordHits($"text", "the")).as[Long].head()
    // ' the the ' → the second occurrence's leading space is consumed: 1 hit
    // (same left-to-right non-overlap semantics as the DuckDB oracle)
    assert(hits === 1L)
  }
}
