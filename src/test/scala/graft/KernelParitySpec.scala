package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextHashFunctions
import graft.operators.{Dedup, Skew}

/** Parity specs for the single-pass byte-span kernels in
  * [[graft.functions.TextHashes]]: each must be bit-identical to the
  * declarative HOF formulation in [[Dedup]] it replaced (the kernels back
  * q41/q42/q43; the HOFs remain as executable specifications). Inputs are
  * randomized and include empty strings, empty words (double spaces), and
  * multi-byte codepoints — the byte-walk's hard cases. */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(100L + i)))

  private val wordGen: Gen[String] = Gen.oneOf(
    "spark", "join", "scan", "agg", "röw", "データ", "x", "", "émb")
  private val textGen: Gen[String] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def docs(n: Int): DataFrame =
    samples(textGen, n).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("every native function is callable from SQL and agrees with its Column API") {
    GraftSession.registerFunctions(spark)
    docs(12).createOrReplaceTempView("__sqlfn_docs")
    val viaSql = spark.sql("""
      SELECT doc_id,
        word_shingle_hashes(text, 3) AS wsh,
        char_ngram_hashes(text, 4) AS cng,
        minhash_sig(word_shingle_hashes(text, 3), 8) AS sig,
        simhash64(text) AS sh,
        word_repetition_stats(text) AS wrs,
        nfc_normalize(text) AS norm,
        sorted_intersect_count(word_shingle_hashes(text, 3),
                               word_shingle_hashes(text, 3)) AS sic,
        dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        l1_distance(array(1.0d, 5.0d), array(3.0d, 4.0d)) AS l1,
        sorted_run_sumsq(array_sort(split(text, ' '))) AS srs,
        sorted_run_count(array_sort(split(text, ' '))) AS src
      FROM __sqlfn_docs""").collect()
    val viaCols = docs(12).select(
      $"doc_id",
      TextHashFunctions.wordShingleHashes($"text", 3).as("wsh"),
      TextHashFunctions.charNgramHashes($"text", 4).as("cng"),
      TextHashFunctions.minhashSig(
        TextHashFunctions.wordShingleHashes($"text", 3), 8).as("sig"),
      TextHashFunctions.simhash64($"text").as("sh"),
      TextHashFunctions.wordRepetitionStats($"text").as("wrs"),
      graft.functions.NormalizeFunctions.nfcNormalize($"text").as("norm"),
      graft.functions.GraftFunctions.sortedIntersectCount(
        TextHashFunctions.wordShingleHashes($"text", 3),
        TextHashFunctions.wordShingleHashes($"text", 3)).as("sic"),
      graft.functions.VectorFunctions.dotD(
        array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("dp"),
      graft.functions.L1Distance.ofColumns(
        array(lit(1.0), lit(5.0)), array(lit(3.0), lit(4.0))).as("l1"),
      graft.functions.SortedRuns.sortedRunSumSq(
        array_sort(split($"text", " "))).as("srs"),
      graft.functions.SortedRuns.sortedRunCount(
        array_sort(split($"text", " "))).as("src")).collect()
    assert(viaSql.map(_.toString).sorted.toSeq === viaCols.map(_.toString).sorted.toSeq)
    // kernel parameters must be plan-time literals — reject a column there
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingle_hashes(text, CAST(doc_id AS INT)) FROM __sqlfn_docs").collect()
    }
    assert(e.getMessage.contains("literal INT"))
    // wrong arity fails with the signature, not an index error
    val a = intercept[Exception] {
      spark.sql("SELECT word_shingle_hashes(text) FROM __sqlfn_docs").collect()
    }
    assert(a.getMessage.contains("expects 2 argument"))
  }

  test("charNgramHashes kernel === substring HOF formulation") {
    val t = $"text"
    val grams = transform(
      sequence(lit(1), greatest(length(t) - 2, lit(1))),
      i => t.substr(i, lit(3)))
    val hof = sort_array(array_distinct(transform(grams, g => xxhash64(g))))
    docs(40).select(
        TextHashFunctions.charNgramHashes(t, 3).as("kernel"), hof.as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
      .foreach { case (k, h) => assert(k === h) }
  }

  test("wordShingleHashes kernel === Dedup.shingles HOF") {
    docs(40).select(
        TextHashFunctions.wordShingleHashes($"text", 3).as("kernel"),
        sort_array(Dedup.shingles($"text", 3)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
      .foreach { case (k, h) => assert(k === h) }
  }

  test("minhashSig kernel === Dedup.minhashSignature HOF") {
    docs(40).select(
        TextHashFunctions.minhashSig(
          TextHashFunctions.wordShingleHashes($"text", 3), 64).as("kernel"),
        Dedup.minhashSignature(Dedup.shingles($"text", 3), 64).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
      .foreach { case (k, h) => assert(k === h) }
  }

  test("simhash64 kernel === Dedup.simhash HOF and simhashDf") {
    val d = docs(30)
    d.select(
        TextHashFunctions.simhash64($"text").as("kernel"),
        Dedup.simhash($"text").as("hof"))
      .as[(Long, Long)].collect()
      .foreach { case (k, h) => assert(k === h) }
    val viaDf = Dedup.simhashDf(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val kernel = d.select($"doc_id", TextHashFunctions.simhash64($"text"))
      .as[(Long, Long)].collect().toMap
    assert(viaDf === kernel)
  }

  test("wordRepetitionStats kernel === explode + double-groupBy formulation") {
    val d = docs(40)
    val declarative = d
      .select($"doc_id", explode(split($"text", " ", -1)).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_words"), count(lit(1)).as("n_distinct"),
        max($"cnt").as("top_cnt"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val kernel = d
      .select($"doc_id", TextHashFunctions.wordRepetitionStats($"text").as("s"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, s) => id -> (s(0), s(1), s(2)) }.toMap
    assert(kernel === declarative)
  }

  test("SortedRuns kernels === groupBy-count reference, incl. nulls/empties") {
    val rows: Seq[Seq[Option[String]]] = Seq(
      Seq(), Seq(Some("a")), Seq(Some("a"), Some("a"), Some("a")),
      Seq(Some(""), Some(""), Some("x")),
      Seq(None, None, Some("a")), Seq(Some("a"), None),
      Seq(Some("データ"), Some("データ"), Some("röw")),
      Seq(Some("a"), Some("b"), Some("b"), Some("c"), Some("c"), Some("c"))) ++
      samples(Gen.listOf(Gen.option(wordGen)), 40).map(_.toSeq)
    val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "raw")
      .withColumn("s", array_sort($"raw"))
      .withColumn("sumsq", graft.functions.SortedRuns.sortedRunSumSq($"s"))
      .withColumn("nd", graft.functions.SortedRuns.sortedRunCount($"s"))
    val got = df.select($"id", $"sumsq", $"nd")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = rows.zipWithIndex.map { case (a, i) =>
      val counts = a.groupBy(identity).values.map(_.size.toLong)
      i.toLong -> ((counts.map(c => c * c).sum, counts.size.toLong))
    }.toMap
    assert(got === want)
  }

  test("SortedRuns reject non-string-array input at analysis time") {
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "longs")
    val e = intercept[Exception] {
      df.select(graft.functions.SortedRuns.sortedRunSumSq($"longs")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"),
      s"expected an analysis-time type error, got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      df.select(graft.functions.SortedRuns.sortedRunCount($"id")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }

  test("SortedRuns agree between codegen and interpreted eval") {
    val df = docs(30).select($"doc_id", array_sort(split($"text", " ")).as("s"))
    def run(): Map[Long, (Long, Long)] =
      df.select($"doc_id",
          graft.functions.SortedRuns.sortedRunSumSq($"s"),
          graft.functions.SortedRuns.sortedRunCount($"s"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(codegen === interpreted)
    assert(codegen.nonEmpty)
  }

  test("L1Distance agrees with the HOF fold it replaces, codegen and interpreted") {
    val vecs = samples(Gen.listOfN(16, Gen.choose(-10.0, 10.0)), 20)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray, v.reverse.toArray) }
      .toDF("id", "a", "b")
    def run(): Map[Long, Double] =
      vecs.select($"id",
          graft.functions.L1Distance.ofColumns($"a", $"b").as("l1"))
        .as[(Long, Double)].collect().toMap
    val viaHof = vecs.select($"id", expr(
        "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0D, (s, v) -> s + v)")
        .as("l1")).as[(Long, Double)].collect().toMap
    val codegen = run()
    assert(codegen === viaHof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    assert(codegen === interpreted)
    assert(codegen.nonEmpty)
  }

  test("wrong-typed input to a TextHashes kernel fails at analysis time") {
    val longs = Seq(Tuple1(1L)).toDF("x")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(TextHashFunctions.simhash64($"x"))
    }
    assert(e1.getMessage.contains("DATATYPE_MISMATCH"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(TextHashFunctions.minhashSig($"x", 64))
    }
    assert(e2.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("saltedSelfPairs maxBlock excludes oversized blocks, keeps the rest") {
    val d = ((1 to 30).map(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small"))).toDF("id", "blk")
    val pairs = Skew.saltedSelfPairs(d, "blk", "id", salts = 2, maxBlock = 10)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(pairs === Set((100L, 101L)))
  }

  test("containment-bounded intersect kernel: exact at/above floor, " +
      "filter-invariant below (codegen and interpreted)") {
    // randomized sorted distinct long arrays, including empties and
    // identical / disjoint / nested (small-inside-big) shapes — nested is
    // the case the JACCARD bound would wrongly exit (containment 1.0,
    // jaccard small), so it must pass HERE with the exact count
    val setGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 60L)).map(_.distinct.sorted))
    val sets = samples(setGen, 24) ++
      Seq(Seq.empty[Long], (1L to 30L).toSeq, (1L to 6L).toSeq)
    val pairs = for (a <- sets; b <- sets) yield (a, b)
    for (floor <- Seq(0.3, 0.9)) {
      def run(codegen: String): Seq[(Long, Long, Int, Int)] = {
        spark.conf.set("spark.sql.codegen.factoryMode", codegen)
        try pairs.toDF("a", "b").select(
            graft.functions.GraftFunctions.sortedIntersectCount($"a", $"b").as("full"),
            graft.functions.GraftFunctions
              .sortedIntersectCountBoundedContain($"a", $"b", floor).as("bnd"),
            size($"a").as("na"), size($"b").as("nb"))
          .as[(Long, Long, Int, Int)].collect().toSeq
        finally spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN"); (full, bnd, na, nb) <- run(mode)) {
        val mn = math.min(na, nb)
        val passes = mn > 0 && full.toDouble / mn >= floor
        if (passes) assert(bnd === full,
          s"passing pair must get the exact count ($mode, floor=$floor)")
        else assert(bnd === full || bnd === -1L,
          s"below-floor pair must return exact or -1 ($mode, floor=$floor)")
        // filter invariance: the caller's containment >= floor decision is
        // identical under either kernel (-1/mn < 0 <= floor fails)
        val passB = mn > 0 && bnd.toDouble / mn >= floor
        assert(passB === passes, s"filter decision changed ($mode, floor=$floor)")
      }
    }
  }

  test("saltedSelfPairs === plain blocked self-join, each pair exactly once") {
    val d = (1 to 300).map(i => (i.toLong, s"blk${i % 3}", i * 2))
      .toDF("id", "blk", "v")
    val plain = d.as("a").join(d.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val salted = Skew.saltedSelfPairs(d, "blk", "id", salts = 4)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect()
    assert(salted.toSet === plain)
    assert(salted.length === plain.size, "each pair must meet exactly once")
  }
}
