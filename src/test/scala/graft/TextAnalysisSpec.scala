package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Semantics of the curation operators the driver oracles can't exercise
  * deeply: PII redaction on planted PII, repetition-filter flag behavior,
  * stratified-sample coverage invariants. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs planted emails, phones, and digit runs") {
    val rows = Seq(
      (1L, "contact alice.smith+spam@example.co.uk for details"),
      (2L, "call +1 (415) 555-0199 or 415-555-0100 now"),
      (3L, "order 1234 shipped 2024 units 99"),
      (4L, "no sensitive content here"))
      .toDF("id", "text")
    val got = rows.select($"id", TextAnalysis.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "contact <EMAIL> for details")
    assert(got(2L) === "call <PHONE> or <PHONE> now")
    assert(got(3L) === "order <NUM> shipped <NUM> units <NUM>")
    assert(got(4L) === "no sensitive content here")
    // nothing PII-shaped survives in any output
    got.values.foreach { r =>
      assert(!r.exists(_.isDigit), s"digit survived redaction: $r")
      assert(!r.contains("@"), s"email survived redaction: $r")
    }
  }

  test("repetition filter drops a degenerate repeated document") {
    // piggyback on the operator's column logic via a local frame with the
    // same kernel + thresholds the operator applies
    val d = Seq(
      (1L, Array.fill(50)("spam").mkString(" ")), // one word repeated
      (2L, (1 to 50).map(i => s"w$i").mkString(" "))) // all distinct
      .toDF("doc_id", "text")
    val stats = graft.functions.TextHashFunctions.wordRepetitionStats($"text")
    val got = d.select($"doc_id",
        (element_at(stats, 3).cast("double") / element_at(stats, 1)).as("top_frac"),
        (element_at(stats, 2).cast("double") / element_at(stats, 1)).as("dr"))
      .withColumn("keep", $"top_frac" <= 0.1 && $"dr" >= 0.4)
      .as[(Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 === false && got(1L)._2 === 1.0)
    assert(got(2L)._4 === true && got(2L)._3 === 1.0)
  }

  test("repetition filter plans as one map-only codegen span, no shuffle") {
    val p = TextAnalysis.q64RepetitionFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"q64 must not shuffle:\n$p")
    assert(p.contains("word_repetition_stats"), "must use the native kernel")
  }

  test("PII redaction scan reads only the needed columns") {
    val p = TextAnalysis.q65PiiRedact(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"q65 must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<event_id:bigint,props:string>"),
      s"q65 must prune the events scan to event_id+props:\n$p")
  }

  test("nfc normalization unifies decomposed forms; ASCII passes untouched") {
    import graft.functions.NormalizeFunctions.nfcNormalize
    val rows = Seq(
      (1L, "café"), // e + combining acute → é
      (2L, "café"), // already composed
      (3L, "plain ascii text"))
      .toDF("id", "text")
    val got = rows.select($"id", nfcNormalize($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "café", "decomposed must compose under NFC")
    assert(got(2L) === "café")
    assert(got(3L) === "plain ascii text")
    // kernel-level fast path: ASCII returns the same object, zero alloc
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("abc")
    assert(graft.functions.Normalize.nfc(s) eq s)
  }

  test("q70 normalization collapses controls/spaces and is idempotent") {
    val raw = Seq(
      (1L, "  Mixed\tCase\u0007 text   with runs  "),
      (2L, "already clean"))
      .toDF("doc_id", "text")
    // same pipeline as q70Normalize, applied to a planted frame
    import graft.functions.NormalizeFunctions.nfcNormalize
    def norm(c: org.apache.spark.sql.Column) =
      lower(trim(regexp_replace(
        regexp_replace(nfcNormalize(c), "[\\x00-\\x1F\\x7F]", ""), " +", " ")))
    val got = raw.select($"doc_id", norm($"text").as("n"))
      .as[(Long, String)].collect().toMap
    // tab is a control char → stripped (not replaced); space runs collapse
    assert(got(1L) === "mixedcase text with runs")
    assert(got(2L) === "already clean")
    // idempotence: normalizing the normalized output changes nothing
    val again = raw.select(norm(norm($"text")).as("n2"), norm($"text").as("n1"))
      .filter($"n2" =!= $"n1").count()
    assert(again === 0)
  }

  test("tfidf: rk bounded, scores descend per doc, formula matches recompute") {
    val rows = TextAnalysis.q72Tfidf(spark, sf, k = 5).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
          assert(sa > sb || (sa == sb &&
            a.getAs[String]("word") < b.getAs[String]("word")))
        case _ =>
      }
    }
    // formula: score = tf * sqrt(N / df), N = total docs
    val n = graft.sources.Tables.documents(spark, sf).count().toDouble
    rows.take(20).foreach { r =>
      val expect = r.getAs[Long]("tf").toDouble *
        math.sqrt(n / r.getAs[Long]("df").toDouble)
      assert(r.getAs[Double]("score") === expect)
    }
  }

  test("stratified sample covers every source at the expected rate") {
    val sample = TextAnalysis.q66StratifiedSample(spark, sf, stride = 7)
    val perSource = sample.groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(perSource.keySet === totals.keySet, "every stratum must be sampled")
    totals.foreach { case (src, n) =>
      assert(perSource(src) === (n + 6) / 7, s"wrong rate for $src")
    }
    // deterministic: same rows on a re-run
    val again = TextAnalysis.q66StratifiedSample(spark, sf, stride = 7)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(again === sample.select($"doc_id").as[Long].collect().sorted.toSeq)
  }
}
