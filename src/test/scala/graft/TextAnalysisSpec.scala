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
