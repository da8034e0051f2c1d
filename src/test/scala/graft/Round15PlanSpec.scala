package graft

import graft.operators.Relational

/** Plan-shape pins for the round-15 skew cures: the r14 verdict's two
  * scale-exposed per-group rank sorts (q293/q310) now ride
  * [[graft.operators.Rank.groupRowNumberAndTotal]]'s range exchange —
  * these pins fail if a refactor reintroduces a window partitioned by
  * the handful-sized group column alone (5 segments / few event types ⇒
  * entity-sized single-task sorts at 100 TB). */
class Round15PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Every window in the plan must be partitioned by the range-exchange
    * __pid (group-scoped rank device) — a window keyed on the group
    * column alone is the cliff. */
  private def assertNoGroupOnlyWindow(p: String, q: String): Unit = {
    val bad = p.linesIterator.filter(_.contains("Window ["))
      .filterNot(_.contains("windowspecdefinition(__pid"))
      .toSeq
    assert(bad.isEmpty,
      s"$q has a window not scoped by the range exchange:\n${bad.mkString("\n")}")
  }

  test("q293's per-segment quartile rank rides the range exchange") {
    val p = plan(Relational.q293SegmentQuartiles(spark, sf))
    assertNoGroupOnlyWindow(p, "q293")
    // the window's own shuffle is keyed on the range-exchange __pid (the
    // upstream rangepartitioning itself lives behind the materialized
    // ExistingRDD, invisible here), so each task sorts ONE contiguous
    // range chunk of a segment — never the whole segment
    assert(p.contains("hashpartitioning(__pid"),
      s"q293's window no longer partitions by the range-exchange pid:\n$p")
    assert(!p.contains("SinglePartition"),
      s"q293 has a single-partition stage:\n$p")
  }

  test("q310's per-type quantile rank rides the range exchange") {
    val p = plan(Relational.q310ValueQuantiles(spark, sf))
    assertNoGroupOnlyWindow(p, "q310")
    assert(p.contains("hashpartitioning(__pid"),
      s"q310's window no longer partitions by the range-exchange pid:\n$p")
    assert(!p.contains("SinglePartition"),
      s"q310 has a single-partition stage:\n$p")
  }

  test("the offset/total side tables attach as broadcasts, not shuffles") {
    // the per-(partition, group) offset and per-group total frames are
    // metadata-sized; they must broadcast onto the ranged frame
    val p = plan(Relational.q293SegmentQuartiles(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"q293 offset/total joins no longer broadcast:\n$p")
  }

  test("the wider cliff class stays cured: q268/q77/q165 ranks, q71 prefix sum") {
    // the same handful-of-groups shapes found by the r15 sweep — each
    // must rank/fold through the __pid-scoped device, never a window
    // keyed on the low-cardinality group alone
    val cases = Seq(
      ("q268", graft.operators.Similarity.q268DimClipBounds(spark, sf),
        "windowspecdefinition(dim#"),
      ("q77", graft.operators.Corpus.q77LengthTrim(spark, sf),
        "windowspecdefinition(lang#"),
      ("q165", graft.operators.Corpus.q165BudgetAllocation(spark, sf),
        "windowspecdefinition(source#"),
      ("q71", graft.operators.Corpus.q71PackChunks(spark, sf),
        "windowspecdefinition(source#"))
    for ((name, df, badWindow) <- cases) {
      val p = plan(df)
      assert(!p.contains(badWindow),
        s"$name regressed to a group-only window ($badWindow):\n$p")
      assert(p.contains("hashpartitioning(__pid"),
        s"$name lost the range-exchange pid window:\n$p")
    }
  }
}
