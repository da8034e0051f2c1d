package graft

import graft.operators.Relational

/** Plan-shape pins for the round-14 heavy queries — the properties their
  * scaladocs claim, asserted so a refactor can't silently regress them. */
class Round14PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("theil-sen's global median rank never runs an unpartitioned window") {
    // ~3M pair slopes: the rank must ride Rank's range exchange
    // (partition-local row_number + offset), not one global sort task
    val p = plan(Relational.q318TheilSen(spark, sf))
    val globalWindows = p.linesIterator.filter(_.contains("Window ["))
      .filterNot(_.contains("windowspecdefinition(__pid"))
      .toSeq
    assert(globalWindows.isEmpty,
      s"unpartitioned/global window in theil-sen plan:\n${globalWindows.mkString("\n")}")
  }

  test("mann-kendall's quadratic pair join runs on the daily aggregate") {
    // the O(n²) join must read the TRUNCATED daily frame (an RDD scan),
    // not re-run the orders rollup per side — and never scan the fact
    // parquet more than once overall
    val p = plan(Relational.q317MannKendall(spark, sf))
    val parquetScans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("orders"))
    assert(parquetScans <= 1,
      s"orders fact scanned $parquetScans times — daily frame not shared")
  }

  test("the price index aggregates the lineitem fact exactly once") {
    // the (part, month) rollup is truncated and feeds both the probe side
    // and the base-basket broadcast — a refactor that splits it back into
    // two branches would show a second parquet scan here (the truncated
    // path itself shows ZERO parquet scans; <=1 pins both states)
    val p = plan(Relational.q319PriceIndex(spark, sf))
    val scans = p.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans <= 1, s"lineitem fact scanned $scans times")
    // and the bounded base frames ride broadcasts
    assert(p.contains("BroadcastExchange"),
      "bounded base frames should broadcast")
  }

  test("survival's factor array attaches as a broadcast nested-loop cross") {
    // the 1-row ordered-factor array must CROSS onto the event frame via
    // a broadcast nested loop — a CartesianProduct (no broadcast) or a
    // shuffle join on a synthetic key would both be regressions
    val p = plan(Relational.q313Survival(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"factor array no longer broadcast-crossed:\n$p")
    assert(!p.contains("CartesianProduct"),
      "factor array fell back to a CartesianProduct")
  }
}
