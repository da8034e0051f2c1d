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

  test("the price index broadcasts its bounded frames, never the fact") {
    val p = plan(Relational.q319PriceIndex(spark, sf))
    // base month (1 row) and base basket (≤|parts|) ride broadcasts
    assert(p.contains("BroadcastExchange"),
      "bounded base frames should broadcast")
    // the lineitem fact side must NOT appear under a BroadcastExchange:
    // indent-parse the tree — no parquet lineitem scan may have a
    // broadcast ancestor
    val lines = p.linesIterator.toSeq
    def indent(l: String): Int = l.takeWhile(c => !c.isLetter).length
    lines.zipWithIndex.filter { case (l, _) =>
      l.contains("Scan parquet") && l.contains("lineitem") }.foreach {
      case (scanLine, i) =>
        val si = indent(scanLine)
        val broadcastAncestor = (0 until i).reverse
          .map(lines)
          .filter(l => indent(l) < si)
          .exists(_.contains("BroadcastExchange"))
        assert(!broadcastAncestor, "lineitem fact under a BroadcastExchange")
    }
  }

  test("survival's factor list rides one broadcast onto the event frame") {
    val p = plan(Relational.q313Survival(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the ordered factor array should broadcast, not shuffle")
  }
}
