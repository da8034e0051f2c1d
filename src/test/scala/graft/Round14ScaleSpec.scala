package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Round-14 scale-posture pins: Spark's runtime bloom-filter injection
  * (row-level runtime filtering) must remain AVAILABLE on graft's default
  * fact⋈filtered-dim join path — at 100 TB, a selective dimension filter
  * that does NOT reach the fact scan as a runtime filter means scanning
  * the whole fact to throw most of it away at the join. */
class Round14ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("a selective dim filter injects a bloom filter into the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // the production posture: feature on (the 4.x default), thresholds
      // at test scale (the defaults are sized for real clusters — 10 MB /
      // 10 GB — which sf-test parquet never reaches)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force the shuffle-join path: broadcast joins don't need (or get)
      // runtime bloom filters, and at fact⋈fact scale there IS no broadcast
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT") // selective dim filter
      val joined = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("long")).as("qty"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$optimized")

      // and the filter is transparent: same result as the plain plan
      val got = joined.as[(String, Long, Long)].collect().toSet
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val want = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("long")).as("qty"))
        .as[(String, Long, Long)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
