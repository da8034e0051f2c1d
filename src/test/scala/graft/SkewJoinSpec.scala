package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The 100×-scale posture check sf0.1 can't give: the DEFAULT relational
  * join path (q4's orders⋈lineitem shape) under a planted hot key must get
  * AQE's skew-join mitigation — the skewed partition split into subtasks —
  * with no operator-side changes. Thresholds are tightened to make the
  * planted skew visible at test size; the detection RULE (partition >
  * factor × median and > threshold) is the same one production defaults
  * apply at 256 MB. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition on the default q4 join path") {
    val dir = Files.createTempDirectory("skew").toString
    // one orderkey at ~200× the median frequency
    spark.range(240000)
      .select(
        when($"id" < 200000, lit(0L)).otherwise($"id" % 1000L)
          .as("l_orderkey"),
        ($"id" % 100).cast("double").as("l_extendedprice"),
        (($"id" % 10) / 100.0).as("l_discount"))
      .write.parquet(s"$dir/lineitem.parquet")
    spark.range(1000)
      .select($"id".as("o_orderkey"),
        concat(lit("P"), ($"id" % 5).cast("string")).as("o_orderpriority"))
      .write.parquet(s"$dir/orders.parquet")

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val df = Relational.q4JoinAgg(spark, dir)
      val rows = df.collect()
      assert(rows.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join mitigation did not fire:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
