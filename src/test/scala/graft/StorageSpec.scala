package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.{Storage, Tables}

class StorageSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without any shuffle") {
    Storage.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice"),
      "orders_b", buckets = 4, Seq("o_orderkey"))
    Storage.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "lineitem_b", buckets = 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition pruning reads only the filtered partition's files") {
    val base = java.nio.file.Files.createTempDirectory("part").toString
    Storage.writePartitioned(
      Tables.events(spark, sf).select($"event_id", $"value", $"event_type"),
      s"$base/events", Seq("event_type"))
    val clicks = spark.read.parquet(s"$base/events")
      .filter($"event_type" === "click")
    // inputFiles ignores filters; the executed plan's PartitionFilters is
    // the proof that pruning happens before I/O
    val plan = clicks.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"partition filter must reach the scan:\n$plan")
    val direct = spark.read.parquet(s"$base/events/event_type=click").count()
    assert(clicks.count() === direct)
  }
}
