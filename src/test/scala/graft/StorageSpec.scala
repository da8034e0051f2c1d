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

  test("z-ordered layout keeps per-file ranges tight in BOTH dimensions") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // a full 256×256 grid: both dimensions carry equal information — the
    // regime z-order exists for (a heavily skewed bit-width degenerates to
    // a major-minor sort, as the wide dimension owns the high bits)
    val df = spark.range(0, 65536).select(
      (col("id") % 256).as("a"), expr("id div 256").as("b"))
      .withColumn("zval", Storage.zorderKey(col("a"), col("b")))
    // the whole recipe: range-partition by the interleaved key, write
    df.repartitionByRange(16, $"zval")
      .write.mode("overwrite").parquet(s"$base/z")
    // per-FILE min/max span per dimension — the stat parquet footer skipping
    // uses; a z-ordered file must be narrow in both, a single-column sort
    // is narrow in one and global-span in the other
    val spans = spark.read.parquet(s"$base/z")
      .groupBy(input_file_name().as("f"))
      .agg((max($"a") - min($"a")).as("aspan"),
        (max($"b") - min($"b")).as("bspan"))
      .as[(String, Long, Long)].collect()
    assert(spans.length > 1, "need multiple files for skipping to mean anything")
    val avgA = spans.map(_._2).sum.toDouble / spans.length
    val avgB = spans.map(_._3).sum.toDouble / spans.length
    // 16 z-range files over a 256×256 grid ≈ 64×64 tiles: each file must be
    // FAR narrower than the 255 global span in BOTH dims (a single-column
    // sort gives ~16 in one dim and 255 in the other)
    assert(avgA < 128 && avgB < 128,
      s"z-order must shrink BOTH dimensions' per-file spans: a $avgA, b $avgB (global 255)")
  }
}
