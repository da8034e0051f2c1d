package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DirTail
import graft.streaming.JoinMv

/** End-to-end CDC story: two Debezium-JSON changefeeds (fact + dim) run
  * through the ChangefeedSource seam into the delta-join MV, across a
  * checkpointed restart — the full "existing database → live joined view"
  * path a reference user runs. */
class DebeziumJoinMvSpec extends SparkSpec {
  import spark.implicits._

  private val orderSchema = StructType(Seq(
    StructField("order_id", LongType), StructField("cust_id", LongType),
    StructField("amount", DoubleType)))
  private val custSchema = StructType(Seq(
    StructField("cust_pk", LongType), StructField("cust_name", StringType)))

  private def write(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))

  private def order(op: String, ts: Long, id: Long, fk: Long,
      amt: Double): String =
    if (op == "d")
      s"""{"op":"d","ts_ms":$ts,"before":{"order_id":$id,"cust_id":$fk,"amount":$amt}}"""
    else
      s"""{"op":"$op","ts_ms":$ts,"after":{"order_id":$id,"cust_id":$fk,"amount":$amt}}"""
  private def cust(op: String, ts: Long, pk: Long, name: String): String =
    if (op == "d")
      s"""{"op":"d","ts_ms":$ts,"before":{"cust_pk":$pk,"cust_name":"$name"}}"""
    else
      s"""{"op":"$op","ts_ms":$ts,"after":{"cust_pk":$pk,"cust_name":"$name"}}"""

  test("debezium feeds drive the join MV to the right state across a restart") {
    val oDir = Files.createTempDirectory("feed_o")
    val cDir = Files.createTempDirectory("feed_c")
    val base = Files.createTempDirectory("dbzjmv").toString

    def startQuery() = {
      val left = DirTail(oDir.toString).debezium(spark, orderSchema)
        .select(lit("A").as("side"), $"order_id",
          $"version".as("aver"), $"op".as("aop"), $"cust_id", $"amount",
          lit(null).cast(LongType).as("cust_pk"),
          lit(null).cast(LongType).as("bver"),
          lit(null).cast(StringType).as("bop"),
          lit(null).cast(StringType).as("cust_name"))
      val right = DirTail(cDir.toString).debezium(spark, custSchema)
        .select(lit("B").as("side"),
          lit(null).cast(LongType).as("order_id"),
          lit(null).cast(LongType).as("aver"),
          lit(null).cast(StringType).as("aop"),
          lit(null).cast(LongType).as("cust_id"),
          lit(null).cast(DoubleType).as("amount"),
          $"cust_pk", $"version".as("bver"), $"op".as("bop"), $"cust_name")
      left.unionByName(right).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch((batch: DataFrame, id: Long) => {
          val fa = batch.filter($"side" === "A")
            .select($"order_id", $"aver", $"aop", $"cust_id", $"amount")
          val fb = batch.filter($"side" === "B")
            .select($"cust_pk", $"bver", $"bop", $"cust_name")
          JoinMv.applyBatch(s"$base/mv",
            "order_id", "aver", "aop", "cust_id",
            "cust_pk", "bver", "bop", nBuckets = 4)(fa, fb, id)
        })
        .start()
    }

    def mv: Set[(Long, Long, Double, Option[String])] =
      spark.read.parquet(s"$base/mv/mv")
        .select($"order_id", $"cust_id", $"amount", $"cust_name")
        .as[(Long, Long, Double, Option[String])].collect().toSet

    // phase 1: initial snapshot-ish load + one late dim
    write(oDir, "o1.jsonl", Seq(
      order("r", 1000, 1, 10, 5.0), order("r", 1000, 2, 20, 7.0)))
    write(cDir, "c1.jsonl", Seq(cust("r", 1000, 10, "alice")))
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(mv === Set((1L, 10L, 5.0, Some("alice")),
        (2L, 20L, 7.0, None)))
    } finally q1.stop()

    // phase 2 lands WHILE the query is down: the late dim arrives, an
    // order moves customer, one order is deleted
    write(cDir, "c2.jsonl", Seq(cust("c", 2000, 20, "bob")))
    write(oDir, "o2.jsonl", Seq(
      order("u", 2000, 1, 20, 6.0), order("d", 2100, 2, 20, 7.0)))

    // restart from the checkpoint: the missed files replay exactly once
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(mv === Set((1L, 20L, 6.0, Some("bob"))))
      // dim update fans out post-restart
      write(cDir, "c3.jsonl", Seq(cust("u", 3000, 20, "BOB")))
      q2.processAllAvailable()
      assert(mv === Set((1L, 20L, 6.0, Some("BOB"))))
    } finally q2.stop()
  }
}
