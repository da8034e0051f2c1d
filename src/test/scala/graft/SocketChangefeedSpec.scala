package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{MiniBroker, SocketLog, SocketLogProtocol}
import graft.streaming.JoinMv

/** The changefeed seam over a REAL network transport: an embedded TCP log
  * broker with offset-based replay (the Kafka semantics), consumed by the
  * custom DSv2 micro-batch source, decoded by the unchanged Debezium
  * decoder, driving the delta-join MV across a checkpointed restart —
  * the B43/B52 end-to-end shape with live bytes instead of a dir tail. */
class SocketChangefeedSpec extends SparkSpec {
  import spark.implicits._

  private val orderSchema = StructType(Seq(
    StructField("order_id", LongType), StructField("cust_id", LongType),
    StructField("amount", DoubleType)))
  private val custSchema = StructType(Seq(
    StructField("cust_pk", LongType), StructField("cust_name", StringType)))

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

  test("protocol: latest/range round-trip over TCP, chunked partitions") {
    val broker = new MiniBroker
    try {
      assert(SocketLogProtocol.latest(broker.host, broker.port) === 0L)
      broker.append((1 to 2500).map(i => s"rec$i"): _*)
      assert(SocketLogProtocol.latest(broker.host, broker.port) === 2500L)
      assert(SocketLogProtocol.range(broker.host, broker.port, 5, 8)
        === Seq("rec6", "rec7", "rec8"))
      // re-reading a committed range returns identical bytes (replayable)
      assert(SocketLogProtocol.range(broker.host, broker.port, 5, 8)
        === Seq("rec6", "rec7", "rec8"))
      assert(SocketLogProtocol.range(broker.host, broker.port, 8, 8) === Nil)
    } finally broker.close()
  }

  test("protocol: broken broker fails LOUDLY, never a masked answer") {
    // a server that accepts and hangs up: no OK header may default to 0
    // (that would rewind the stream's offset) or to an empty range (that
    // would commit a hole past the checkpoint)
    val dead = new java.net.ServerSocket(0)
    val drainer = new Thread(() => {
      try { while (true) dead.accept().close() }
      catch { case _: Exception => () }
    })
    drainer.setDaemon(true); drainer.start()
    try {
      intercept[java.io.IOException] {
        SocketLogProtocol.latest("localhost", dead.getLocalPort)
      }
      intercept[java.io.IOException] {
        SocketLogProtocol.range("localhost", dead.getLocalPort, 0, 3)
      }
    } finally dead.close()

    // a range the broker cannot fully serve (beyond its log) is refused,
    // not silently truncated
    val broker = new MiniBroker
    try {
      broker.append("a", "b")
      val ex = intercept[java.io.IOException] {
        SocketLogProtocol.range(broker.host, broker.port, 0, 5)
      }
      assert(ex.getMessage.contains("truncated"))
    } finally broker.close()
  }

  test("the streaming source consumes the broker exactly once across restart") {
    val broker = new MiniBroker
    val base = Files.createTempDirectory("socksrc").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def startQuery() = SocketLog(broker.host, broker.port).frame(spark)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch((b: DataFrame, _: Long) =>
        b.as[String].collect().foreach(sink.add))
      .start()
    try {
      broker.append("a", "b", "c")
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      assert(sink.toArray.toSeq === Seq("a", "b", "c"))
      // records land WHILE the query is down; the restart resumes from
      // the checkpointed offset — no loss, no re-delivery
      broker.append("d", "e")
      val q2 = startQuery()
      try { q2.processAllAvailable() } finally q2.stop()
      assert(sink.toArray.toSeq === Seq("a", "b", "c", "d", "e"))
    } finally broker.close()
  }

  test("debezium feeds over TCP drive the join MV across a restart") {
    val oBroker = new MiniBroker
    val cBroker = new MiniBroker
    val base = Files.createTempDirectory("sockjmv").toString

    def startQuery() = {
      val left = SocketLog(oBroker.host, oBroker.port)
        .debezium(spark, orderSchema)
        .select(lit("A").as("side"), $"order_id",
          $"version".as("aver"), $"op".as("aop"), $"cust_id", $"amount",
          lit(null).cast(LongType).as("cust_pk"),
          lit(null).cast(LongType).as("bver"),
          lit(null).cast(StringType).as("bop"),
          lit(null).cast(StringType).as("cust_name"))
      val right = SocketLog(cBroker.host, cBroker.port)
        .debezium(spark, custSchema)
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

    try {
      // phase 1: snapshot-ish load + one dim, over live sockets
      oBroker.append(
        order("r", 1000, 1, 10, 5.0), order("r", 1000, 2, 20, 7.0))
      cBroker.append(cust("r", 1000, 10, "alice"))
      val q1 = startQuery()
      try {
        q1.processAllAvailable()
        assert(mv === Set((1L, 10L, 5.0, Some("alice")),
          (2L, 20L, 7.0, None)))
      } finally q1.stop()

      // phase 2 lands WHILE the query is down: late dim, customer move,
      // one delete — the broker retains them at fixed offsets
      cBroker.append(cust("c", 2000, 20, "bob"))
      oBroker.append(
        order("u", 2000, 1, 20, 6.0), order("d", 2100, 2, 20, 7.0))

      // restart from the checkpoint: the missed offsets replay exactly once
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        assert(mv === Set((1L, 20L, 6.0, Some("bob"))))
        // dim update fans out post-restart, still over the socket
        cBroker.append(cust("u", 3000, 20, "BOB"))
        q2.processAllAvailable()
        assert(mv === Set((1L, 20L, 6.0, Some("BOB"))))
      } finally q2.stop()
    } finally { oBroker.close(); cBroker.close() }
  }
}
