package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.{ChangefeedSource, DirTail, KafkaTopic}

/** The transport seam: dir-tail and Kafka bindings must be one-config
  * swaps under the same decoders, with the Kafka wiring assertable without
  * a broker (the connector jar isn't bundled, so the option map is pure). */
class ChangefeedSourceSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("dir-tail through the seam wires from_json onto the value column") {
    val dir = Files.createTempDirectory("feed").toFile
    Files.write(dir.toPath.resolve("a.jsonl"),
      """{"op":"c","ts_ms":1,"after":{"id":1,"v":"x"}}""".getBytes)
    val src: ChangefeedSource = DirTail(dir.getAbsolutePath)
    val decoded = src.debezium(spark, rowSchema)
    assert(decoded.isStreaming)
    val lp = decoded.queryExecution.analyzed.toString
    assert(lp.contains("from_json"), s"decode not plan-level:\n$lp")
    assert(lp.contains("value"), s"not bound to the value column:\n$lp")
    assert(decoded.columns.toSeq === Seq("id", "v", "version", "op"))
    // and the canal decoder bolts onto the SAME transport
    assert(src.canal(spark, rowSchema).columns.toSeq ===
      Seq("id", "v", "version", "op"))
  }

  test("Kafka binding carries the broker/topic config and value contract") {
    val k = KafkaTopic("broker1:9092,broker2:9092", "orders.cdc",
      extraOptions = Map("maxOffsetsPerTrigger" -> "5000"))
    assert(k.readerOptions === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "orders.cdc",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "5000"))
    // the decoders see only `value` — the one column both transports share
    val d = KafkaTopic("b:9092", "t", startingOffsets = "latest")
    assert(d.readerOptions("startingOffsets") === "latest")
  }
}
